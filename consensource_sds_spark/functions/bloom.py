"""Mergeable bloom filter over md5-hex digests — the probe accelerant for
incremental exact dedup (streaming/corpus_ingest.py, x69).

Why a bloom here: the standing digest index grows with the corpus (~16 B
per retained doc), so even a perfectly bucketed probe join must open index
buckets every microbatch. A bloom filter is the classic LSM/Delta answer:
a bits-only summary (~1.2 GB per 10^9 docs at 1% FPR vs tens of GB of
index) that answers "definitely new" with NO false negatives. Batch docs
that miss the bloom skip the index entirely; hits are false-positive-prone
CANDIDATES that a normal exact join against the index confirms or clears —
so the bloom changes cost, never semantics.

Hash scheme — no extra hashing at all: the digest column is ALREADY an md5
hex string (128 uniform bits). Kirsch-Mitzenmacher double hashing derives
the k probe positions from its two 64-bit halves, ``(h1 + i*h2) mod m``
(uint64 wrap-around arithmetic, identical in build and probe since both
run this module's numpy code). k=7 with m/n ~ 9.6 bits/doc gives ~1% FPR.

Mergeability is bitwise OR: per-partition bitmaps OR-reduce into one
(:func:`build_bits`), and a per-batch update ORs into the standing sidecar
(:meth:`BloomSidecar.add_digests`) — exactly a parquet-footprint-free
union, which is what makes the filter maintainable append-only at stream
time and rebuildable offline from the index.

Deployment shapes, both provided:

- **driver-held** (:class:`BloomSidecar`): the filter lives with the
  control plane that already owns the ingest manifest; batch digests (a
  microbatch-bounded set) are tested driver-side, so the bloom is never
  shipped to executors at all. Right for the streaming ingest, where
  re-broadcasting a corpus-sized filter every microbatch would recreate
  the inverted-build-side problem the bucketed index fixed.
- **distributed probe** (:func:`might_contain_col`): bits broadcast once,
  membership tested in an Arrow-vectorized pandas UDF. Right for batch
  queries that test corpus-sized frames against a bounded filter (x69).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

#: ~1% false-positive rate at m/n ≈ 9.6 bits per added digest
DEFAULT_K = 7

#: 2 MiB of bits — comfortable to ~1.7M digests at 1% FPR. A deploy knob:
#: size m to ~10 bits per expected corpus doc (1.2 GB per 10^9 docs).
DEFAULT_M_BITS = 1 << 24


def _halves(digests) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) uint64 arrays from an iterable of 32-char md5 hex strings.

    Vectorized: one ''.join + bytes.fromhex for the whole batch, then a
    zero-copy big-endian view — no per-row int() parsing. Input is
    validated first: the batch-concat trick means a single wrong-length
    digest would otherwise either crash with an opaque TypeError or —
    worse — silently MISALIGN every later digest's hash halves (bits set
    at wrong positions build a filter with false negatives, breaking the
    superset contract). Callers strip NULLs BEFORE this point (a NULL
    digest is "no key" — skipped on build, never-present on probe, the
    SQL ``NULL = x`` semantics); a NULL reaching here is therefore a
    caller bug and still raises."""
    digests = digests if isinstance(digests, list) else list(digests)
    try:
        ok = all(len(d) == 32 for d in digests)
    except TypeError:
        ok = False
    if not ok:
        bad = [d for d in digests if not isinstance(d, str) or len(d) != 32][:3]
        raise ValueError(
            f"bloom digests must be 32-char md5 hex strings; got {bad!r}"
        )
    joined = "".join(digests)
    if not joined:
        e = np.empty(0, dtype=np.uint64)
        return e, e
    arr = np.frombuffer(bytes.fromhex(joined), dtype=">u8").astype(np.uint64).reshape(-1, 2)
    return arr[:, 0], arr[:, 1]


def _positions(h1: np.ndarray, h2: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing; uint64 wrap is part of the
    (stable) scheme, not a hazard — build and probe share this code."""
    i = np.arange(1, k + 1, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


#: byte -> set-bit count, for popcounts without the 8x unpackbits blowup
_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def _popcount(bits: np.ndarray) -> int:
    """Total set bits, chunked so the LUT gather's transient stays at a
    few MB regardless of bitmap size."""
    step = 1 << 24
    return sum(int(_POPCOUNT[bits[i : i + step]].sum()) for i in range(0, bits.size, step))


def _set_bits(bits: np.ndarray, digests, k: int) -> None:
    h1, h2 = _halves(digests)
    if not h1.size:
        return
    pos = _positions(h1, h2, bits.size * 8, k)
    np.bitwise_or.at(bits, (pos // 8).astype(np.int64), np.uint8(1) << (pos % 8).astype(np.uint8))


def _test_bits(bits: np.ndarray, digests, k: int) -> np.ndarray:
    h1, h2 = _halves(digests)
    if not h1.size:
        return np.zeros(0, dtype=bool)
    pos = _positions(h1, h2, bits.size * 8, k)
    hit = (bits[(pos // 8).astype(np.int64)] >> (pos % 8).astype(np.uint8)) & np.uint8(1)
    return hit.all(axis=0)


def build_bits(df, digest_col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K) -> np.ndarray:
    """Distributed build: per-partition bitmaps OR-reduced to one.

    The one deliberate RDD use in this repo's hot paths: a bloom build is
    genuinely per-partition imperative state (a local bitmap) folded by a
    commutative OR — DataFrame aggregates can't express a byte-array
    reduce without a single-task grouped agg. Shuffle volume is
    partitions x m/8 bytes of bitmap, never the digests themselves."""

    def part(rows):
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        # NULL digest = no key (md5 of a NULL document): nothing to insert
        _set_bits(bits, [r[0] for r in rows if r[0] is not None], k)
        yield bits

    rdd = df.select(digest_col).rdd.mapPartitions(part)
    out = rdd.treeReduce(np.bitwise_or)
    return np.asarray(out, dtype=np.uint8)


def might_contain_col(spark, bits: np.ndarray, k: int = DEFAULT_K):
    """Distributed probe: a BooleanType pandas UDF over a digest column,
    bits broadcast ONCE per call (torrent broadcast amortizes across
    executors; do not call per-microbatch with a corpus-sized filter —
    that is what :class:`BloomSidecar`'s driver-side probe is for).

    The broadcast handle rides on the returned UDF as
    ``.bloom_broadcast`` so a caller that has MATERIALIZED its result
    (checkpoint/write) can ``unpersist()`` deterministically instead of
    leaving an m/8-byte broadcast pinned until driver GC notices —
    several uncollected large filters between GCs is real memory."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(bits.tobytes())

    @pandas_udf("boolean")
    def _might_contain(s: pd.Series) -> pd.Series:
        b = np.frombuffer(bc.value, dtype=np.uint8)
        # NULL digest probes False: NULL never equals any stored key
        # (SQL join semantics), so it cannot be "maybe present"
        mask = s.notna().to_numpy()
        out = np.zeros(len(s), dtype=bool)
        if mask.any():
            out[mask] = _test_bits(b, s[mask].tolist(), k)
        return pd.Series(out)

    try:
        _might_contain.bloom_broadcast = bc
    except AttributeError:  # a future UDF wrapper without settable attrs
        pass
    return _might_contain


class BloomSidecar:
    """Driver-held persistent bloom: ``<path>`` is one atomic file (json
    header + raw bits) updated by OR. Single writer assumed — the same
    one-writer-per-checkpoint contract as the ingest's standing indexes.

    Correctness contract for dedup use: the sidecar must always be a
    SUPERSET of the standing index's digests (false positives are safe —
    the exact probe join clears them; a false negative would silently
    re-admit a duplicate). Writers uphold it by ORing a batch's digests in
    BEFORE inserting the index rows; a crash in between leaves harmless
    extra bits. A MISSING file next to a non-empty index is the one unsafe
    state (an empty filter would claim everything is new) — readers that
    enforce the contract must :func:`rebuild` from the index in that case,
    as the streaming ingest does, never start empty."""

    MAGIC = b"BLOOMSC1"

    def __init__(
        self, path: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K, fresh: bool = False
    ):
        self.path = path
        if not fresh and os.path.exists(path):
            with open(path, "rb") as f:
                magic = f.read(8)
                if magic != self.MAGIC:
                    raise ValueError(f"{path}: not a bloom sidecar (magic {magic!r})")
                # fixed-width 128-byte json header right after the magic
                hdr = json.loads(f.read(128))
                self.m_bits, self.k, self.n_added = hdr["m"], hdr["k"], hdr["n"]
                self.bits = np.frombuffer(f.read(self.m_bits // 8), dtype=np.uint8).copy()
                if self.bits.size != self.m_bits // 8:
                    # a short read loads a SMALLER modulus than the build
                    # used -> false negatives; refuse, never limp
                    raise ValueError(
                        f"{path}: truncated sidecar bitmap ({self.bits.size} bytes, "
                        f"header declares {self.m_bits // 8}) — rebuild from the "
                        "standing index"
                    )
        else:
            self.m_bits, self.k, self.n_added = m_bits, k, 0
            self.bits = np.zeros(m_bits // 8, dtype=np.uint8)

    def save(self) -> None:
        # "f" snapshots the fill fraction so maintenance hooks can read it
        # header-only; the popcount pass is cheaper than the full-bitmap
        # write this method performs anyway
        hdr = json.dumps(
            {"m": self.m_bits, "k": self.k, "n": self.n_added, "f": round(self.fill_fraction(), 8)}
        ).encode()
        hdr = hdr + b" " * (128 - len(hdr))
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(self.MAGIC)
            f.write(hdr)
            f.write(self.bits.tobytes())
        os.replace(tmp, self.path)  # atomic on POSIX

    def add_digests(self, digests) -> None:
        # NULL digest = no key (md5 of a NULL document): nothing to insert
        digests = [d for d in digests if d is not None]
        _set_bits(self.bits, digests, self.k)
        self.n_added += len(digests)
        self.save()

    def add_bits(self, bits: np.ndarray, n: int) -> None:
        """OR a pre-built bitmap in (the :func:`build_bits` output for a
        batch) — the executor-side update path for batches too large to
        collect digest lists through the driver: the driver only ever sees
        the fixed-size m/8-byte bitmap, never O(batch) digests. ``n`` is
        the batch's digest count (bookkeeping for :meth:`fill_fraction`
        heuristics; the bits are the truth)."""
        if bits.size != self.bits.size:
            raise ValueError(f"bitmap size {bits.size} != sidecar {self.bits.size}")
        np.bitwise_or(self.bits, bits, out=self.bits)
        self.n_added += int(n)
        self.save()

    def candidates(self, digests) -> list[str]:
        """The subset of ``digests`` the filter might contain — exact-probe
        these; the rest are DEFINITELY new. NULLs are never candidates
        (NULL equals no stored key)."""
        digests = [d for d in digests if d is not None]
        if not digests:
            return []
        return [d for d, hit in zip(digests, _test_bits(self.bits, digests, self.k)) if hit]

    def fill_fraction(self) -> float:
        """Set-bit fraction; past ~0.5 the FPR degrades and the fast path
        decays toward the plain join (correctness unaffected). The cue to
        :func:`rebuild` at a larger m. Chunked LUT popcount — an
        ``unpackbits`` here would allocate 8 bytes per BIT (a ~10 GB
        transient at the documented 10^9-doc sidecar scale)."""
        return _popcount(self.bits) / float(self.bits.size * 8)

    @classmethod
    def read_header(cls, path: str) -> dict:
        """The json header alone — 8-byte magic + 128 bytes, no bitmap
        read. The
        maintenance hooks' under-threshold check reads THIS (``f`` is the
        fill fraction as of the last save), not the full sidecar; headers
        written before the field existed lack ``f`` and callers fall back
        to a full open."""
        with open(path, "rb") as f:
            magic = f.read(8)
            if magic != cls.MAGIC:
                raise ValueError(f"{path}: not a bloom sidecar (magic {magic!r})")
            return json.loads(f.read(128))


def rebuild(spark, index_df, path: str, m_bits: int, digest_col: str = "digest", k: int = DEFAULT_K) -> BloomSidecar:
    """Offline resize: distributed re-build from the standing index (the
    source of truth) at a larger m, then atomically replace the sidecar."""
    bits = build_bits(index_df, digest_col, m_bits, k)
    # fresh=True: skip loading the old generation (its m_bits would win)
    # WITHOUT deleting it first — save()'s tmp + os.replace swap keeps a
    # valid sidecar on disk at every instant (a crash mid-rebuild must
    # never leave the "missing file next to a non-empty index" state)
    sc = BloomSidecar(path, m_bits=m_bits, k=k, fresh=True)
    sc.bits = bits
    sc.n_added = index_df.count()
    sc.save()
    return sc


__all__ = [
    "BloomSidecar",
    "build_bits",
    "might_contain_col",
    "rebuild",
    "DEFAULT_K",
    "DEFAULT_M_BITS",
]
