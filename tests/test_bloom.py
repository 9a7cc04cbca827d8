"""functions/bloom.py: the mergeable digest bloom behind the streaming
ingest's probe fast path and x69. The load-bearing properties: NO false
negatives ever (a FN silently re-admits a duplicate), bounded FPR at the
design point, driver build == distributed build bit-for-bit, atomic
persistence round-trip, and rebuild-from-index for the missing-sidecar
state."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

from consensource_sds_spark.functions.bloom import (
    BloomSidecar,
    build_bits,
    might_contain_col,
    rebuild,
)


def _digs(prefix: str, n: int) -> list[str]:
    return [hashlib.md5(f"{prefix}{i}".encode()).hexdigest() for i in range(n)]


def test_no_false_negatives_and_fpr_bound(tmp_path):
    added = _digs("doc", 13000)
    novel = _digs("new", 20000)
    sc = BloomSidecar(str(tmp_path / "b"), m_bits=1 << 17)  # ~10 bits/doc
    sc.add_digests(added[:7000])
    sc.add_digests(added[7000:])  # merge = OR: second add must not evict
    assert sc.candidates(added) == added  # every member hits
    fpr = len(sc.candidates(novel)) / len(novel)
    assert fpr < 0.03, fpr  # theory ~1% at 10 bits/doc, k=7
    assert 0.0 < sc.fill_fraction() < 0.6


def test_persistence_round_trip_and_magic_guard(tmp_path):
    p = str(tmp_path / "b")
    sc = BloomSidecar(p, m_bits=1 << 14)
    sc.add_digests(_digs("d", 100))
    re = BloomSidecar(p)  # sizing comes from the file, not the default
    assert (re.m_bits, re.k, re.n_added) == (1 << 14, sc.k, 100)
    assert np.array_equal(re.bits, sc.bits)
    assert re.candidates(_digs("d", 100)) == _digs("d", 100)
    with open(p, "wb") as f:
        f.write(b"not a bloom")
    with pytest.raises(ValueError, match="magic"):
        BloomSidecar(p)


def test_empty_probe_and_empty_add(tmp_path):
    sc = BloomSidecar(str(tmp_path / "b"), m_bits=1 << 12)
    assert sc.candidates([]) == []
    sc.add_digests([])
    assert sc.n_added == 0


def test_distributed_build_matches_driver_build(spark, tmp_path):
    """build_bits (per-partition bitmaps, OR treeReduce) must produce the
    IDENTICAL bitmap the driver-side path sets — the two deployment shapes
    share one hash scheme or membership answers diverge."""
    from pyspark.sql import functions as F

    df = spark.range(5000).select(
        F.md5(F.concat(F.lit("doc"), F.col("id").cast("string"))).alias("digest")
    )
    bits = build_bits(df, "digest", m_bits=1 << 18)
    sc = BloomSidecar(str(tmp_path / "b"), m_bits=1 << 18)
    sc.add_digests(_digs("doc", 5000))
    assert np.array_equal(bits, sc.bits)

    # and the distributed probe agrees: all members hit
    probe = df.withColumn("hit", might_contain_col(spark, bits)("digest"))
    assert probe.filter("NOT hit").count() == 0


def test_rebuild_from_index(spark, tmp_path):
    """rebuild() re-derives the filter from the index (the source of
    truth) at a new m and replaces the sidecar atomically — the recovery
    path for a missing/undersized sidecar next to a live index."""
    from pyspark.sql import functions as F

    idx = spark.range(2000).select(
        F.md5(F.concat(F.lit("doc"), F.col("id").cast("string"))).alias("digest")
    )
    p = str(tmp_path / "b")
    old = BloomSidecar(p, m_bits=1 << 10)  # deliberately saturated
    old.add_digests(_digs("doc", 2000))
    assert old.fill_fraction() > 0.9

    sc = rebuild(spark, idx, p, m_bits=1 << 16)
    assert sc.m_bits == 1 << 16 and sc.n_added == 2000
    assert os.path.exists(p)
    re = BloomSidecar(p)
    assert re.m_bits == 1 << 16
    assert re.candidates(_digs("doc", 2000)) == _digs("doc", 2000)  # no FNs
    fpr = len(re.candidates(_digs("new", 5000))) / 5000
    assert fpr < 0.03, fpr  # healthy again after resize


def test_property_no_false_negatives_any_digest_set(tmp_path):
    """Hypothesis fuzz: for ANY set of md5-hex digests added in ANY
    grouping, every added digest is a candidate afterward (zero false
    negatives) and save/load round-trips the answers. (FPR is a sizing
    property, pinned by the deterministic tests above.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=10**9), max_size=200),
        st.integers(min_value=1, max_value=5),
    )
    def prop(ids, n_chunks):
        added = [hashlib.md5(f"a{i}".encode()).hexdigest() for i in set(ids)]
        p = str(tmp_path / f"b{len(ids)}_{n_chunks}_{hash(tuple(ids)) & 0xFFFF}")
        if os.path.exists(p):
            os.remove(p)
        sc = BloomSidecar(p, m_bits=1 << 14)
        step = max(1, len(added) // n_chunks)
        for i in range(0, len(added), step):
            sc.add_digests(added[i : i + step])
        assert sc.candidates(added) == added
        re = BloomSidecar(p)
        assert re.candidates(added) == added
        assert re.n_added == len(added)

    prop()


def test_header_carries_fill_fraction_for_header_only_reads(tmp_path):
    """save() snapshots the fill fraction into the fixed-width header so
    maintenance hooks (maybe_rebuild_bloom, corpus_profile) can check the
    threshold without reading — or unpacking — the bitmap; the chunked
    popcount must agree with the bit-exact unpackbits answer."""
    import numpy as np

    p = str(tmp_path / "hdr_bloom")
    sc = BloomSidecar(p, m_bits=1 << 14)
    sc.add_digests([hashlib.md5(f"d{i}".encode()).hexdigest() for i in range(300)])
    hdr = BloomSidecar.read_header(p)
    assert hdr["m"] == 1 << 14 and hdr["k"] == sc.k and hdr["n"] == 300
    exact = float(np.unpackbits(sc.bits).mean())
    assert abs(sc.fill_fraction() - exact) < 1e-12
    assert abs(hdr["f"] - exact) < 1e-8  # header rounds to 8 places


def test_truncated_sidecar_refuses_to_load(tmp_path):
    """Regression (r9 review): a short bitmap read must raise, never load
    a smaller bits array — the probe would then use a different modulus
    than the build and return false negatives (silent re-admission)."""
    import pytest

    from consensource_sds_spark.functions.bloom import BloomSidecar

    path = str(tmp_path / "_bloom")
    sc = BloomSidecar(path, m_bits=1 << 12)
    sc.add_digests(["a" * 32])
    # truncate the file mid-bitmap (partial copy / non-atomic sync)
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) - 100])
    with pytest.raises(ValueError, match="truncated"):
        BloomSidecar(path)


def test_malformed_digests_raise_and_nulls_are_no_keys(tmp_path):
    """Regression (r9 review + hostile sweep): wrong-length digests must
    raise a clear error — the batch-concat vectorization would otherwise
    misalign every later digest's hash halves (silent false negatives)
    or die with an opaque TypeError. A NULL digest is different: it is
    md5 of a NULL document, i.e. NO key — skipped on add, never a
    candidate on probe (SQL ``NULL = x`` matches nothing), NOT a crash
    (the hostile fixture's NULL-text doc aborted x69's whole job)."""
    import pytest

    from consensource_sds_spark.functions.bloom import BloomSidecar

    sc = BloomSidecar(str(tmp_path / "_bloom"), m_bits=1 << 12)
    with pytest.raises(ValueError, match="32-char"):
        sc.add_digests(["a" * 24, "b" * 40])  # concat stays 16-byte aligned
    sc.add_digests(["a" * 32, None])  # NULL skipped, not raised
    assert sc.n_added == 1
    assert sc.candidates(["a" * 32]) == ["a" * 32]
    assert sc.candidates([None]) == []  # NULL probes as definitely-new
    sc.add_digests(["c" * 32])  # valid input still works
    assert sc.candidates(["c" * 32]) == ["c" * 32]


def test_rebuild_keeps_a_valid_sidecar_on_disk_at_every_instant(spark, tmp_path, monkeypatch):
    """Regression (r9 review): rebuild() must not delete the old sidecar
    before the new one is in place — a crash mid-rebuild previously left
    the one unsafe state (missing file next to a non-empty index)."""
    from consensource_sds_spark.functions import bloom as B

    path = str(tmp_path / "_bloom")
    sc = B.BloomSidecar(path, m_bits=1 << 12)
    sc.add_digests(["d" * 32])
    idx = spark.createDataFrame([("d" * 32,)], "digest string")
    # crash injected at the atomic swap: the OLD sidecar must survive
    monkeypatch.setattr(B.os, "replace", lambda *a: (_ for _ in ()).throw(OSError("crash")))
    try:
        B.rebuild(spark, idx, path, m_bits=1 << 14)
    except OSError:
        pass
    monkeypatch.undo()
    survivor = B.BloomSidecar(path)
    assert survivor.m_bits == 1 << 12  # the old generation, intact
    assert survivor.candidates(["d" * 32]) == ["d" * 32]
    # and an uninterrupted rebuild swaps generations atomically
    out = B.rebuild(spark, idx, path, m_bits=1 << 14)
    assert out.m_bits == 1 << 14
    assert B.BloomSidecar(path).candidates(["d" * 32]) == ["d" * 32]
