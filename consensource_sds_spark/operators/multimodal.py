"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as ``binary``
columns with a metadata struct; decode/feature steps run as Arrow-batched
``mapInPandas`` so payload bytes never round-trip through the driver and
batch size bounds executor memory.

Decode coverage without media libraries (this container ships none):

- UNCOMPRESSED formats decode for REAL in pure numpy — WAV PCM16 sample
  decode (``decode_wav_samples``) and BMP BI_RGB 24bpp pixel decode
  (``decode_bmp_pixels``) — and feed real feature kernels (RMS/ZCR/peak
  for audio, RGB means + luma histogram for images);
- PNG pixels ALSO decode for REAL (``decode_png_pixels``): the codec is
  stdlib ``zlib`` + the spec's five scanline filters inverted in numpy —
  depth-8 grey/RGB/palette/grey-alpha/RGBA, non-interlaced — with a
  matching stdlib encoder (``encode_png_pixels``) so resize round-trips;
- GIF pixels decode for REAL too (``decode_gif_pixels``): a pure-python
  GIF-variant LZW (variable code width, CLEAR/EOI, 12-bit growth, the
  KwKwK case) + palette lookup — full-frame non-interlaced images;
- JPEG pixels decode for REAL as well (``decode_jpeg_pixels``): baseline
  SOF0 — marker walk, canonical huffman entropy decode, dequant +
  dezigzag, matrix-multiply IDCT, 4:4:4/4:2:2/4:2:0 MCU interleave,
  YCbCr->RGB — with a matching two-pass encoder
  (``encode_jpeg_pixels``) that builds its huffman tables from the
  image's own symbols and restart-interval (DRI/RSTn) streams resync at
  marker boundaries; progressive/arithmetic JPEGs are out of decoder
  scope and return None;
- FLAC samples decode for REAL as well (``decode_flac_samples``): the
  complete 16-bit subframe set — constant/verbatim/fixed/LPC with
  partitioned rice residuals and left/right/mid-side stereo
  reconstruction, frame CRC-8 verified — with a lossless encoder
  (``encode_flac_samples``) whose round trips are bit-exact.

Every format the metadata sniffers recognize now decodes without any
external library. Payloads NO decoder recognizes raise
NotImplementedError unless ``deterministic_fake=True``, which derives a
stable fake feature vector from the payload hash — the stubbing contract
kept for genuinely foreign bytes (e.g. video containers). The Spark-side
contract (schema, partitioning, UDF signature, Arrow batch shape) is
identical either way.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal record schema
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec-requiring decoder: 16 floats in
    [0,1) derived from the sha256 of the payload."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


# ---------------------------------------------------------------------------
# Optional native-codec fast path — the dual-backend pattern spark-protobuf
# already uses here (codec/spark_udfs.py): the pure-python decoders below
# are the ORACLE (complete, dependency-free, spec-pinned), and when PIL /
# soundfile happen to exist in the runtime they take the hot path —
# equivalence-tested against the pure decoders in
# tests/test_multimodal.py::TestFastPathEquivalence (skip-gated on the
# import probes, so the suite lights up unmodified the day the libraries
# appear). Pure-python per-payload decode is 2-3 orders slower per byte
# than libjpeg/libflac — fine for correctness in a codec-less sandbox,
# and the published media bench block (bench.py `media`) keeps the cost
# visible either way. Disable with SPARK_GRAFT_MEDIA_FAST=0.
# ---------------------------------------------------------------------------

try:
    from PIL import Image as _PIL_Image

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

try:
    import soundfile as _soundfile

    _HAVE_SOUNDFILE = True
except ImportError:
    _HAVE_SOUNDFILE = False


def _fast_enabled() -> bool:
    import os

    return os.environ.get("SPARK_GRAFT_MEDIA_FAST", "1") != "0"


#: every exception shape a malformed-but-recognized payload can throw out
#: of the pure decoders (truncated GIF descriptors / out-of-range PNG
#: palette indexes raise IndexError; bad lengths ValueError; corrupt
#: DEFLATE zlib.error; short fixed-layout headers struct.error). The ONE
#: taxonomy both the ingest quarantine (streaming/media_ingest) and the
#: transform passes (resize_images) classify on; NotImplementedError
#: (genuinely foreign format) is deliberately separate.
MALFORMED_MEDIA_ERRORS = (ValueError, IndexError, KeyError, OverflowError, struct.error, zlib.error)


def _pure_container(b: bytes) -> bool:
    """True when the payload's magic belongs to a container the PURE
    decoders handle (BMP/PNG/GIF/JPEG/WAV/FLAC). The PIL/soundfile fast
    path is gated on this so installing a library can only ACCELERATE
    decoding, never silently expand coverage — otherwise the same corpus
    would split into features-vs-quarantine lanes differently depending on
    which libraries happen to exist on the executors (WebP/OGG decodable
    here, quarantined there)."""
    return (
        b[:2] == b"BM"
        or b[:8] == b"\x89PNG\r\n\x1a\n"
        or b[:6] in (b"GIF87a", b"GIF89a")
        or b[:3] == b"\xff\xd8\xff"
        or b[:4] == b"fLaC"
        or (b[:4] == b"RIFF" and b[8:12] == b"WAVE")
    )


def fast_decode_pixels(payload: bytes):
    """PIL-backed image decode (PNG/GIF/BMP bit-identical to the pure
    decoders; JPEG within IDCT rounding) -> uint8 RGB (h, w, 3) ndarray,
    or None when PIL is absent/disabled or the payload doesn't decode."""
    if not (_HAVE_PIL and _fast_enabled()):
        return None
    import io

    import numpy as np

    try:
        with _PIL_Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"))
    except Exception:
        return None


def fast_decode_samples(payload: bytes):
    """soundfile-backed audio decode (WAV/FLAC, bit-exact for 16-bit PCM)
    -> float (n, ch) ndarray in [-1, 1) with the same /32768 scaling as
    the pure decoders, or None when unavailable/undecodable."""
    if not (_HAVE_SOUNDFILE and _fast_enabled()):
        return None
    import io

    import numpy as np

    try:
        data, _sr = _soundfile.read(io.BytesIO(payload), dtype="int16", always_2d=True)
        return data.astype(np.float32) / 32768.0
    except Exception:
        return None


def decode_wav_samples(payload: bytes | None):
    """REAL audio decode for RIFF/WAVE PCM16 (format tag 1, 16 bits): a
    float32 ndarray (n_samples, channels) in [-1, 1), straight off the
    'data' chunk with numpy — no codec needed for uncompressed PCM.
    Returns None for anything else (compressed/malformed)."""
    import numpy as np

    if payload is None:
        return None
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, ch, bits, fmt_tag, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        clen = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and pos + 24 <= len(b):
            fmt_tag = int.from_bytes(b[pos + 8 : pos + 10], "little")
            ch = int.from_bytes(b[pos + 10 : pos + 12], "little")
            bits = int.from_bytes(b[pos + 22 : pos + 24], "little")
        elif cid == b"data":
            data = b[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
    if fmt_tag != 1 or bits != 16 or not ch or data is None:
        return None
    raw = np.frombuffer(data[: (len(data) // (2 * ch)) * 2 * ch], dtype="<i2")
    return (raw.reshape(-1, ch).astype("float32")) / 32768.0


def _wav_sample_rate(b: bytes, default: int = 44100) -> int:
    """Sample rate off the fmt chunk of a RIFF/WAVE payload (bytes 4-8 of
    the chunk body); ``default`` when absent/unparsable."""
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        clen = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and pos + 16 <= len(b):
            return int.from_bytes(b[pos + 12 : pos + 16], "little") or default
        pos += 8 + clen + (clen & 1)
    return default


# ---------------------------------------------------------------------------
# FLAC decode — pure python/numpy, the complete 16-bit subframe set.
# ---------------------------------------------------------------------------


class _FlacBitIndex:
    """Per-payload bit index shared by every frame's reader: the unpacked
    bit array plus the positions of 1-bits (one ``np.unpackbits`` pass),
    both int64/uint8 ndarrays. Turns unary scans and whole rice
    partitions from per-bit python loops into sorted lookups + batched
    numpy gathers.

    Memory contract (the 100 TB sizing number, see SCALE.md): ~8 bytes of
    ``bits`` plus ~32 bytes of ``ones`` (8 B x ~4 set bits) per payload
    byte — a bounded ~40x transient per concurrently-decoded row. The r9
    shape additionally held ``ones`` as a Python int list (~4x more) and
    one FULL-length jump table per distinct rice k (~32x per k, 10+ ks on
    real audio) — multiple GB of executor heap for a multi-MB payload;
    rice jump tables are now computed per partition over a bounded window
    (:func:`_rice_block`), so no per-k payload-length copies exist."""

    def __init__(self, buf: bytes):
        import numpy as np

        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits).astype(np.int64)


class _MsbReader:
    """Plain MSB-first bit cursor (no byte stuffing — FLAC is raw).
    Bit-position based: ``bits`` decodes straight from a byte slice, and
    an optional shared :class:`_FlacBitIndex` makes ``unary`` a single
    sorted lookup instead of a per-bit loop."""

    def __init__(self, buf: bytes, pos: int = 0, index: _FlacBitIndex | None = None):
        self.buf = buf
        self.bitpos = pos * 8
        self.nbits = len(buf) * 8
        self.index = index

    @property
    def pos(self) -> int:
        """Byte position (callers read it at byte-aligned points)."""
        return (self.bitpos + 7) >> 3

    def bits(self, k: int) -> int:
        p = self.bitpos
        if p + k > self.nbits:
            raise ValueError("truncated FLAC stream")
        self.bitpos = p + k
        if k == 0:
            return 0
        byte = p >> 3
        nby = ((p & 7) + k + 7) >> 3
        v = int.from_bytes(self.buf[byte : byte + nby], "big")
        return (v >> (nby * 8 - (p & 7) - k)) & ((1 << k) - 1)

    def sbits(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if v >= (1 << (k - 1)) else v

    def unary(self) -> int:
        if self.index is not None:
            import numpy as np

            ones = self.index.ones
            j = int(np.searchsorted(ones, self.bitpos))
            if j >= len(ones):
                raise ValueError("truncated FLAC stream")
            t = int(ones[j])
            q = t - self.bitpos
            self.bitpos = t + 1
            return q
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


@lru_cache(maxsize=1)
def _crc8_table() -> list[int]:
    table = []
    for byte in range(256):
        c = byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        table.append(c)
    return table


def _crc8(data: bytes) -> int:
    table = _crc8_table()
    c = 0
    for byte in data:
        c = table[c ^ byte]
    return c


@lru_cache(maxsize=1)
def _crc16_table() -> list[int]:
    table = []
    for byte in range(256):
        c = byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        table.append(c)
    return table


def _crc16(data: bytes) -> int:
    table = _crc16_table()
    c = 0
    for byte in data:
        c = ((c << 8) & 0xFFFF) ^ table[(c >> 8) ^ byte]
    return c


def _flac_utf8(reader: _MsbReader) -> int:
    """FLAC's UTF-8-style coded frame/sample number (up to 7 bytes)."""
    b0 = reader.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        v = (v << 6) | (reader.bits(8) & 0x3F)
    return v

#: FIXED-predictor coefficients by order (spec 9.2.1): residual = poly diff
_FLAC_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}

_FLAC_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768,
}


def _rice_block(reader: _MsbReader, n: int, k: int):
    """Decode ``n`` zigzag-rice(k) values as an int64 array. With a shared
    bit index the per-sample work collapses to one jump-table hop (the
    terminator chain is the only sequential part); quotients come from the
    vectorized diff of terminator positions and the k fixed low bits from
    one batched bit-matrix gather.

    The jump table is built per partition over a BOUNDED window of
    ``ones`` — each rice value consumes its unary terminator plus at most
    the k ones inside its fixed bits, so ``n`` values consume at most
    ``n*(1+k)`` entries; a window that size caps the table at ~n*(1+k)*8
    bytes regardless of payload length (a full-payload table per distinct
    k, the r9 shape, cost GBs of heap on multi-MB audio), while the total
    searchsorted work across a payload's partitions stays the same order
    as one full-length table build because the windows are disjoint but
    for per-partition overshoot."""
    import numpy as np

    idx = reader.index
    if idx is None or n < 16:
        out = np.empty(n, dtype=np.int64)
        for i in range(n):
            q = reader.unary()
            u = (q << k) | reader.bits(k) if k else q
            out[i] = (u >> 1) ^ -(u & 1)  # zigzag -> signed
        return out
    ones = idx.ones
    start = reader.bitpos
    j0 = int(np.searchsorted(ones, start))
    sub = ones[j0 : j0 + n * (1 + k) + 1]
    # nxt[j] = window-local index of the first 1-bit after consuming one
    # rice value whose unary terminator is sub[j] (terminator + k fixed)
    nxt = np.searchsorted(ones, sub + 1 + k) - j0
    ts = [0] * n
    try:
        j = 0
        for i in range(n):
            ts[i] = sub[j]
            j = nxt[j]
    except IndexError:
        raise ValueError("truncated FLAC stream") from None
    end = ts[-1] + 1 + k
    if end > reader.nbits:
        raise ValueError("truncated FLAC stream")
    reader.bitpos = end
    tarr = np.array(ts, dtype=np.int64)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = start
    starts[1:] = tarr[:-1] + 1 + k
    u = tarr - starts  # unary quotients
    if k:
        gather = idx.bits[tarr[:, None] + 1 + np.arange(k, dtype=np.int64)[None, :]]
        lows = gather.astype(np.int64) @ (1 << np.arange(k - 1, -1, -1, dtype=np.int64))
        u = (u << k) | lows
    return (u >> 1) ^ -(u & 1)  # zigzag -> signed


def _raw_block(reader: _MsbReader, n: int, width: int):
    """``n`` fixed-width two's-complement values at regular bit offsets —
    one batched gather when the shared index exists."""
    import numpy as np

    if reader.index is None or n < 16 or width == 0:
        return np.array([reader.sbits(width) for _ in range(n)], dtype=np.int64)
    p = reader.bitpos
    if p + n * width > reader.nbits:
        raise ValueError("truncated FLAC stream")
    reader.bitpos = p + n * width
    starts = p + np.arange(n, dtype=np.int64) * width
    gather = reader.index.bits[starts[:, None] + np.arange(width, dtype=np.int64)[None, :]]
    u = gather.astype(np.int64) @ (1 << np.arange(width - 1, -1, -1, dtype=np.int64))
    return np.where(u >= 1 << (width - 1), u - (1 << width), u)


def _flac_residuals(reader: _MsbReader, blocksize: int, order: int):
    """Partitioned rice residuals (method 0: 4-bit params, method 1:
    5-bit), escape code -> raw fixed-width two's complement. Returns an
    int64 ndarray."""
    import numpy as np

    method = reader.bits(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = reader.bits(4)
    nparts = 1 << porder
    parts = []
    for p in range(nparts):
        n = max(0, (blocksize >> porder) - (order if p == 0 else 0))
        k = reader.bits(pbits)
        if k == escape:
            raw = reader.bits(5)
            if raw:
                parts.append(_raw_block(reader, n, raw))
            else:
                parts.append(np.zeros(n, dtype=np.int64))
            continue
        parts.append(_rice_block(reader, n, k))
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def _integrate_fixed(warm: list[int], res, order: int):
    """Invert the FIXED predictor: the order-o residual stream is the
    o-th finite difference of the samples (spec 9.2.1 coefficients are
    the binomial expansion), so reconstruction is o vectorized cumsums
    seeded from the warmup's own difference pyramid."""
    import numpy as np

    res = np.asarray(res, dtype=np.int64)
    if order == 0:
        return res
    wd = np.array(warm, dtype=np.int64)
    heads = []  # heads[m] = Δ^m samples[order-1]
    for _ in range(order):
        heads.append(wd[-1])
        wd = np.diff(wd)
    cur = res
    for m in range(order - 1, -1, -1):
        cur = heads[m] + np.cumsum(cur)
    return np.concatenate([np.array(warm, dtype=np.int64), cur])


def _flac_subframe(reader: _MsbReader, blocksize: int, bps: int):
    """One subframe -> int64 sample array. CONSTANT/VERBATIM/FIXED decode
    fully vectorized; LPC stays a sequential integer filter (the >> shift
    truncation is part of the spec's lossless reconstruction, so no
    float filter substitute)."""
    import numpy as np

    if reader.bits(1) != 0:
        raise ValueError("subframe sync bit")
    ftype = reader.bits(6)
    wasted = 0
    if reader.bits(1):
        wasted = 1 + reader.unary()
    eff = bps - wasted
    if ftype == 0:  # CONSTANT
        samples = np.full(blocksize, reader.sbits(eff), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        samples = _raw_block(reader, blocksize, eff)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [reader.sbits(eff) for _ in range(order)]
        res = _flac_residuals(reader, blocksize, order)
        samples = _integrate_fixed(warm, res, order)
    elif ftype >= 32:  # LPC order 1-32
        order = ftype - 31
        warm = [reader.sbits(eff) for _ in range(order)]
        prec = reader.bits(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision")
        shift = reader.sbits(5)
        coefs = [reader.sbits(prec) for _ in range(order)]
        res = _flac_residuals(reader, blocksize, order)
        out = list(warm)
        for r in res.tolist():
            pred = sum(c * out[-i - 1] for i, c in enumerate(coefs)) >> shift
            out.append(r + pred)
        samples = np.array(out, dtype=np.int64)
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    if wasted:
        samples = samples << wasted
    return samples


def decode_flac_samples(payload: bytes | None):
    """REAL audio decode for FLAC — pure python/numpy, the COMPLETE
    subframe set: constant, verbatim, fixed orders 0-4, and LPC with
    quantized coefficients; partitioned rice residuals (both methods,
    escape partitions); stereo decorrelation (left-side, right-side,
    mid-side) exactly per the spec's lossless reconstruction; frame-header
    CRC-8 verified (a mismatch means garbage, not audio). Returns float32
    (n_samples, n_channels) in [-1, 1) like :func:`decode_wav_samples`,
    or None out of scope (only 16-bit streams are accepted — the CD/WAV
    parity case the feature kernels consume)."""
    import numpy as np

    if payload is None:
        return None
    b = bytes(payload)
    if b[:4] != b"fLaC" or len(b) < 42:
        return None
    # metadata block walk to the audio frames
    pos = 4
    streaminfo = None
    while pos + 4 <= len(b):
        hdr = b[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        blen = int.from_bytes(b[pos + 1 : pos + 4], "big")
        if btype == 0:
            streaminfo = b[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 18:
        return None
    si = int.from_bytes(streaminfo[10:18], "big")
    bps = ((si >> 36) & 0x1F) + 1
    total = si & ((1 << 36) - 1)
    if bps != 16:
        return None
    try:
        index = _FlacBitIndex(b)
        channels_out: list[list] = []  # per channel: list of frame arrays
        got = 0
        while pos < len(b) - 2 and (total == 0 or got < total):
            frame_start = pos
            reader = _MsbReader(b, pos, index)
            sync = reader.bits(14)
            if sync != 0x3FFE:
                return None
            reader.bits(1)  # reserved
            reader.bits(1)  # blocking strategy
            bs_code = reader.bits(4)
            sr_code = reader.bits(4)
            ch_code = reader.bits(4)
            ss_code = reader.bits(3)
            reader.bits(1)  # reserved
            _flac_utf8(reader)
            if bs_code == 6:
                blocksize = reader.bits(8) + 1
            elif bs_code == 7:
                blocksize = reader.bits(16) + 1
            else:
                blocksize = _FLAC_BLOCK_SIZES.get(bs_code)
                if blocksize is None:
                    return None
            if sr_code == 12:
                reader.bits(8)
            elif sr_code in (13, 14):
                reader.bits(16)
            # CRC-8 covers the header bytes up to (not incl.) the CRC byte
            crc_pos = reader.pos
            if _crc8(b[frame_start:crc_pos]) != reader.bits(8):
                return None
            if ch_code < 8:
                nch = ch_code + 1
                kinds = ["indep"] * nch
            elif ch_code == 8:
                nch, kinds = 2, ["left", "side"]
            elif ch_code == 9:
                nch, kinds = 2, ["side", "right"]
            elif ch_code == 10:
                nch, kinds = 2, ["mid", "side"]
            else:
                return None
            subs = []
            for c in range(nch):
                sb_bps = bps + (1 if kinds[c] == "side" else 0)
                subs.append(_flac_subframe(reader, blocksize, sb_bps))
            reader.align()
            reader.bits(16)  # frame CRC-16 (header CRC already verified)
            pos = reader.pos
            # stereo reconstruction (vectorized; >> on int64 is the same
            # arithmetic floor shift the spec's integer math uses)
            if ch_code == 8:  # left-side
                frame_ch = [subs[0], subs[0] - subs[1]]
            elif ch_code == 9:  # right-side
                frame_ch = [subs[0] + subs[1], subs[1]]
            elif ch_code == 10:  # mid-side (libFLAC reconstruction)
                side = subs[1]
                mid = (subs[0] << 1) | (side & 1)
                frame_ch = [(mid + side) >> 1, (mid - side) >> 1]
            else:
                frame_ch = subs
            if not channels_out:
                channels_out = [[] for _ in range(len(frame_ch))]
            for c, ch in enumerate(frame_ch):
                channels_out[c].append(ch)
            got += blocksize
        if not channels_out:
            return None
        arr = np.stack(
            [np.concatenate(ch).astype(np.int32) for ch in channels_out], axis=1
        )
        if total:
            arr = arr[: int(total)]
        return arr.astype(np.float32) / 32768.0
    except (ValueError, IndexError):
        return None


class _MsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def bits(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
            self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.bits(0, 8 - self.n)


def encode_flac_samples(
    samples, sample_rate: int = 44100, strategy: str = "fixed", stereo: str = "indep"
) -> bytes:
    """REAL FLAC encode — the lossless counterpart of
    :func:`decode_flac_samples`, for tests and WAV->FLAC re-encode:
    int16 ndarray (n, ch) -> a conformant stream (STREAMINFO + frames
    with correct CRC-8/CRC-16). ``strategy``: ``verbatim`` (raw),
    ``constant`` (where a block is flat), or ``fixed`` (order-2 fixed
    predictor + single-partition rice, parameter from the residuals'
    mean magnitude). ``stereo``: ``indep``, ``left`` (left-side), or
    ``mid`` (mid-side) — all bit-exact on decode, being lossless."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, nch = s.shape
    if not 1 <= nch <= 8:
        # STREAMINFO's channel field is 3 bits and frame ch_codes 8-10 are
        # stereo-decorrelation modes: >8 channels would silently alias into
        # a 1-channel header + garbage stereo decode
        raise ValueError(f"FLAC supports 1-8 channels, got {nch}")
    bs = 4096

    out = bytearray(b"fLaC")
    info = _MsbWriter()
    info.bits(bs, 16)
    info.bits(bs, 16)
    info.bits(0, 24)
    info.bits(0, 24)
    info.bits(sample_rate, 20)
    info.bits(nch - 1, 3)
    info.bits(15, 5)  # bps - 1
    info.bits(n, 36)
    info.align()
    si = bytes(info.out) + b"\x00" * 16  # MD5 unset
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    def rice_write(w: _MsbWriter, vals, k: int) -> None:
        for v in vals:
            u = (int(v) << 1) if v >= 0 else ((-int(v) << 1) - 1)
            for _ in range(u >> k):
                w.bits(0, 1)
            w.bits(1, 1)
            if k:
                w.bits(u, k)

    def subframe(w: _MsbWriter, ch, bps: int) -> None:
        if strategy == "constant" and all(v == ch[0] for v in ch):
            w.bits(0, 1)
            w.bits(0, 6)
            w.bits(0, 1)
            w.bits(int(ch[0]), bps)
            return
        if strategy == "verbatim":
            w.bits(0, 1)
            w.bits(1, 6)
            w.bits(0, 1)
            for v in ch:
                w.bits(int(v), bps)
            return
        order = min(2, len(ch))
        w.bits(0, 1)
        w.bits(8 + order, 6)  # FIXED order
        w.bits(0, 1)
        for v in ch[:order]:
            w.bits(int(v), bps)
        coefs = _FLAC_FIXED[order]
        res = [
            int(ch[i]) - sum(c * int(ch[i - j - 1]) for j, c in enumerate(coefs))
            for i in range(order, len(ch))
        ]
        mean = sum(abs(r) for r in res) / max(1, len(res))
        # The method-0 rice parameter is a 4-bit field where 15 is the
        # escape code, so the largest writable parameter is 14.  High-entropy
        # audio (full-scale noise) yields residual means past 2^14; an
        # unclamped k would be masked to k & 0xF in the header and the
        # stream would be undecodable.  Clamping costs only unary-length
        # (the stream stays conformant and lossless).
        k = max(0, min(14, int(mean).bit_length()))
        w.bits(0, 2)  # rice method 0
        w.bits(0, 4)  # partition order 0
        w.bits(k, 4)
        rice_write(w, res, k)

    pos = 0
    frame_no = 0
    while pos < n:
        blk = s[pos : pos + bs]
        blocksize = blk.shape[0]
        w = _MsbWriter()
        w.bits(0x3FFE, 14)
        w.bits(0, 1)
        w.bits(0, 1)  # fixed blocksize strategy
        w.bits(7, 4)  # 16-bit blocksize-1 follows
        w.bits(0, 4)  # sample rate from STREAMINFO
        if nch == 2 and stereo == "left":
            ch_code, chans, bpss = 8, [blk[:, 0], blk[:, 0] - blk[:, 1]], [16, 17]
        elif nch == 2 and stereo == "mid":
            side = blk[:, 0] - blk[:, 1]
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            ch_code, chans, bpss = 10, [mid, side], [16, 17]
        else:
            ch_code, chans, bpss = nch - 1, [blk[:, c] for c in range(nch)], [16] * nch
        w.bits(ch_code, 4)
        w.bits(4, 3)  # 16 bps
        w.bits(0, 1)
        # UTF-8 frame number. The lead byte of an n-byte sequence is n ones
        # then a zero, leaving 7-n payload bits (total capacity 5n+1 bits
        # with 6 per continuation byte) — an off-by-one in the lead's ones
        # count, or letting the remainder exceed the lead's payload width,
        # corrupts every frame >= 128 (12 s of 44.1 kHz audio): the decoder
        # miscounts the ones, eats the blocksize byte, and CRC-8 fails.
        fn = frame_no
        if fn < 0x80:
            w.bits(fn, 8)
        else:
            nbytes = 2
            while fn >= (1 << (5 * nbytes + 1)):
                nbytes += 1
            w.bits(((0xFF << (8 - nbytes)) & 0xFF) | (fn >> (6 * (nbytes - 1))), 8)
            for i in range(nbytes - 2, -1, -1):
                w.bits(0x80 | ((fn >> (6 * i)) & 0x3F), 8)
        w.bits(blocksize - 1, 16)
        w.align()
        hdr = bytes(w.out)
        w.bits(_crc8(hdr), 8)
        for ch, bps in zip(chans, bpss):
            subframe(w, list(ch), bps)
        w.align()
        frame = bytes(w.out)
        w.bits(_crc16(frame), 16)
        out += bytes(w.out)
        pos += blocksize
        frame_no += 1
    return bytes(out)


def decode_bmp_pixels(payload: bytes | None):
    """REAL image decode for BMP BI_RGB 24bpp: a uint8 ndarray (h, w, 3) in
    RGB order, honoring bottom-up row order and 4-byte row padding — no
    codec needed for uncompressed DIBs. Returns None for anything else."""
    import numpy as np

    if payload is None:
        return None
    b = bytes(payload)
    if b[:2] != b"BM" or len(b) < 54:
        return None
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down, h_abs = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    if off + stride * h_abs > len(b):
        return None
    rows = np.frombuffer(b[off : off + stride * h_abs], dtype=np.uint8).reshape(h_abs, stride)
    px = rows[:, : w * 3].reshape(h_abs, w, 3)[:, :, ::-1]  # BGR -> RGB
    return px if top_down else px[::-1]


def encode_bmp_pixels(px) -> bytes:
    """REAL image encode: uint8 ndarray (h, w, 3) RGB -> BMP BI_RGB 24bpp
    bytes (bottom-up rows, 4-byte row padding) — the exact inverse of
    :func:`decode_bmp_pixels`, so decode(encode(px)) round-trips."""
    import numpy as np

    h, w = int(px.shape[0]), int(px.shape[1])
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR, bottom-up
    body = rows.tobytes()
    off = 54
    header = (
        b"BM"
        + (off + len(body)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + body


#: Adam7 pass lattice: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int):
    """Invert the five PNG scanline filters over ``h`` scanlines of
    ``stride`` bytes (filter byte + data each). Returns the (h, stride)
    uint8 array, or None on truncation / unknown filter. Shared by the
    sequential and Adam7 paths — each Adam7 pass is its own filter
    context (prev resets per pass, per the spec)."""
    import numpy as np

    if len(raw) < h * (stride + 1):
        return None
    rows = np.frombuffer(raw[: h * (stride + 1)], dtype=np.uint8).reshape(h, stride + 1)
    filters, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, line = int(filters[y]), data[y].astype(np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = line + prev
        elif f == 1:  # Sub
            rec = line.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif f == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            return None
        prev = (rec & 0xFF).astype(np.uint8)
        out[y] = prev
    return out


def decode_png_pixels(payload: bytes | None):
    """REAL image decode for PNG — stdlib ``zlib`` + numpy, no external
    codec: chunk walk (IHDR/PLTE/IDAT/IEND), one inflate of the
    concatenated IDAT stream, then scanline UNFILTERING (None/Sub/Up/
    Average/Paeth per the spec's recon equations). Returns a uint8
    ndarray (h, w, 3) in RGB, or None for payloads this decoder does not
    cover (it is a decoder for the dominant cases, not a validator):
    bit depth 8, color types grey(0)/RGB(2)/palette(3)/grey+alpha(4)/
    RGBA(6) — alpha dropped, grey replicated — sequential AND Adam7
    interlaced (each pass its own filter context, scattered back by the
    pass lattice).

    Filter inversion is per-scanline: None/Up vectorize across the row;
    Sub/Average/Paeth recur on the left neighbor, so those rows run a
    per-byte loop — fine for the thumbnail-scale payloads a feature
    kernel sees; a SIMD codec replaces this one-for-one on clusters that
    ship one."""
    import zlib

    import numpy as np

    if payload is None:
        return None
    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, idat, plte, hdr = 8, [], None, None
    while pos + 8 <= len(b):
        clen = int.from_bytes(b[pos : pos + 4], "big")
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            hdr = data
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # length + type + data + crc
    if hdr is None or not idat:
        return None
    w = int.from_bytes(hdr[0:4], "big")
    h = int.from_bytes(hdr[4:8], "big")
    depth, ctype_n, interlace = hdr[8], hdr[9], hdr[12]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_n)
    if depth != 8 or channels is None or interlace not in (0, 1) or w <= 0 or h <= 0:
        return None
    if ctype_n == 3 and plte is None:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    bpp = channels
    if interlace == 0:
        out = _png_unfilter(raw, h, w * channels, bpp)
        if out is None:
            return None
        px = out.reshape(h, w, channels)
    else:
        # Adam7: seven sub-images, each its own filtered scanline group,
        # scattered back onto the (y, x) grid by the pass lattice
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = -(-(w - x0) // xs) if w > x0 else 0
            ph = -(-(h - y0) // ys) if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            need = ph * (pw * channels + 1)
            sub = _png_unfilter(raw[off : off + need], ph, pw * channels, bpp)
            if sub is None:
                return None
            off += need
            px[y0::ys, x0::xs] = sub.reshape(ph, pw, channels)
    if ctype_n == 2:
        return px
    if ctype_n == 6:
        return px[:, :, :3].copy()
    if ctype_n == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_n == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return plte[px[:, :, 0]]  # type 3: palette lookup


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    clear/EOI codes, dictionary grows to 12 bits then waits for CLEAR.
    Returns the decoded index stream. Pure python — the bit stream is
    LSB-first within bytes per the GIF spec."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset():
        nonlocal table, width
        table = [[i] for i in range(1 << min_code_size)] + [[], []]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    acc = bits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + [entry[0]])
            else:  # the KwKwK case
                entry = prev + [prev[0]]
                if len(table) < 4096:
                    table.append(entry)
            out.extend(entry)
            prev = entry
            # the decoder's table trails the encoder's by ONE entry (the
            # classic LZW lag), so it widens one entry early: when the
            # NEXT append would be code 2^width - 1
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
    return out


def decode_gif_pixels(payload: bytes | None):
    """REAL image decode for GIF (87a/89a): logical screen walk, color
    tables, the FIRST image descriptor's LZW-compressed index stream
    (pure-python LZW, the GIF variant with CLEAR/EOI and 12-bit growth),
    palette lookup to a uint8 (h, w, 3) RGB array — including 4-pass
    interlaced images (rows de-scattered after decode). Returns None
    outside this decoder's scope: frames smaller than the logical screen
    (animation composition) are a renderer's job, not a feature
    kernel's; a transparent index (GCE) is resolved through the
    palette like any other — feature kernels read color statistics, not
    alpha."""
    import numpy as np

    if payload is None:
        return None
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(b):
        marker = b[pos]
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif marker == 0x2C:  # image descriptor
            left = int.from_bytes(b[pos + 1 : pos + 3], "little")
            top = int.from_bytes(b[pos + 3 : pos + 5], "little")
            w = int.from_bytes(b[pos + 5 : pos + 7], "little")
            h = int.from_bytes(b[pos + 7 : pos + 9], "little")
            ip = b[pos + 9]
            pos += 10
            lct = None
            if ip & 0x80:
                n = 2 << (ip & 0x07)
                lct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
                pos += 3 * n
            interlaced = bool(ip & 0x40)
            if (left, top, w, h) != (0, 0, sw, sh):
                return None  # partial frame: animation composition, not decode
            table = lct if lct is not None else gct
            if table is None or pos >= len(b):
                return None
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while pos < len(b) and b[pos] != 0:
                data += b[pos + 1 : pos + 1 + b[pos]]
                pos += 1 + b[pos]
            idx = _lzw_decode(bytes(data), min_code)
            if len(idx) < w * h:
                return None
            arr = np.array(idx[: w * h], dtype=np.int64).reshape(h, w)
            if arr.max() >= len(table):
                return None
            if interlaced:
                # GIF 4-pass row interleave: the decoded rows arrive in
                # pass order (every 8th from 0, every 8th from 4, every
                # 4th from 2, every 2nd from 1) — scatter them back
                order = np.concatenate(
                    [np.arange(s, h, step) for s, step in ((0, 8), (4, 8), (2, 4), (1, 2))]
                )
                out = np.empty_like(arr)
                out[order] = arr
                arr = out
            return table[arr]
        elif marker == 0x3B:  # trailer
            return None
        else:
            return None
    return None


# ---------------------------------------------------------------------------
# JPEG baseline codec — pure numpy, no external libraries.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1)
def _zigzag_order():
    """The standard 8x8 zigzag as (row, col) pairs, generated from the
    diagonal-walk rule instead of a hardcoded table: diagonal s holds
    cells i + j = s; odd diagonals walk down-left (i ascending), even
    ones up-right (i descending). Cached: the table is constant and the
    codec rebuilds it per payload in a mapInPandas hot path otherwise."""
    order = []
    for s in range(15):
        rng = range(max(0, s - 7), min(7, s) + 1)
        for i in (rng if s % 2 else reversed(rng)):
            order.append((i, s - i))
    return order


@lru_cache(maxsize=1)
def _dct_basis():
    import math

    import numpy as np

    c = np.zeros((8, 8))
    for u in range(8):
        a = (1 / 8) ** 0.5 if u == 0 else (2 / 8) ** 0.5
        for x in range(8):
            c[u, x] = a * math.cos((2 * x + 1) * u * math.pi / 16)
    return c


def _entropy_segments(b: bytes, pos: int) -> list[bytes]:
    """Unstuff the entropy-coded stream starting at ``pos`` in one numpy
    pass — 0xFF00 collapses to 0xFF, RSTn markers split the stream into
    per-restart-interval segments, and the first REAL marker (0xFF
    followed by anything else) ends it. Replaces a per-bit python reader:
    the hot decode loop then reads plain bytes with no stuffing checks."""
    import numpy as np

    arr = np.frombuffer(b, dtype=np.uint8)[pos:]
    if arr.size == 0:
        return [b""]
    ff = np.flatnonzero(arr == 0xFF)
    # a trailing 0xFF with no byte after it terminates like a marker
    nxt = np.where(
        ff + 1 < arr.size, arr[np.minimum(ff + 1, arr.size - 1)], np.uint8(0xD9)
    )
    is_stuff = nxt == 0x00
    is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    real = ff[~(is_stuff | is_rst)]
    end = int(real[0]) if real.size else int(arr.size)
    keep = np.ones(end, dtype=bool)
    stuff_pos = ff[is_stuff & (ff < end)]
    keep[stuff_pos + 1] = False
    rst_pos = ff[is_rst & (ff < end)]
    keep[rst_pos] = False
    keep[rst_pos + 1] = False
    data = arr[:end][keep].tobytes()
    before = np.concatenate([[0], np.cumsum(keep)])
    segs: list[bytes] = []
    prev = 0
    for cut in before[rst_pos].tolist():
        segs.append(data[prev:cut])
        prev = cut
    segs.append(data[prev:])
    return segs


@lru_cache(maxsize=32)
def _build_huffman(bits_counts: bytes, symbols: bytes):
    """Canonical huffman decode LUT from a DHT segment's BITS/HUFFVAL —
    the same construction rule every baseline JPEG uses (Annex C), laid
    out as a 2^16-entry table: every 16-bit word whose prefix is a code
    maps to ``(code_length << 8) | symbol``; 0 marks invalid prefixes.
    One list index + two shifts per decoded symbol instead of a per-bit
    dict walk. Cached on the raw DHT bytes: real corpora reuse a handful
    of tables (most encoders ship the Annex K defaults), so the 2^16
    materialization is paid once per distinct table, not per payload."""
    import numpy as np

    lut = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        width = 1 << (16 - length)
        for _ in range(bits_counts[length - 1]):
            lo = code << (16 - length)
            lut[lo : lo + width] = (length << 8) | symbols[k]
            code += 1
            k += 1
        code <<= 1
    return lut.tolist()


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude decoding (spec EXTEND): t low bits v map to
    [-2^t+1, -2^(t-1)] u [2^(t-1), 2^t-1]."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(payload: bytes | None):
    """REAL image decode for baseline JPEG (SOF0) — pure numpy: marker
    walk (DQT/SOF0/DHT/SOS), canonical huffman entropy decode (16-bit
    LUT over a numpy-unstuffed FF00 stream), dequant + dezigzag, 8x8
    IDCT batched over all blocks as two stacked matrix multiplies,
    MCU-interleaved components with sampling factors 1-2 (4:4:4, 4:2:2,
    4:2:0), restart intervals (DRI/RSTn: byte-align + DC-predictor
    reset), nearest upsample, JFIF full-range YCbCr->RGB. Grayscale maps
    to replicated RGB. Returns None outside scope (progressive/SOF2,
    arithmetic coding, 12-bit precision)."""
    import numpy as np

    if payload is None:
        return None
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode map
    frame = None
    scan = None
    restart = 0
    try:
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                return None
            marker = b[pos + 1]
            if marker == 0xD8:
                pos += 2
                continue
            seg_len = int.from_bytes(b[pos + 2 : pos + 4], "big")
            seg = b[pos + 4 : pos + 2 + seg_len]
            if marker == 0xDB:  # DQT (8-bit tables)
                i = 0
                while i < len(seg):
                    pq_tq = seg[i]
                    if pq_tq >> 4 != 0:
                        return None  # 16-bit quant: out of scope
                    qt[pq_tq & 0x0F] = np.frombuffer(
                        seg[i + 1 : i + 65], dtype=np.uint8
                    ).astype(np.float64)
                    i += 65
            elif marker == 0xC0:  # SOF0 baseline
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                ncomp = seg[5]
                comps = []
                for c in range(ncomp):
                    cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
                frame = {"w": w, "h": h, "comps": comps}
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
                return None  # non-baseline frame types
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc_th = seg[i]
                    counts = seg[i + 1 : i + 17]
                    nsym = sum(counts)
                    syms = seg[i + 17 : i + 17 + nsym]
                    huff[(tc_th >> 4, tc_th & 0x0F)] = _build_huffman(counts, syms)
                    i += 17 + nsym
            elif marker == 0xDD:  # DRI
                restart = int.from_bytes(seg[:2], "big")
            elif marker == 0xDA:  # SOS — entropy data follows
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cs, td_ta = seg[1 + 2 * c : 3 + 2 * c]
                    scan.append({"cs": cs, "dc": td_ta >> 4, "ac": td_ta & 0x0F})
                pos = pos + 2 + seg_len
                break
            elif marker == 0xD9:
                return None
            pos += 2 + seg_len
        if frame is None or scan is None:
            return None

        hmax = max(c["h"] for c in frame["comps"])
        vmax = max(c["v"] for c in frame["comps"])
        if not all(1 <= c["h"] <= 2 and 1 <= c["v"] <= 2 for c in frame["comps"]):
            return None
        w, h = frame["w"], frame["h"]
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        C = _dct_basis()
        zz = _zigzag_order()
        segs = _entropy_segments(b, pos)
        seg_i = 0
        sdata = segs[0]
        slen = len(sdata)
        limit = slen * 8
        # inline MSB-first bit accumulator: `acc` low `nb` bits are the
        # next stream bits; refills append zero bytes past the segment end
        # (consumption past `limit` raises at the block boundary check)
        dpos = 0
        acc = 0
        nb = 0
        planes = {}
        coef_rows: dict[int, list] = {}
        block_pos: dict[int, list] = {}
        for comp in frame["comps"]:
            planes[comp["id"]] = np.zeros(
                (mcuy * comp["v"] * 8, mcux * comp["h"] * 8), dtype=np.float64
            )
            coef_rows[comp["id"]] = []
            block_pos[comp["id"]] = []
        pred = {comp["id"]: 0 for comp in frame["comps"]}
        by_id = {c["id"]: c for c in frame["comps"]}
        mcu_i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu_i and mcu_i % restart == 0:
                    # byte-align; the RSTn itself was consumed by the
                    # segment pre-scan — any full byte left here means the
                    # marker wasn't where the interval says it must be
                    used = (dpos * 8 - nb + 7) & ~7
                    if limit - used >= 8:
                        raise ValueError("expected restart marker")
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise ValueError("expected restart marker")
                    sdata = segs[seg_i]
                    slen = len(sdata)
                    limit = slen * 8
                    dpos = 0
                    acc = 0
                    nb = 0
                    pred = {comp["id"]: 0 for comp in frame["comps"]}
                mcu_i += 1
                for sc in scan:
                    comp = by_id[sc["cs"]]
                    dct = huff[(0, sc["dc"])]
                    act = huff[(1, sc["ac"])]
                    cid = comp["id"]
                    rows = coef_rows[cid]
                    posns = block_pos[cid]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            coef = [0.0] * 64
                            while nb < 16:
                                acc = (acc << 8) | (
                                    sdata[dpos] if dpos < slen else 0
                                )
                                dpos += 1
                                nb += 8
                            v = dct[(acc >> (nb - 16)) & 0xFFFF]
                            if v == 0:
                                raise ValueError("invalid huffman code")
                            nb -= v >> 8
                            t = v & 0xFF
                            if t:
                                while nb < t:
                                    acc = (acc << 8) | (
                                        sdata[dpos] if dpos < slen else 0
                                    )
                                    dpos += 1
                                    nb += 8
                                nb -= t
                                m = (acc >> nb) & ((1 << t) - 1)
                                pred[cid] += (
                                    m if m >= 1 << (t - 1) else m + 1 - (1 << t)
                                )
                            acc &= (1 << nb) - 1
                            coef[0] = pred[cid]
                            k = 1
                            while k < 64:
                                while nb < 16:
                                    acc = (acc << 8) | (
                                        sdata[dpos] if dpos < slen else 0
                                    )
                                    dpos += 1
                                    nb += 8
                                v = act[(acc >> (nb - 16)) & 0xFFFF]
                                if v == 0:
                                    raise ValueError("invalid huffman code")
                                nb -= v >> 8
                                rs = v & 0xFF
                                s = rs & 0x0F
                                if s == 0:
                                    acc &= (1 << nb) - 1
                                    if rs == 0xF0:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += rs >> 4
                                if k > 63:
                                    raise ValueError("AC run past block")
                                while nb < s:
                                    acc = (acc << 8) | (
                                        sdata[dpos] if dpos < slen else 0
                                    )
                                    dpos += 1
                                    nb += 8
                                nb -= s
                                m = (acc >> nb) & ((1 << s) - 1)
                                acc &= (1 << nb) - 1
                                coef[k] = m if m >= 1 << (s - 1) else m + 1 - (1 << s)
                                k += 1
                            if dpos * 8 - nb > limit:
                                raise ValueError("truncated entropy data")
                            rows.append(coef)
                            posns.append(
                                ((my * comp["v"] + by) * 8, (mx * comp["h"] + bx) * 8)
                            )
        # dequant + dezigzag + IDCT batched per component: one (N, 64)
        # scale, one scatter into (N, 8, 8), two stacked matmuls
        zi = np.array([i for i, _ in zz])
        zj = np.array([j for _, j in zz])
        for comp in frame["comps"]:
            rows = coef_rows[comp["id"]]
            if not rows:
                continue
            A = np.array(rows, dtype=np.float64) * qt[comp["tq"]][None, :]
            blocks = np.zeros((len(rows), 8, 8))
            blocks[:, zi, zj] = A
            pix = np.matmul(np.matmul(C.T, blocks), C) + 128.0
            plane = planes[comp["id"]]
            for (y0, x0), blk in zip(block_pos[comp["id"]], pix):
                plane[y0 : y0 + 8, x0 : x0 + 8] = blk
        # upsample each plane to full MCU-grid resolution, then crop
        full = []
        for comp in frame["comps"]:
            p = planes[comp["id"]]
            p = np.repeat(np.repeat(p, hmax // comp["h"], axis=1), vmax // comp["v"], axis=0)
            full.append(p[:h, :w])
        if len(full) == 1:
            g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
            return np.repeat(g[:, :, None], 3, axis=2)
        if len(full) != 3:
            return None
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        bl = y + 1.772 * cb
        return np.clip(np.rint(np.stack([r, g, bl], axis=2)), 0, 255).astype(np.uint8)
    except (ValueError, IndexError, KeyError):
        return None


def encode_jpeg_pixels(px, subsample: bool = False, quant: int = 1, restart_interval: int = 0) -> bytes:
    """REAL baseline JPEG encode — the test/thumbnail counterpart of
    :func:`decode_jpeg_pixels`: RGB->YCbCr, optional 2x2 chroma average
    (4:2:0 vs 4:4:4), 8x8 DCT, uniform quantization at ``quant`` (1 =
    near-lossless; DCT rounding only), zigzag, DC-diff + AC run-length,
    and canonical huffman tables BUILT FROM the image's own symbol set
    (every used symbol gets the same code length L with 2^L - 1 >= n_used,
    so the all-ones code stays reserved as Annex C requires) — emitted in
    DHT, so any conformant decoder reads the file without Annex K's
    "typical" tables being baked in anywhere."""
    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[0], px.shape[1]
    if gray:
        y, cb, cr = px, None, None
    else:
        r, g, bl = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0

    hs = vs = 2 if (subsample and not gray) else 1
    mcux, mcuy = -(-w // (8 * hs)), -(-h // (8 * vs))

    def pad(p, bw, bh):
        out = np.zeros((bh, bw))
        out[: p.shape[0], : p.shape[1]] = p
        # edge-extend so padding doesn't ring
        out[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    ypl = pad(y, mcux * hs * 8, mcuy * vs * 8)
    if gray:
        cbp = crp = None
    elif subsample:
        cbf = pad(cb, mcux * hs * 8, mcuy * vs * 8)
        crf = pad(cr, mcux * hs * 8, mcuy * vs * 8)
        cbp = cbf.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        crp = crf.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
    else:
        cbp, crp = pad(cb, mcux * 8, mcuy * 8), pad(cr, mcux * 8, mcuy * 8)

    C = _dct_basis()
    zz = _zigzag_order()

    def blocks_of(plane, bx0, by0, nh, nv):
        out = []
        for by in range(nv):
            for bx in range(nh):
                blk = plane[
                    (by0 * nv + by) * 8 : (by0 * nv + by) * 8 + 8,
                    (bx0 * nh + bx) * 8 : (bx0 * nh + bx) * 8 + 8,
                ]
                coef = C @ (blk - 128.0) @ C.T
                qc = np.rint(coef / quant).astype(np.int64)
                out.append([int(qc[i, j]) for (i, j) in zz])
        return out

    # pass 1: symbol statistics per (class, component-kind)
    if gray:
        comps = [("y", ypl, 1, 1)]
    else:
        comps = [("y", ypl, hs, vs), ("cb", cbp, 1, 1), ("cr", crp, 1, 1)]
    tokens = []  # (kind, 'dc'/'ac', symbol, extra_bits_value, n_extra)
    pred = {"y": 0, "cb": 0, "cr": 0}
    mcu_i = 0

    def category(v):
        return int(v).bit_length() if v > 0 else int(-v).bit_length()

    def mag_bits(v, t):
        return v if v >= 0 else v + (1 << t) - 1

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                tokens.append(("__rst__", "rst", (mcu_i // restart_interval - 1) % 8, 0, 0))
                pred = {"y": 0, "cb": 0, "cr": 0}
            mcu_i += 1
            for kind, plane, nh, nv in comps:
                for blk in blocks_of(plane, mx, my, nh, nv):
                    diff = blk[0] - pred[kind]
                    pred[kind] = blk[0]
                    t = category(diff)
                    tokens.append((kind, "dc", t, mag_bits(diff, t), t))
                    run = 0
                    last_nz = max((i for i in range(1, 64) if blk[i]), default=0)
                    for k in range(1, last_nz + 1):
                        if blk[k] == 0:
                            run += 1
                            if run == 16:
                                tokens.append((kind, "ac", 0xF0, 0, 0))
                                run = 0
                            continue
                        s = category(blk[k])
                        tokens.append((kind, "ac", (run << 4) | s, mag_bits(blk[k], s), s))
                        run = 0
                    if last_nz < 63:
                        tokens.append((kind, "ac", 0x00, 0, 0))

    # canonical equal-length tables per (class, luma/chroma)
    def table_for(cls, kinds):
        used = sorted({sym for kk, c, sym, _v, _n in tokens if c == cls and kk in kinds})

        L = max(2, (len(used) + 1).bit_length())  # 2^L - 1 >= n_used
        counts = [0] * 16
        counts[L - 1] = len(used)
        codes = {sym: (L, i) for i, sym in enumerate(used)}
        return counts, used, codes

    dc_y = table_for("dc", ("y",))
    ac_y = table_for("ac", ("y",))
    dhts = [(0x00, dc_y), (0x10, ac_y)]
    codes_by = {("y", "dc"): dc_y[2], ("y", "ac"): ac_y[2]}
    if not gray:
        dc_c = table_for("dc", ("cb", "cr"))
        ac_c = table_for("ac", ("cb", "cr"))
        dhts += [(0x01, dc_c), (0x11, ac_c)]
        codes_by.update(
            {
                ("cb", "dc"): dc_c[2],
                ("cb", "ac"): ac_c[2],
                ("cr", "dc"): dc_c[2],
                ("cr", "ac"): ac_c[2],
            }
        )

    out = bytearray(b"\xff\xd8")
    qtab = bytes([quant]) * 64
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + qtab
    if not gray:
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x01" + qtab
    nc = 1 if gray else 3
    sof = bytearray(b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc]))
    sof += bytes([1, (hs << 4) | vs, 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + restart_interval.to_bytes(2, "big")
    for tc_th, (counts, syms, _codes) in dhts:
        seg = bytes([tc_th]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg
    if gray:
        out += b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0x00, 0, 63, 0])
    else:
        out += b"\xff\xda" + (12).to_bytes(2, "big") + bytes(
            [3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]
        )
    acc = nbits = 0
    data = bytearray()

    def put(v, k):
        nonlocal acc, nbits
        acc = (acc << k) | (v & ((1 << k) - 1))
        nbits += k
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            data.append(byte)
            if byte == 0xFF:
                data.append(0x00)

    for kind, cls, sym, vbits, n in tokens:
        if kind == "__rst__":
            if nbits:
                put(0xFF, 8 - nbits)  # 1-pad to the byte boundary
            data.append(0xFF)
            data.append(0xD0 + sym)
            continue
        length, code = codes_by[(kind, cls)][sym]
        put(code, length)
        if n:
            put(vbits, n)
    if nbits:
        put(0xFF, 8 - nbits)  # 1-pad the tail
    out += data + b"\xff\xd9"
    return bytes(out)


def encode_png_pixels(px) -> bytes:
    """REAL image encode: uint8 (h, w, 3) RGB -> PNG (color type 2, depth
    8, filter 0 per scanline, one zlib IDAT) — stdlib only, and the exact
    inverse of :func:`decode_png_pixels` (round-trip pinned by test)."""
    import struct
    import zlib

    import numpy as np

    h, w = int(px.shape[0]), int(px.shape[1])

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.concatenate([[0], row.reshape(-1)]) for row in px.astype(np.uint8)]
    ).astype(np.uint8)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + chunk(b"IEND", b"")
    )


def resize_image_pixels(px, out_w: int, out_h: int):
    """Nearest-neighbor resample of a (h, w, 3) uint8 array to
    (out_h, out_w, 3) — pure numpy index arithmetic (the sample grid is
    the pixel-center mapping, matching the classic NN convention)."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    yi = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return px[yi][:, xi]


def _audio_features(samples) -> list[float]:
    """RMS / zero-crossing rate / peak per payload (mono-mixed), padded to
    FEATURE_DIM — the cheap featurization an audio-quality filter runs."""
    import numpy as np

    mono = samples.mean(axis=1)
    rms = float(np.sqrt(np.mean(mono**2))) if mono.size else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.sign(mono))) > 0)) if mono.size > 1 else 0.0
    peak = float(np.max(np.abs(mono))) if mono.size else 0.0
    base = [rms, zcr, peak, float(samples.shape[1]), float(mono.size)]
    return base + [0.0] * (FEATURE_DIM - len(base))


def _image_features(px) -> list[float]:
    """Channel means + 8-bin luma histogram + aspect, padded to FEATURE_DIM."""
    import numpy as np

    means = px.reshape(-1, 3).mean(axis=0) / 255.0
    luma = px.reshape(-1, 3).astype("float32") @ np.array([0.299, 0.587, 0.114], dtype="float32")
    hist = np.histogram(luma, bins=8, range=(0.0, 255.0))[0]
    hist = (hist / max(1, luma.size)).tolist()
    base = [float(m) for m in means] + hist + [px.shape[1] / px.shape[0]]
    return base + [0.0] * (FEATURE_DIM - len(base))


def _decode_one(b: bytes):
    """Decode ONLY (no featurization): returns ``("audio", samples)`` or
    ``("image", pixels)``. Raises NotImplementedError when no built-in
    decoder recognizes the payload, and whatever the pure decoders raise
    on malformed-but-recognized bytes — callers that quarantine (the media
    ingest) catch around THIS step only, so a featurizer regression still
    fails the task instead of silently quarantining a whole corpus."""
    # native-codec fast path when the libraries exist (pure decoders stay
    # the fallback AND the oracle), gated to the pure decoders' CONTAINER
    # set so the lane split is environment-independent — see _pure_container.
    # Residual caveat: a variant the pure decoder rejects inside a
    # recognized container (progressive JPEG, 24-bit WAV) still decodes
    # only on the fast path; pin SPARK_GRAFT_MEDIA_FAST=0 for strict
    # cross-cluster reproducibility.
    if _pure_container(b):
        samples = fast_decode_samples(b)
        if samples is not None:
            return "audio", samples
        px = fast_decode_pixels(b)
        if px is not None:
            return "image", px
    samples = decode_wav_samples(b)
    if samples is None:
        samples = decode_flac_samples(b)
    if samples is not None:
        return "audio", samples
    px = decode_bmp_pixels(b)
    if px is None:
        px = decode_png_pixels(b)
    if px is None:
        px = decode_gif_pixels(b)
    if px is None:
        px = decode_jpeg_pixels(b)
    if px is not None:
        return "image", px
    raise NotImplementedError(
        "payload matches no built-in decoder (BMP/PNG/GIF/JPEG/WAV/FLAC); foreign formats (e.g. video containers) need external libraries not present in this container"
    )


def _features_one(payload, deterministic_fake: bool):
    if payload is None:
        return None
    b = bytes(payload)
    try:
        kind, data = _decode_one(b)
    except NotImplementedError:
        if deterministic_fake:
            return _fake_features(b)
        raise
    return _audio_features(data) if kind == "audio" else _image_features(data)


def extract_features(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow batches).

    Uncompressed payloads (WAV PCM16, BMP 24bpp) decode for REAL in numpy;
    compressed formats need a codec this container lacks, so they raise
    NotImplementedError unless ``deterministic_fake`` substitutes the
    hash-derived stand-in (stubbing contract unchanged)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else None),
                    "features": pdf["payload"].map(
                        lambda b: _features_one(b, deterministic_fake)
                    ),
                }
            )
            yield out

    # repartition by media_id so payload bytes spread evenly across tasks
    return media.repartition("media_id").mapInPandas(kernel, FEATURES_SCHEMA)


#: resize output: the resampled payload plus its new dimensions
RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, out_w: int, out_h: int, deterministic_fake: bool = False
) -> DataFrame:
    """Resize every image payload to (out_w, out_h) via mapInPandas —
    the thumbnail/normalization pass a vision-training pipeline runs
    before feature extraction, REAL for uncompressed BMP 24bpp
    (numpy nearest-neighbor, re-encoded losslessly as BMP so downstream
    decode_bmp_pixels round-trips). Compressed formats need a codec this
    container lacks: they raise NotImplementedError unless
    ``deterministic_fake`` passes them through untouched with NULL
    dimensions (the stubbing contract of :func:`extract_features`).

    Scale: payload-heavy Arrow batches, spread by media_id; per-row cost
    is O(out pixels); output rows carry only the resampled bytes, so a
    thumbnail pass SHRINKS the shuffle/write volume rather than carrying
    originals forward."""

    def one(payload):
        if payload is None:
            return (None, None, None)
        b = bytes(payload)
        try:
            px = decode_bmp_pixels(b)
            if px is not None:
                small = resize_image_pixels(px, out_w, out_h)
                return (out_w, out_h, encode_bmp_pixels(small))
            px = decode_png_pixels(b)
            if px is not None:
                # PNG in -> PNG out: the resampled thumbnail re-encodes in its
                # own (stdlib-zlib) format, so downstream decode round-trips
                small = resize_image_pixels(px, out_w, out_h)
                return (out_w, out_h, encode_png_pixels(small))
            px = decode_gif_pixels(b)
            if px is not None:
                # GIF thumbnails re-encode as PNG (lossless truecolor beats
                # re-quantizing to a palette; this repo carries no GIF writer)
                small = resize_image_pixels(px, out_w, out_h)
                return (out_w, out_h, encode_png_pixels(small))
            px = decode_jpeg_pixels(b)
            if px is not None:
                # JPEG in -> JPEG out (4:2:0, the thumbnail-standard layout)
                small = resize_image_pixels(px, out_w, out_h)
                return (out_w, out_h, encode_jpeg_pixels(small, subsample=True, quant=4))
        except MALFORMED_MEDIA_ERRORS:
            # malformed-but-recognized bytes raise deterministically, so
            # letting the exception escape would fail the task identically
            # on every retry and wedge the whole thumbnail pass on ONE
            # corrupt file — emit an all-NULL row (the quarantine taxonomy)
            return (None, None, None)
        if deterministic_fake:
            return (None, None, bytes(payload))
        raise NotImplementedError(
            "payload matches no built-in image decoder (BMP/PNG/GIF/JPEG); foreign formats need external libraries not present in this container"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = pdf["payload"].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": res.map(lambda t: t[0]),
                    "height": res.map(lambda t: t[1]),
                    "payload": res.map(lambda t: t[2]),
                }
            )

    return media.repartition("media_id").mapInPandas(kernel, RESIZED_SCHEMA)


#: header-sniff output: real decoded metadata (no media libraries needed)
IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sniffed_format", StringType(), True),  # png | jpeg | gif | None
        StructField("sniffed_width", LongType(), True),
        StructField("sniffed_height", LongType(), True),
    ]
)


def sniff_image_meta(payload: bytes | None) -> tuple[str | None, int | None, int | None]:
    """Parse (format, width, height) from image container headers — pure
    byte-level parsing of the public PNG/JPEG/GIF container formats, a REAL
    decode of the metadata plane (only pixel decode needs external codecs):

    - PNG: 8-byte signature, then the IHDR chunk holds width/height as
      big-endian u32 at offsets 16/20;
    - JPEG: marker stream; the SOFn frame header (FFC0-FFCF minus
      C4/C8/CC) holds height/width as big-endian u16 after the precision
      byte;
    - GIF: 'GIF87a'/'GIF89a', then logical-screen width/height as
      little-endian u16.
    Unknown/truncated payloads return (None, None, None) — quarantine-able,
    never an exception (same taxonomy as the protobuf codec's W5 path)."""
    if payload is None:
        return None, None, None
    b = bytes(payload)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            return "png", int.from_bytes(b[16:20], "big"), int.from_bytes(b[20:24], "big")
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            return "gif", int.from_bytes(b[6:8], "little"), int.from_bytes(b[8:10], "little")
        if b[:2] == b"\xff\xd8":
            pos = 2
            while pos + 4 <= len(b) and b[pos] == 0xFF:
                marker, seglen = b[pos + 1], int.from_bytes(b[pos + 2 : pos + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if pos + 9 <= len(b):
                        return (
                            "jpeg",
                            int.from_bytes(b[pos + 7 : pos + 9], "big"),
                            int.from_bytes(b[pos + 5 : pos + 7], "big"),
                        )
                    break
                pos += 2 + seglen
    except (IndexError, ValueError):
        pass
    return None, None, None


def sniff_media(media: DataFrame) -> DataFrame:
    """Header-sniff all payloads via mapInPandas (Arrow batches, payloads
    never visit the driver); joins back against the carried metadata let a
    pipeline validate declared width/height against the actual container."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sniffed = pdf["payload"].map(sniff_image_meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sniffed_format": sniffed.map(lambda t: t[0]),
                    "sniffed_width": sniffed.map(lambda t: t[1]),
                    "sniffed_height": sniffed.map(lambda t: t[2]),
                }
            )

    return media.repartition("media_id").mapInPandas(kernel, IMAGE_META_SCHEMA)


#: audio header-sniff output: real decoded metadata, pure byte parsing
AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sniffed_format", StringType(), True),  # wav | flac | None
        StructField("channels", LongType(), True),
        StructField("sample_rate_hz", LongType(), True),
        StructField("bits_per_sample", LongType(), True),
        StructField("est_duration_ms", LongType(), True),
    ]
)

_AUDIO_NONE = (None, None, None, None, None)


def sniff_audio_meta(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, int | None]:
    """Parse (format, channels, sample_rate, bits, duration_ms) from audio
    container headers — pure byte-level parsing of the public RIFF/WAVE and
    FLAC container formats (the audio twin of :func:`sniff_image_meta`;
    only sample decode needs external codecs):

    - WAV: 'RIFF'+size+'WAVE', then a chunk list; 'fmt ' holds channels/
      sample-rate/bits (little-endian), 'data' holds the payload size that
      with the byte rate gives duration;
    - FLAC: 'fLaC' magic, then the 34-byte STREAMINFO block packs
      sample-rate (20 bits), channels (3 bits + 1), bits (5 bits + 1) and
      total samples (36 bits) bitwise.
    Unknown/truncated payloads return all-None — quarantine-able, never an
    exception."""
    if payload is None:
        return _AUDIO_NONE
    b = bytes(payload)
    try:
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            pos, ch, rate, bits, byte_rate, data_size = 12, None, None, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                clen = int.from_bytes(b[pos + 4 : pos + 8], "little")
                if cid == b"fmt " and pos + 24 <= len(b):
                    ch = int.from_bytes(b[pos + 10 : pos + 12], "little")
                    rate = int.from_bytes(b[pos + 12 : pos + 16], "little")
                    byte_rate = int.from_bytes(b[pos + 16 : pos + 20], "little")
                    bits = int.from_bytes(b[pos + 22 : pos + 24], "little")
                elif cid == b"data":
                    data_size = clen
                pos += 8 + clen + (clen & 1)  # chunks are word-aligned
            if rate is None:
                return _AUDIO_NONE
            dur = (
                data_size * 1000 // byte_rate
                if data_size is not None and byte_rate
                else None
            )
            return "wav", ch, rate, bits, dur
        if b[:4] == b"fLaC" and len(b) >= 8 + 18:
            si = b[8:]  # first metadata block body (STREAMINFO is mandatory first)
            rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
            ch = ((si[12] >> 1) & 0x7) + 1
            bits = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
            total = ((si[13] & 0xF) << 32) | int.from_bytes(si[14:18], "big")
            dur = total * 1000 // rate if rate else None
            return "flac", ch, rate, bits, dur
    except (IndexError, ValueError):
        pass
    return _AUDIO_NONE


def sniff_audio(media: DataFrame) -> DataFrame:
    """Audio-header sniff via mapInPandas (Arrow batches) — validates
    declared duration against the container the same way :func:`sniff_media`
    does for images."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sniffed = pdf["payload"].map(sniff_audio_meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sniffed_format": sniffed.map(lambda t: t[0]),
                    "channels": sniffed.map(lambda t: t[1]),
                    "sample_rate_hz": sniffed.map(lambda t: t[2]),
                    "bits_per_sample": sniffed.map(lambda t: t[3]),
                    "est_duration_ms": sniffed.map(lambda t: t[4]),
                }
            )

    return media.repartition("media_id").mapInPandas(kernel, AUDIO_META_SCHEMA)


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 30_000, overlap_ms: int = 1_000) -> DataFrame:
    """Audio chunking *plan*: expand each audio row into overlapping
    [start, end) windows JVM-side (the ASR/embedding pre-split — 30 s
    chunks with 1 s overlap by default); the per-chunk decode would hang
    off the exploded rows via :func:`extract_features`."""
    step = chunk_ms - overlap_ms
    # unknown (NULL) or zero duration -> no chunks: without the filter,
    # greatest(NULL - 1, 0) = 0 fabricates a phantom first window for audio
    # of unknown length (frame_sample_plan applies the same rule)
    auds = media.filter(
        (F.col("modality") == "audio") & F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0)
    )
    return auds.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(step))
        ).alias("chunk_start_ms"),
    ).select(
        "media_id",
        "chunk_start_ms",
        (F.col("chunk_start_ms") + chunk_ms).alias("chunk_end_ms"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each video row into frame
    timestamps JVM-side (sequence+explode); the per-frame decode would hang
    off the exploded rows via :func:`extract_features`."""
    # duration 0 would make sequence(0, -1, step) THROW and abort the whole
    # job on one degenerate metadata row; NULL duration -> no frames
    vids = media.filter(
        (F.col("modality") == "video") & F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0)
    )
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))).alias("frame_ts_ms"),
    )


#: transcode output: the re-encoded payload + its byte delta
TRANSCODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes_in", LongType(), True),
        StructField("n_bytes_out", LongType(), True),
    ]
)


def transcode_wav_to_flac(media: DataFrame) -> DataFrame:
    """Losslessly re-encode WAV-PCM16 payloads as FLAC (fixed-predictor +
    rice) via mapInPandas — the storage pass an audio corpus runs before
    archival: PCM shrinks ~30-50% with BIT-EXACT samples (pinned by
    test), so downstream feature extraction is unchanged while shuffle
    and storage bytes drop. Non-WAV payloads (already-FLAC, foreign
    formats, NULLs) pass through untouched with n_bytes_out = n_bytes_in
    — the pass is idempotent and safe over a mixed corpus."""
    import numpy as np

    def one(payload):
        if payload is None:
            return (None, None, None)
        b = bytes(payload)
        samples = decode_wav_samples(b)
        if samples is None:
            return (b, len(b), len(b))
        ints = np.rint(samples * 32768.0).astype(np.int64).clip(-32768, 32767)
        # carry the SOURCE rate into STREAMINFO: defaulting to 44100 would
        # permanently mislabel a 8/16 kHz speech corpus (wrong duration
        # metadata, wrong playback pitch) even though samples are bit-exact
        out = encode_flac_samples(ints, sample_rate=_wav_sample_rate(b), strategy="fixed")
        return (out, len(b), len(out))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = pdf["payload"].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": res.map(lambda t: t[0]),
                    "n_bytes_in": res.map(lambda t: t[1]),
                    "n_bytes_out": res.map(lambda t: t[2]),
                }
            )

    return media.repartition("media_id").mapInPandas(kernel, TRANSCODED_SCHEMA)
