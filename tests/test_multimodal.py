"""Multimodal plumbing: schema, Arrow batch shape, stub contract."""

from __future__ import annotations

import pytest

from consensource_sds_spark.operators import multimodal as MM


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", "image/png", 64, 64, None),
        (2, "audio", b"RIFF fake wav", "audio/wav", None, None, 2000),
        (3, "video", b"\x00\x00ftyp fake mp4", "video/mp4", 640, 480, 3500),
        (4, "image", None, "image/png", 8, 8, None),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_extract_features_fake(media):
    out = MM.extract_features(media, deterministic_fake=True).collect()
    by_id = {r["media_id"]: r for r in out}
    assert set(by_id) == {1, 2, 3, 4}
    assert by_id[1]["n_bytes"] == 15
    assert len(by_id[1]["features"]) == MM.FEATURE_DIM
    assert all(0 <= v <= 1 for v in by_id[1]["features"])
    assert by_id[4]["features"] is None and by_id[4]["n_bytes"] is None
    # determinism
    again = {r["media_id"]: r for r in MM.extract_features(media, deterministic_fake=True).collect()}
    assert again[1]["features"] == by_id[1]["features"]


def test_extract_features_stub_raises(media):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        MM.extract_features(media, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, Py4JJavaError)


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00"
    )


def _jpeg(w: int, h: int) -> bytes:
    # SOI + APP0 (minimal) + SOF0 frame header
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00\x00\x00"


def test_sniff_image_meta_pure():
    assert MM.sniff_image_meta(_png(640, 480)) == ("png", 640, 480)
    assert MM.sniff_image_meta(_jpeg(1024, 768)) == ("jpeg", 1024, 768)
    assert MM.sniff_image_meta(_gif(32, 16)) == ("gif", 32, 16)
    # unknown / truncated / None never raise (quarantine taxonomy)
    assert MM.sniff_image_meta(b"RIFF....") == (None, None, None)
    assert MM.sniff_image_meta(b"\x89PNG\r\n\x1a\n\x00") == (None, None, None)
    assert MM.sniff_image_meta(b"\xff\xd8\xff") == (None, None, None)
    assert MM.sniff_image_meta(None) == (None, None, None)


def test_sniff_media_dataframe(spark):
    rows = [
        (1, "image", _png(640, 480), "image/png", 640, 480, None),
        (2, "image", _jpeg(100, 50), "image/jpeg", 100, 50, None),
        (3, "image", _gif(8, 8), "image/gif", 8, 8, None),
        (4, "image", b"not an image", "image/png", 1, 1, None),
        (5, "image", None, "image/png", None, None, None),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in MM.sniff_media(media).collect()}
    assert (out[1]["sniffed_format"], out[1]["sniffed_width"], out[1]["sniffed_height"]) == ("png", 640, 480)
    assert (out[2]["sniffed_format"], out[2]["sniffed_width"], out[2]["sniffed_height"]) == ("jpeg", 100, 50)
    assert (out[3]["sniffed_format"], out[3]["sniffed_width"], out[3]["sniffed_height"]) == ("gif", 8, 8)
    assert out[4]["sniffed_format"] is None
    assert out[5]["sniffed_format"] is None


def test_frame_sample_plan(media, spark):
    frames = MM.frame_sample_plan(media, every_ms=1000).collect()
    assert sorted((r["media_id"], r["frame_ts_ms"]) for r in frames) == [
        (3, 0),
        (3, 1000),
        (3, 2000),
        (3, 3000),
    ]


def _wav(channels: int, rate: int, bits: int, n_data: int) -> bytes:
    byte_rate = rate * channels * bits // 8
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    data = b"data" + n_data.to_bytes(4, "little") + b"\x00" * n_data
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _flac(channels: int, rate: int, bits: int, total_samples: int) -> bytes:
    si = bytearray(34)
    si[10] = (rate >> 12) & 0xFF
    si[11] = (rate >> 4) & 0xFF
    si[12] = ((rate & 0xF) << 4) | (((channels - 1) & 0x7) << 1) | (((bits - 1) >> 4) & 1)
    si[13] = (((bits - 1) & 0xF) << 4) | ((total_samples >> 32) & 0xF)
    si[14:18] = (total_samples & 0xFFFFFFFF).to_bytes(4, "big")
    return b"fLaC" + b"\x80" + (34).to_bytes(3, "big") + bytes(si)


def test_sniff_audio_meta_pure():
    # 1 second of 16-bit stereo 44.1 kHz
    assert MM.sniff_audio_meta(_wav(2, 44100, 16, 44100 * 4)) == ("wav", 2, 44100, 16, 1000)
    assert MM.sniff_audio_meta(_flac(1, 16000, 16, 32000)) == ("flac", 1, 16000, 16, 2000)
    # unknown / truncated / None never raise (quarantine taxonomy)
    assert MM.sniff_audio_meta(b"RIFF\x00\x00\x00\x00JUNK") == (None, None, None, None, None)
    assert MM.sniff_audio_meta(b"fLaC\x00") == (None, None, None, None, None)
    assert MM.sniff_audio_meta(b"\x89PNG") == (None, None, None, None, None)
    assert MM.sniff_audio_meta(None) == (None, None, None, None, None)


def test_sniff_audio_dataframe(spark):
    rows = [
        (1, "audio", _wav(1, 16000, 16, 16000 * 2 * 3), "audio/wav", None, None, 3000),
        (2, "audio", _flac(2, 48000, 24, 48000 * 2), "audio/flac", None, None, 2000),
        (3, "audio", b"not audio", "audio/wav", None, None, 1000),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in MM.sniff_audio(media).collect()}
    assert (out[1]["sniffed_format"], out[1]["channels"], out[1]["sample_rate_hz"],
            out[1]["bits_per_sample"], out[1]["est_duration_ms"]) == ("wav", 1, 16000, 16, 3000)
    # FLAC total_samples is inter-channel: 96000 samples at 48 kHz = 2 s
    assert (out[2]["sniffed_format"], out[2]["channels"], out[2]["sample_rate_hz"],
            out[2]["bits_per_sample"], out[2]["est_duration_ms"]) == ("flac", 2, 48000, 24, 2000)
    assert out[3]["sniffed_format"] is None


def test_audio_chunk_plan(spark):
    rows = [(2, "audio", None, "audio/wav", None, None, 65000),
            (9, "video", None, "video/mp4", None, None, 99000)]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    chunks = MM.audio_chunk_plan(media, chunk_ms=30_000, overlap_ms=1_000).collect()
    got = sorted((r["media_id"], r["chunk_start_ms"], r["chunk_end_ms"]) for r in chunks)
    assert got == [(2, 0, 30000), (2, 29000, 59000), (2, 58000, 88000)]


def _wav_pcm(samples, channels=1, rate=8000) -> bytes:
    """PCM16 WAV with REAL sample content (int16 list, interleaved)."""
    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = rate * channels * 2
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunk = b"data" + len(data).to_bytes(4, "little") + data + (b"\x00" if len(data) & 1 else b"")
    body = b"WAVE" + fmt + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _bmp(rows) -> bytes:
    """24bpp BI_RGB BMP from [[(r,g,b), ...], ...] (top row first)."""
    h, w = len(rows), len(rows[0])
    stride = (w * 3 + 3) & ~3
    px = bytearray()
    for row in reversed(rows):  # bottom-up storage
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))  # BGR on disk
        line += b"\x00" * (stride - len(line))
        px += line
    off = 54
    header = (
        b"BM"
        + (off + len(px)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(px).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(header) + bytes(px)


def test_decode_wav_pcm_real():
    import numpy as np

    # full-scale alternating square wave: RMS == peak == 1.0 (minus 1 LSB)
    wav = _wav_pcm([32767, -32767] * 50)
    s = MM.decode_wav_samples(wav)
    assert s.shape == (100, 1)
    feats = MM._audio_features(s)
    rms, zcr, peak = feats[0], feats[1], feats[2]
    assert abs(rms - 1.0) < 1e-3 and abs(peak - 1.0) < 1e-3
    assert zcr > 0.9  # alternates every sample
    # silence
    s0 = MM.decode_wav_samples(_wav_pcm([0] * 64))
    assert MM._audio_features(s0)[0] == 0.0
    # compressed/foreign containers decline
    assert MM.decode_wav_samples(_flac(1, 8000, 16, 100)) is None


def test_decode_bmp_real():
    px = MM.decode_bmp_pixels(_bmp([[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]))
    assert px.shape == (2, 2, 3)
    assert tuple(px[0, 0]) == (255, 0, 0)  # top row first despite bottom-up disk order
    assert tuple(px[1, 1]) == (255, 255, 255)
    feats = MM._image_features(px)
    # channel means: red appears in 2 px (red, white), etc.
    assert abs(feats[0] - (255 + 255) / (4 * 255.0)) < 1e-6
    assert MM.decode_bmp_pixels(_png(2, 2)) is None


def test_extract_features_real_formats_no_fake(spark):
    """Uncompressed payloads decode for real WITHOUT deterministic_fake —
    only compressed formats need the stub."""
    rows = [
        (1, "audio", _wav_pcm([16384] * 32), "audio/wav", None, None, 4),
        (2, "image", _bmp([[(0, 0, 0), (255, 255, 255)]]), "image/bmp", 2, 1, None),
    ]
    media = spark.createDataFrame(rows, schema=MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in MM.extract_features(media).collect()}
    assert abs(out[1]["features"][0] - 0.5) < 1e-3  # constant half-scale RMS
    assert abs(out[2]["features"][0] - 0.5) < 1e-6  # mean red of black+white
    assert len(out[1]["features"]) == MM.FEATURE_DIM


def test_encode_decode_bmp_roundtrip():
    import numpy as np

    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
    ]
    px = MM.decode_bmp_pixels(_bmp(rows))
    again = MM.decode_bmp_pixels(MM.encode_bmp_pixels(px))
    assert np.array_equal(px, again)


def test_resize_image_pixels_nn():
    import numpy as np

    # 4x4 quadrant image downsampled 2x: each output pixel is its quadrant color
    q = [[(255, 0, 0)] * 2 + [(0, 255, 0)] * 2] * 2 + [[(0, 0, 255)] * 2 + [(255, 255, 0)] * 2] * 2
    px = MM.decode_bmp_pixels(_bmp(q))
    small = MM.resize_image_pixels(px, 2, 2)
    assert small.shape == (2, 2, 3)
    assert tuple(small[0, 0]) == (255, 0, 0)
    assert tuple(small[0, 1]) == (0, 255, 0)
    assert tuple(small[1, 0]) == (0, 0, 255)
    assert tuple(small[1, 1]) == (255, 255, 0)
    # upsample also works (no index overflow at edges)
    big = MM.resize_image_pixels(px, 7, 5)
    assert big.shape == (5, 7, 3)


def test_resize_images_dataframe(spark):
    rows = [
        (1, "image", _bmp([[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 0)]]), "image/bmp", 2, 2, None),
        (2, "image", _png(4, 4), "image/png", 4, 4, None),
        (3, "image", None, "image/bmp", None, None, None),
    ]
    media = spark.createDataFrame(rows, schema=MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in MM.resize_images(media, 1, 1, deterministic_fake=True).collect()}
    # BMP really resampled + re-encoded: decodes back at the new size
    px = MM.decode_bmp_pixels(out[1]["payload"])
    assert px.shape == (1, 1, 3) and out[1]["width"] == 1 and out[1]["height"] == 1
    # undecodable payload (header-only PNG) passthrough under the stub, NULL dims
    assert bytes(out[2]["payload"]) == _png(4, 4) and out[2]["width"] is None
    assert out[3]["payload"] is None

    # without the stub, an undecodable payload raises (contract pinned)
    import pytest

    with pytest.raises(Exception, match="NotImplementedError|image decoder"):
        MM.resize_images(media, 1, 1).collect()


def _filtered_png(px, filters):
    """Spec-FORWARD filtering: build a PNG whose row y uses filters[y],
    computing the filtered bytes from the raw image per the spec's filter
    equations — so decoding it checks the decoder's inversion against an
    independent construction, not against our own encoder."""
    import struct
    import zlib

    import numpy as np

    h, w, _ = px.shape
    bpp, stride = 3, w * 3
    raw = px.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = filters[y]
        line = raw[y]
        if f == 0:
            filt = line
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), line[:-bpp]])
            filt = (line - left) % 256
        elif f == 2:  # Up
            filt = (line - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), line[:-bpp]])
            filt = (line - ((left + prev) >> 1)) % 256
        else:  # Paeth
            filt = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[x] = (line[x] - pred) % 256
        out.append(f)
        out.extend(int(v) & 0xFF for v in filt)
        prev = line

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_and_all_filters():
    """encode->decode round-trips bit-exactly, and a spec-forward-filtered
    PNG exercising ALL FIVE filter types decodes back to the raw image —
    the inversion is checked against the spec equations, not the
    encoder."""
    import numpy as np

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    assert np.array_equal(MM.decode_png_pixels(MM.encode_png_pixels(px)), px)
    hard = _filtered_png(px, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(MM.decode_png_pixels(hard), px)


def test_png_color_types():
    """Grey replicates to RGB, RGBA drops alpha, palette resolves through
    PLTE — each built by hand at the chunk level."""
    import struct
    import zlib

    import numpy as np

    def build(ctype_n, w, h, raw, plte=None):
        def chunk(ct, data):
            return struct.pack(">I", len(data)) + ct + data + struct.pack(
                ">I", zlib.crc32(ct + data) & 0xFFFFFFFF
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_n, 0, 0, 0)
        body = chunk(b"IHDR", ihdr)
        if plte is not None:
            body += chunk(b"PLTE", plte)
        return b"\x89PNG\r\n\x1a\n" + body + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    # grey 2x1: values 10, 200
    g = build(0, 2, 1, bytes([0, 10, 200]))
    assert MM.decode_png_pixels(g).tolist() == [[[10, 10, 10], [200, 200, 200]]]
    # RGBA 1x1: alpha dropped
    ra = build(6, 1, 1, bytes([0, 1, 2, 3, 99]))
    assert MM.decode_png_pixels(ra).tolist() == [[[1, 2, 3]]]
    # palette 2x1: indices 1, 0 against a 2-entry PLTE
    p = build(3, 2, 1, bytes([0, 1, 0]), plte=bytes([255, 0, 0, 0, 0, 255]))
    assert MM.decode_png_pixels(p).tolist() == [[[0, 0, 255], [255, 0, 0]]]
    # header-only refused
    assert MM.decode_png_pixels(_png(2, 2)) is None


def test_png_resize_through_dataframe(spark):
    """A REAL PNG payload resizes through the mapInPandas pass and comes
    back as a decodable PNG thumbnail (no deterministic_fake needed)."""
    import numpy as np

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    rows = [(1, "image", MM.encode_png_pixels(px), "image/png", 8, 8, None)]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in MM.resize_images(media, 4, 4).collect()}
    assert (out[1]["width"], out[1]["height"]) == (4, 4)
    small = MM.decode_png_pixels(bytes(out[1]["payload"]))
    assert small.shape == (4, 4, 3)
    assert np.array_equal(small, MM.resize_image_pixels(px, 4, 4))
    # and features run for real on PNG now
    feats = MM.extract_features(media).collect()[0]["features"]
    assert len(feats) == MM.FEATURE_DIM and any(v > 0 for v in feats)


def _lzw_encode(indices, min_code_size):
    """Spec-FORWARD greedy LZW (GIF variant): independent of the decoder,
    so round-trips check the inversion against the spec, not itself."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = {(i,): i for i in range(1 << min_code_size)}
    next_code = eoi + 1
    width = min_code_size + 1
    out_bits = []

    def emit(code):
        nonlocal width
        for i in range(width):
            out_bits.append((code >> i) & 1)

    emit(clear)
    buf = ()
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        # the encoder widens when the NEXT code to assign no longer fits
        if next_code - 1 == (1 << width) - 1 and width < 12:
            width += 1
        buf = (sym,)
    if buf:
        emit(table[buf])
    emit(eoi)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, bit in enumerate(out_bits[i : i + 8]):
            byte |= bit << j
        by.append(byte)
    return bytes(by)


def _real_gif(px, palette):
    """Full GIF89a file: global color table `palette` (list of rgb
    triples, power-of-two length), full-frame image, LZW-encoded."""
    import math

    import numpy as np

    h, w, _ = np.asarray(px).shape if hasattr(px, "shape") else (len(px), len(px[0]), 3)
    pal = {tuple(c): i for i, c in enumerate(palette)}
    idx = [pal[tuple(px[y][x])] for y in range(h) for x in range(w)]
    depth = max(1, int(math.log2(len(palette))))
    min_code = max(2, depth)
    data = _lzw_encode(idx, min_code)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT flag + size
    for c in palette:
        out += bytes(c)
    out += b"\x2c" + b"\x00\x00\x00\x00" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_lzw_decode_real():
    """A spec-forward-encoded GIF (including repeated runs that drive the
    decoder's KwKwK path and code-width growth) decodes to the exact
    pixel array; extensions before the image descriptor are skipped;
    out-of-scope shapes return None."""
    import numpy as np

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    rng = np.random.RandomState(3)
    px = [[palette[rng.randint(4)] for _ in range(7)] for _ in range(5)]
    # heavy repetition in row 0 -> LZW actually compresses + KwKwK codes
    px[0] = [palette[1]] * 7
    g = MM.decode_gif_pixels(_real_gif(px, palette))
    assert g.tolist() == [[list(c) for c in row] for row in px]

    # a GCE extension block before the descriptor is walked over
    raw = _real_gif(px, palette)
    with_ext = raw[:13 + 12] + b"\x21\xf9\x04\x00\x00\x00\x00\x00" + raw[13 + 12:]
    assert MM.decode_gif_pixels(with_ext).tolist() == g.tolist()

    assert MM.decode_gif_pixels(_gif(2, 2)) is None  # header-only
    assert MM.decode_gif_pixels(b"GIF89a") is None


def test_gif_lzw_roundtrip_fuzz():
    """Round-trip across sizes/palettes: greedy-encoded index streams
    (random + runs) always decode back exactly — code-width growth at
    every boundary up to 12 bits is covered by the long run."""
    import numpy as np

    from consensource_sds_spark.operators.multimodal import _lzw_decode

    rng = np.random.RandomState(11)
    for n_sym, length in ((4, 10), (4, 500), (8, 300), (16, 2000)):
        min_code = max(2, int(np.log2(n_sym)))
        idx = rng.randint(0, n_sym, size=length).tolist()
        idx[: length // 3] = [1] * (length // 3)  # a compressible run
        assert _lzw_decode(_lzw_encode(idx, min_code), min_code) == idx


def test_gif_features_and_resize_real(spark):
    import numpy as np

    palette = [(0, 0, 0), (255, 255, 255), (128, 0, 0), (0, 128, 0)]
    px = [[palette[(x + y) % 4] for x in range(6)] for y in range(6)]
    payload = _real_gif(px, palette)
    media = spark.createDataFrame(
        [(1, "image", payload, "image/gif", 6, 6, None)], MM.MEDIA_SCHEMA
    )
    feats = MM.extract_features(media).collect()[0]["features"]
    assert len(feats) == MM.FEATURE_DIM and any(v > 0 for v in feats)
    out = MM.resize_images(media, 3, 3).collect()[0]
    small = MM.decode_png_pixels(bytes(out["payload"]))
    assert small.shape == (3, 3, 3)
    assert np.array_equal(
        small, MM.resize_image_pixels(np.array(px, dtype=np.uint8), 3, 3)
    )


def test_jpeg_roundtrip_all_layouts():
    """Baseline JPEG: encode->decode round-trips within tight error bounds
    per layout — 4:4:4 at unit quant is DCT-rounding-only (near-lossless),
    4:2:0 adds bounded chroma averaging error, grayscale replicates to
    RGB. The encoder emits its own canonical huffman tables, so the
    decoder's DHT/entropy path is exercised with tables it did not
    hardcode."""
    import numpy as np

    xx, yy = np.meshgrid(np.arange(29), np.arange(23))
    px = np.stack([(xx * 7) % 256, (yy * 11) % 256, ((xx + yy) * 5) % 256], axis=2).astype(
        np.uint8
    )
    d = MM.decode_jpeg_pixels(MM.encode_jpeg_pixels(px, quant=1))
    assert d.shape == px.shape
    assert np.abs(d.astype(float) - px).mean() < 0.5  # DCT rounding only
    d420 = MM.decode_jpeg_pixels(MM.encode_jpeg_pixels(px, subsample=True, quant=1))
    assert d420.shape == px.shape
    assert np.abs(d420.astype(float) - px).mean() < 8.0  # chroma averaging
    # luma survives subsampling untouched (Y is never subsampled here)
    lum = lambda a: a.astype(float) @ np.array([0.299, 0.587, 0.114])
    assert np.abs(lum(d420) - lum(px)).mean() < 2.0
    # grayscale: single-component scan, replicated channels
    gray = ((xx * 13 + yy * 7) % 256).astype(np.uint8)
    dg = MM.decode_jpeg_pixels(MM.encode_jpeg_pixels(gray, quant=1))
    assert dg.shape == (23, 29, 3)
    assert (dg[:, :, 0] == dg[:, :, 1]).all() and (dg[:, :, 1] == dg[:, :, 2]).all()
    assert np.abs(dg[:, :, 0].astype(float) - gray).mean() < 0.5
    # random noise at coarse quant still bounded (DCT energy compaction)
    rng = np.random.RandomState(9)
    noise = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    dn = MM.decode_jpeg_pixels(MM.encode_jpeg_pixels(noise, quant=8))
    assert np.abs(dn.astype(float) - noise).mean() < 12.0


def test_jpeg_out_of_scope_returns_none():
    """Header-only fragments and progressive frames are out of scope —
    None, never an exception or garbage; a DRI that PROMISES restart
    markers the stream does not contain is malformed and returns None."""
    import numpy as np

    assert MM.decode_jpeg_pixels(_jpeg(8, 8)) is None  # no scan data
    px = np.zeros((24, 24, 3), dtype=np.uint8)
    good = MM.encode_jpeg_pixels(px)
    assert MM.decode_jpeg_pixels(good) is not None
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)  # claim progressive
    assert MM.decode_jpeg_pixels(prog) is None
    # a DRI=1 injected into a stream WITHOUT restart markers: the decoder
    # expects RSTn after the first MCU and finds entropy bits -> None
    dri = b"\xff\xdd" + (4).to_bytes(2, "big") + (1).to_bytes(2, "big")
    with_dri = good[:2] + dri + good[2:]
    assert MM.decode_jpeg_pixels(with_dri) is None
    assert MM.decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None  # empty
    assert MM.decode_jpeg_pixels(b"not a jpeg") is None


def test_jpeg_features_and_resize_real(spark):
    """JPEG payloads run the REAL feature and resize kernels end to end;
    the thumbnail comes back as a decodable 4:2:0 JPEG whose pixels match
    the reference nearest-neighbor resample within JPEG error."""
    import numpy as np

    xx, yy = np.meshgrid(np.arange(16), np.arange(16))
    px = np.stack([(xx * 16) % 256, (yy * 16) % 256, 128 + 0 * xx], axis=2).astype(np.uint8)
    payload = MM.encode_jpeg_pixels(px, quant=1)
    media = spark.createDataFrame(
        [(1, "image", payload, "image/jpeg", 16, 16, None)], MM.MEDIA_SCHEMA
    )
    feats = MM.extract_features(media).collect()[0]["features"]
    assert len(feats) == MM.FEATURE_DIM and any(v > 0 for v in feats)
    out = MM.resize_images(media, 8, 8).collect()[0]
    assert (out["width"], out["height"]) == (8, 8)
    small = MM.decode_jpeg_pixels(bytes(out["payload"]))
    assert small.shape == (8, 8, 3)
    ref = MM.resize_image_pixels(MM.decode_jpeg_pixels(payload), 8, 8)
    assert np.abs(small.astype(float) - ref.astype(float)).mean() < 12.0


def test_flac_lossless_roundtrip_all_modes():
    """FLAC is lossless: every (strategy, stereo-mode) combination must
    round-trip BIT-EXACTLY — verbatim, constant, and fixed-predictor+rice
    subframes; independent, left-side, and mid-side decorrelation. The
    fixed predictor must also actually compress the sine-ish signal."""
    import numpy as np

    rng = np.random.RandomState(4)
    t = np.arange(9000)
    wave = (
        6000 * np.sin(t / 50) + 2000 * np.sin(t / 7) + rng.randint(-200, 200, t.size)
    ).astype(np.int64)
    stereo = np.stack([wave, (wave * 0.7).astype(np.int64)], axis=1).clip(-32768, 32767)
    for strat in ("verbatim", "fixed"):
        for st in ("indep", "left", "mid"):
            enc = MM.encode_flac_samples(stereo, strategy=strat, stereo=st)
            dec = MM.decode_flac_samples(enc)
            back = np.rint(dec * 32768.0).astype(np.int64)
            assert np.array_equal(back, stereo), (strat, st)
    fixed = MM.encode_flac_samples(stereo, strategy="fixed")
    assert len(fixed) < 0.75 * stereo.size * 2  # actually compresses
    flat = np.full((5000, 1), 77, dtype=np.int64)
    enc = MM.encode_flac_samples(flat, strategy="constant")
    assert len(enc) < 100  # constant subframe collapses the block
    assert np.array_equal(np.rint(MM.decode_flac_samples(enc) * 32768).astype(np.int64), flat)


def test_flac_full_scale_noise_roundtrip():
    """High-entropy audio: full-scale white noise drives the order-2 fixed
    predictor's residual mean past 2^14, so an unclamped rice parameter
    (k=16+) would be masked to k & 0xF in the 4-bit method-0 field and the
    stream would decode to garbage or None. The encoder must clamp k to 14
    (15 is the escape code) and still round-trip BIT-EXACTLY — mono and
    every stereo decorrelation mode (side channels reach 17 bits)."""
    import numpy as np

    rng = np.random.RandomState(99)
    mono = rng.randint(-32768, 32768, size=6000).astype(np.int64)
    enc = MM.encode_flac_samples(mono, strategy="fixed")
    dec = MM.decode_flac_samples(enc)
    assert dec is not None, "full-scale-noise FLAC stream must be decodable"
    assert np.array_equal(np.rint(dec * 32768.0).astype(np.int64)[:, 0], mono)
    # anti-correlated full-scale stereo maximizes the side channel
    stereo = np.stack([mono, -mono - 1], axis=1).clip(-32768, 32767)
    for st in ("indep", "left", "mid"):
        enc = MM.encode_flac_samples(stereo, strategy="fixed", stereo=st)
        dec = MM.decode_flac_samples(enc)
        assert dec is not None, st
        assert np.array_equal(np.rint(dec * 32768.0).astype(np.int64), stereo), st


def test_flac_rejects_garbage_and_wrong_crc():
    import numpy as np

    assert MM.decode_flac_samples(b"fLaC") is None
    assert MM.decode_flac_samples(b"not flac at all") is None
    good = MM.encode_flac_samples(np.full((500, 1), 3, dtype=np.int64))
    assert MM.decode_flac_samples(good) is not None
    # flip a byte inside the first frame HEADER -> CRC-8 mismatch -> None
    # (STREAMINFO is 4 + 4 + 34 bytes; frame starts at 42, header ~5 bytes in)
    bad = bytearray(good)
    bad[46] ^= 0x01
    assert MM.decode_flac_samples(bytes(bad)) is None


def test_flac_features_real(spark):
    """A FLAC payload runs the REAL audio feature kernel (RMS/ZCR/peak)
    and produces the SAME features as its WAV twin — one signal, two
    containers, identical numbers."""
    import numpy as np

    t = np.arange(4000)
    wave = (8000 * np.sin(t / 30)).astype(np.int64)[:, None]
    flac = MM.encode_flac_samples(wave)
    # the WAV twin via the existing PCM16 layout
    pcm = wave.astype("<i2").tobytes()
    wav = (
        b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (44100).to_bytes(4, "little") + (88200).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    media = spark.createDataFrame(
        [
            (1, "audio", flac, "audio/flac", None, None, None),
            (2, "audio", wav, "audio/wav", None, None, None),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r["features"] for r in MM.extract_features(media).collect()}
    assert out[1] == out[2]


def test_transcode_wav_to_flac(spark):
    """WAV payloads shrink to FLAC with BIT-EXACT samples; non-WAV rows
    pass through untouched (idempotent over a mixed corpus)."""
    import numpy as np

    t = np.arange(8000)
    wave = (7000 * np.sin(t / 40) + 500 * np.sin(t / 3)).astype(np.int64)[:, None]
    pcm = wave.astype("<i2").tobytes()
    wav = (
        b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (44100).to_bytes(4, "little") + (88200).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    other = MM.encode_flac_samples(wave)  # already FLAC: must pass through
    media = spark.createDataFrame(
        [
            (1, "audio", wav, "audio/wav", None, None, None),
            (2, "audio", other, "audio/flac", None, None, None),
            (3, "audio", None, "audio/wav", None, None, None),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in MM.transcode_wav_to_flac(media).collect()}
    assert out[1]["n_bytes_out"] < 0.8 * out[1]["n_bytes_in"]  # real shrink
    dec = MM.decode_flac_samples(bytes(out[1]["payload"]))
    assert np.array_equal(np.rint(dec * 32768.0).astype(np.int64), wave)
    assert bytes(out[2]["payload"]) == other  # untouched passthrough
    assert out[3]["payload"] is None


def test_png_adam7_interlaced():
    """An Adam7-interlaced PNG built spec-forward (sub-images extracted by
    the pass lattice, each pass filtered independently) decodes to the
    exact original — including a non-multiple-of-8 size where late
    passes carry most rows and early passes are tiny."""
    import struct
    import zlib

    import numpy as np

    ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    rng = np.random.RandomState(13)
    for w, h in ((11, 9), (8, 8), (3, 2), (1, 1)):
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        raw = bytearray()
        for x0, y0, xs, ys in ADAM7:
            sub = px[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty passes contribute NO scanlines (spec)
            for row in sub:
                raw.append(0)  # filter None
                raw.extend(row.reshape(-1))

        def chunk(ct, data):
            return struct.pack(">I", len(data)) + ct + data + struct.pack(
                ">I", zlib.crc32(ct + data) & 0xFFFFFFFF
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        got = MM.decode_png_pixels(payload)
        assert got is not None and np.array_equal(got, px), (w, h)


def test_gif_interlaced_decode():
    """A spec-forward interlaced GIF (rows emitted in 4-pass order, flag
    set) decodes back to the original row order — odd heights exercise
    uneven passes."""
    import numpy as np

    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    for h in (11, 8, 3, 1):
        w = 5
        rng = np.random.RandomState(h)
        px = [[palette[rng.randint(4)] for _ in range(w)] for _ in range(h)]
        order = [r for s, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(s, h, step)]
        reordered = [px[r] for r in order]
        raw = _real_gif(reordered, palette)
        # flip the image descriptor's interlace flag (descriptor packed
        # byte is right after the 2c + 4x2-byte geometry)
        ddx = raw.index(b"\x2c")
        flags = raw[ddx + 9]
        raw = raw[: ddx + 9] + bytes([flags | 0x40]) + raw[ddx + 10 :]
        got = MM.decode_gif_pixels(raw)
        assert got is not None, h
        assert got.tolist() == [[list(c) for c in row] for row in px], h


def test_jpeg_restart_intervals():
    """DRI/RSTn streams decode: the encoder emits restart markers every
    Ri MCUs (byte-aligned, DC predictors reset) and the decoder honors
    them — across interval lengths and both chroma layouts."""
    import numpy as np

    xx, yy = np.meshgrid(np.arange(40), np.arange(33))
    px = np.stack([(xx * 7) % 256, (yy * 11) % 256, ((xx + yy) * 5) % 256], axis=2).astype(
        np.uint8
    )
    for ri in (1, 3, 7):
        for sub in (False, True):
            dec = MM.decode_jpeg_pixels(
                MM.encode_jpeg_pixels(px, subsample=sub, quant=1, restart_interval=ri)
            )
            assert dec is not None, (ri, sub)
            mae = np.abs(dec.astype(float) - px).mean()
            assert mae < (0.5 if not sub else 8.0), (ri, sub, mae)


class TestFastPathEquivalence:
    """Native-codec fast path vs the pure-decoder oracle — these light up
    unmodified the day PIL / soundfile appear in the runtime (the same
    standing-probe discipline as the spark-protobuf JVM backend): lossless
    formats must match BIT-EXACTLY; JPEG within IDCT rounding."""

    @pytest.mark.skipif(not MM._HAVE_PIL, reason="PIL not installed in this container")
    def test_pil_lossless_pixels_bit_exact(self):
        import numpy as np

        px = np.arange(16 * 12 * 3, dtype=np.uint8).reshape(16, 12, 3)
        for enc, dec in (
            (MM.encode_png_pixels, MM.decode_png_pixels),
            (MM.encode_bmp_pixels, MM.decode_bmp_pixels),
        ):
            payload = enc(px)
            fast = MM.fast_decode_pixels(payload)
            pure = dec(payload)
            assert fast is not None and pure is not None
            assert np.array_equal(fast, pure), enc.__name__

    @pytest.mark.skipif(not MM._HAVE_PIL, reason="PIL not installed in this container")
    def test_pil_jpeg_within_idct_rounding(self):
        import numpy as np

        px = np.arange(32 * 32 * 3, dtype=np.uint8).reshape(32, 32, 3)
        payload = MM.encode_jpeg_pixels(px, quant=1)
        fast = MM.fast_decode_pixels(payload).astype(np.int64)
        pure = MM.decode_jpeg_pixels(payload).astype(np.int64)
        assert fast.shape == pure.shape
        assert np.abs(fast - pure).max() <= 2  # IDCT rounding envelope

    @pytest.mark.skipif(
        not MM._HAVE_SOUNDFILE, reason="soundfile not installed in this container"
    )
    def test_soundfile_flac_bit_exact(self):
        import numpy as np

        rng = np.random.RandomState(3)
        wave = rng.randint(-32768, 32768, size=(4000, 2)).astype(np.int64)
        payload = MM.encode_flac_samples(wave, strategy="fixed", stereo="mid")
        fast = MM.fast_decode_samples(payload)
        pure = MM.decode_flac_samples(payload)
        assert fast is not None and pure is not None
        assert np.array_equal(
            np.rint(fast * 32768.0).astype(np.int64), np.rint(pure * 32768.0).astype(np.int64)
        )

    def test_fast_path_absent_is_inert(self, monkeypatch):
        """Without the libraries (or with SPARK_GRAFT_MEDIA_FAST=0) the
        fast hooks return None and _features_one's answers come from the
        pure decoders — the shipped sandbox behavior, pinned."""
        import numpy as np

        monkeypatch.setenv("SPARK_GRAFT_MEDIA_FAST", "0")
        px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        payload = MM.encode_png_pixels(px)
        assert MM.fast_decode_pixels(payload) is None
        assert MM.fast_decode_samples(payload) is None
        feats = MM._features_one(payload, deterministic_fake=False)
        assert len(feats) == MM.FEATURE_DIM


def _wav_pcm16(wave, rate=44100, ch=1):
    pcm = wave.astype("<i2").tobytes()
    return (
        b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2 * ch).to_bytes(4, "little")
        + (2 * ch).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )


def test_flac_long_stream_multibyte_frame_numbers():
    """Regression: the UTF-8 frame-number lead byte carried one extra
    leading 1 bit, so every stream with frame_no >= 128 (12 s of 44.1 kHz
    audio) was structurally corrupt — the decoder miscounted the ones,
    consumed the blocksize byte, and CRC-8 failed (decode returned None,
    silent archival data loss)."""
    import numpy as np

    n = 130 * 4096  # 130 frames: crosses the 1-byte (128) boundary
    wave = ((np.arange(n) * 2654435761) % 4096 - 2048).astype(np.int64)[:, None]
    enc = MM.encode_flac_samples(wave, strategy="fixed")
    dec = MM.decode_flac_samples(enc)
    assert dec is not None, "multi-byte frame numbers must decode"
    assert np.array_equal(np.rint(dec * 32768.0).astype(np.int64), wave)


def test_transcode_preserves_source_sample_rate():
    """Regression: transcode hardcoded 44100 into STREAMINFO — a 16 kHz
    speech WAV was archived with wrong rate and wrong duration metadata."""
    import numpy as np

    wave = (3000 * np.sin(np.arange(16_000) / 25)).astype(np.int64)[:, None]
    wav = _wav_pcm16(wave, rate=16_000)
    rate = MM._wav_sample_rate(wav)
    assert rate == 16_000
    enc = MM.encode_flac_samples(wave, sample_rate=rate)
    fmt, ch, sr, bits, dur = MM.sniff_audio_meta(enc)
    assert (fmt, sr) == ("flac", 16_000)
    assert abs(dur - 1000) <= 1  # 16k samples at 16 kHz = 1000 ms


def test_flac_encoder_rejects_more_than_8_channels():
    """Regression: >8 channels silently aliased into a 1-channel header and
    a garbage stereo decode (ch_code collided with decorrelation modes)."""
    import numpy as np

    import pytest

    nine = np.zeros((100, 9), dtype=np.int64)
    with pytest.raises(ValueError, match="1-8 channels"):
        MM.encode_flac_samples(nine)


def test_plans_skip_null_and_zero_duration(spark):
    """Regression: duration_ms=0 made frame_sample_plan's sequence(0,-1)
    throw (aborting the job on one degenerate row), and a NULL duration
    fabricated a phantom first audio chunk via greatest(NULL-1, 0)=0."""
    media = spark.createDataFrame(
        [
            (1, "video", None, "video/mp4", None, None, 0),
            (2, "video", None, "video/mp4", None, None, None),
            (3, "video", None, "video/mp4", None, None, 2500),
            (4, "audio", None, "audio/wav", None, None, None),
            (5, "audio", None, "audio/wav", None, None, 1000),
        ],
        MM.MEDIA_SCHEMA,
    )
    frames = MM.frame_sample_plan(media, every_ms=1000).collect()
    assert {r["media_id"] for r in frames} == {3}
    chunks = MM.audio_chunk_plan(media).collect()
    assert {r["media_id"] for r in chunks} == {5}


def test_resize_quarantines_malformed_instead_of_failing(spark):
    """Regression: a recognized-but-corrupt payload (PNG palette index past
    the PLTE) raised out of resize's kernel — a deterministic task failure
    wedging the whole pass; it must yield an all-NULL row instead."""
    import struct
    import zlib

    def chunk(t, d):
        c = t + d
        return struct.pack(">I", len(d)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"\x00\x05\x05" + b"\x00\x05\x05"  # indexes past the 1-entry PLTE
    bad_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", b"\xff\x00\x00")
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    px = __import__("numpy").arange(8 * 8 * 3, dtype="uint8").reshape(8, 8, 3)
    good = MM.encode_png_pixels(px)
    media = spark.createDataFrame(
        [
            (1, "image", bad_png, "image/png", 2, 2, None),
            (2, "image", good, "image/png", 8, 8, None),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in MM.resize_images(media, 4, 4).collect()}
    assert out[1]["payload"] is None and out[1]["width"] is None
    assert out[2]["width"] == 4 and out[2]["payload"] is not None


# ---------------------------------------------------------------------------
# Hand-built FLAC frames: decode paths the repo's own encoder never emits
# (multi-partition rice, method-1 params, escape partitions, LPC subframes,
# wasted bits). A third-party stream exercises all of these; expected
# samples come from an independent straight-python reference in the test.
# ---------------------------------------------------------------------------


def _flac_streaminfo(n_samples: int, nch: int) -> bytes:
    w = MM._MsbWriter()
    w.bits(4096, 16)
    w.bits(4096, 16)
    w.bits(0, 24)
    w.bits(0, 24)
    w.bits(44100, 20)
    w.bits(nch - 1, 3)
    w.bits(15, 5)  # bps - 1
    w.bits(n_samples, 36)
    w.align()
    si = bytes(w.out) + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def _flac_frame(subframe_writers, blocksize: int, frame_no: int = 0) -> bytes:
    w = MM._MsbWriter()
    w.bits(0x3FFE, 14)
    w.bits(0, 1)
    w.bits(0, 1)
    w.bits(7, 4)  # 16-bit blocksize-1 follows
    w.bits(0, 4)  # sample rate from STREAMINFO
    w.bits(len(subframe_writers) - 1, 4)  # independent channels
    w.bits(4, 3)  # 16 bps
    w.bits(0, 1)
    w.bits(frame_no, 8)
    w.bits(blocksize - 1, 16)
    w.align()
    w.bits(MM._crc8(bytes(w.out)), 8)
    for sub in subframe_writers:
        sub(w)
    w.align()
    w.bits(MM._crc16(bytes(w.out)), 16)
    return bytes(w.out)


def _write_residuals(w, res, blocksize, order, method, porder, part_specs):
    """part_specs: one ('rice', k) | ('raw', width) per partition."""
    w.bits(method, 2)
    w.bits(porder, 4)
    pbits = 4 + method
    idx = 0
    for p in range(1 << porder):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        kind, param = part_specs[p]
        if kind == "rice":
            w.bits(param, pbits)
            for v in res[idx : idx + n]:
                u = (v << 1) if v >= 0 else ((-v << 1) - 1)
                for _ in range(u >> param):
                    w.bits(0, 1)
                w.bits(1, 1)
                if param:
                    w.bits(u, param)
        else:  # raw escape partition
            w.bits((1 << pbits) - 1, pbits)
            w.bits(param, 5)
            for v in res[idx : idx + n]:
                w.bits(v, param)
        idx += n
    assert idx == len(res)


def _ref_fixed(warm, res, order):
    coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
    out = list(warm)
    for r in res:
        out.append(r + sum(c * out[-i - 1] for i, c in enumerate(coefs)))
    return out


def _ref_lpc(warm, res, coefs, shift):
    out = list(warm)
    for r in res:
        out.append(r + (sum(c * out[-i - 1] for i, c in enumerate(coefs)) >> shift))
    return out


def _decode_ints(stream, n, nch):
    import numpy as np

    out = MM.decode_flac_samples(stream)
    assert out is not None and out.shape == (n, nch)
    return np.rint(out * 32768.0).astype(int)


def test_flac_multi_partition_rice_and_method1():
    """porder=2 (4 partitions, first short by the predictor order) with
    per-partition parameters, under the 5-bit method-1 header."""
    import numpy as np

    rng = np.random.RandomState(7)
    blocksize, order = 64, 2
    warm = [100, -3]
    res = [int(v) for v in rng.randint(-40, 40, blocksize - order)]
    specs = [("rice", 0), ("rice", 3), ("rice", 17), ("rice", 6)]

    def sub(w):
        w.bits(0, 1)
        w.bits(8 + order, 6)  # FIXED order 2
        w.bits(0, 1)
        for v in warm:
            w.bits(v, 16)
        _write_residuals(w, res, blocksize, order, 1, 2, specs)

    stream = _flac_streaminfo(blocksize, 1) + _flac_frame([sub], blocksize)
    got = _decode_ints(stream, blocksize, 1)[:, 0]
    assert got.tolist() == _ref_fixed(warm, res, order)


def test_flac_escape_partition_raw_residuals():
    """Escape-coded partition (raw two's complement at a 5-bit width)
    mixed with a rice partition in one subframe."""
    blocksize, order = 32, 1
    warm = [-500]
    res = [(-1) ** i * (i * 37 % 900) for i in range(blocksize - order)]
    specs = [("raw", 12), ("rice", 5)]

    def sub(w):
        w.bits(0, 1)
        w.bits(8 + order, 6)
        w.bits(0, 1)
        for v in warm:
            w.bits(v, 16)
        _write_residuals(w, res, blocksize, order, 0, 1, specs)

    stream = _flac_streaminfo(blocksize, 1) + _flac_frame([sub], blocksize)
    got = _decode_ints(stream, blocksize, 1)[:, 0]
    assert got.tolist() == _ref_fixed(warm, res, order)


def test_flac_lpc_subframe():
    """LPC order-3 with quantized coefficients and a nonzero shift — the
    sequential integer filter path (spec: truncating >> after the dot
    product)."""
    import numpy as np

    blocksize, order = 48, 3
    warm = [1000, 990, 1003]
    # stable filter (|gain| < 1): an unstable one explodes past the int16
    # range and float32 output exactness within a block
    coefs = [256, -128, 64]  # 12-bit precision
    shift = 9
    rng = np.random.RandomState(11)
    res = [int(v) for v in rng.randint(-25, 25, blocksize - order)]

    def sub(w):
        w.bits(0, 1)
        w.bits(32 + order - 1, 6)  # LPC: ftype 32..63 -> order ftype-31
        w.bits(0, 1)
        for v in warm:
            w.bits(v, 16)
        w.bits(12 - 1, 4)  # precision 12
        w.bits(shift, 5)
        for c in coefs:
            w.bits(c, 12)
        _write_residuals(w, res, blocksize, order, 0, 0, [("rice", 4)])

    stream = _flac_streaminfo(blocksize, 1) + _flac_frame([sub], blocksize)
    got = _decode_ints(stream, blocksize, 1)[:, 0]
    assert got.tolist() == _ref_lpc(warm, res, coefs, shift)


def test_flac_wasted_bits_shift_samples():
    """A subframe with wasted bits decodes at the reduced width and shifts
    every sample back up (constant + verbatim variants)."""
    blocksize = 16
    wasted = 3
    vals = [((i * 97) % 251 - 125) for i in range(blocksize)]

    def const_sub(w):
        w.bits(0, 1)
        w.bits(0, 6)  # CONSTANT
        w.bits(1, 1)  # wasted flag
        for _ in range(wasted - 1):
            w.bits(0, 1)
        w.bits(1, 1)  # unary terminator: wasted = 1 + (wasted-1)
        w.bits(-40, 16 - wasted)

    def verb_sub(w):
        w.bits(0, 1)
        w.bits(1, 6)  # VERBATIM
        w.bits(1, 1)
        for _ in range(wasted - 1):
            w.bits(0, 1)
        w.bits(1, 1)
        for v in vals:
            w.bits(v, 16 - wasted)

    stream = _flac_streaminfo(blocksize, 2) + _flac_frame(
        [const_sub, verb_sub], blocksize
    )
    got = _decode_ints(stream, blocksize, 2)
    assert got[:, 0].tolist() == [-40 << wasted] * blocksize
    assert got[:, 1].tolist() == [v << wasted for v in vals]


def test_flac_multi_frame_mixed_subframe_types():
    """Two frames whose channels use different subframe families — the
    per-frame reader state (shared bit index, alignment, CRC) must not
    leak across frames."""
    import numpy as np

    bs = 24
    warm = [10]
    res1 = [3, -2] * ((bs - 1) // 2) + [1] * ((bs - 1) % 2)
    vals2 = [(i * 13) % 200 - 100 for i in range(bs)]

    def f1_fixed(w):
        w.bits(0, 1)
        w.bits(8 + 1, 6)
        w.bits(0, 1)
        w.bits(warm[0], 16)
        _write_residuals(w, res1, bs, 1, 0, 1, [("rice", 2), ("raw", 9)])

    def f2_verbatim(w):
        w.bits(0, 1)
        w.bits(1, 6)
        w.bits(0, 1)
        for v in vals2:
            w.bits(v, 16)

    stream = (
        _flac_streaminfo(2 * bs, 1)
        + _flac_frame([f1_fixed], bs, frame_no=0)
        + _flac_frame([f2_verbatim], bs, frame_no=1)
    )
    got = _decode_ints(stream, 2 * bs, 1)[:, 0]
    expect = _ref_fixed(warm, res1, 1) + vals2
    assert got.tolist() == expect
