"""streaming/media_ingest.py: continuous media decode/featurize with the
corpus ingest's idempotence + quarantine discipline."""

from __future__ import annotations

import numpy as np

from consensource_sds_spark.operators import multimodal as MM
from consensource_sds_spark.streaming.media_ingest import (
    ingest_media_batch,
    read_media_features,
    run_media_stream,
)


def _media_rows(spark):
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    png = MM.encode_png_pixels(px)
    jpg = MM.encode_jpeg_pixels(px, quant=1)
    wave = (5000 * np.sin(np.arange(3000) / 20)).astype(np.int64)[:, None]
    flac = MM.encode_flac_samples(wave)
    rows = [
        (1, "image", png, "image/png", 8, 8, None),
        (2, "image", jpg, "image/jpeg", 8, 8, None),
        (3, "audio", flac, "audio/flac", None, None, None),
        (4, "video", b"\x00\x00ftyp-foreign-container", "video/mp4", None, None, 1000),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_media_stream_features_and_quarantine(spark, tmp_path):
    """Decodable payloads (PNG/JPEG/FLAC through the REAL codecs) land in
    the features lane; the foreign video container lands in quarantine
    with its payload preserved; a replayed drain is idempotent."""
    src, out, ckpt = str(tmp_path / "in"), str(tmp_path / "media"), str(tmp_path / "ckpt")
    _media_rows(spark).coalesce(1).write.mode("append").parquet(src)
    run_media_stream(spark, src, out, ckpt)

    feats = {r["media_id"]: r for r in read_media_features(spark, out).collect()}
    assert set(feats) == {1, 2, 3}
    for r in feats.values():
        assert len(r["features"]) == MM.FEATURE_DIM
    # PNG features match the batch kernel's answer exactly
    batch = {
        r["media_id"]: r["features"]
        for r in MM.extract_features(_media_rows(spark).filter("media_id < 4")).collect()
    }
    assert feats[1]["features"] == batch[1]

    q = spark.read.parquet(out + "_quarantine").collect()
    assert len(q) == 1 and q[0]["media_id"] == 4
    assert bytes(q[0]["payload"]) == b"\x00\x00ftyp-foreign-container"

    # replaying the SAME batch_id overwrites its own partitions (no dup)
    ingest_media_batch(_media_rows(spark), 0, out)
    assert read_media_features(spark, out).count() == 3
    assert spark.read.parquet(out + "_quarantine").count() == 1


def test_null_payload_quarantined_not_featured(spark, tmp_path):
    """Regression: a NULL payload has nothing to decode — it must land in
    the quarantine lane, not in features as a decoded=True row with NULL
    features (which would poison downstream feature consumers)."""
    out = str(tmp_path / "media")
    rows = [(1, "image", None, "image/png", 8, 8, None)]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    ingest_media_batch(df, 0, out)
    import glob
    import os

    # nothing reaches the features lane (at most an empty dir materializes)
    feat_files = glob.glob(os.path.join(out, "features", "**", "*.parquet"), recursive=True)
    assert feat_files == []
    q = spark.read.parquet(out + "_quarantine").collect()
    assert len(q) == 1 and q[0]["media_id"] == 1 and q[0]["payload"] is None


def _malformed_rows(spark):
    """Payloads the sniffers RECOGNIZE but whose bodies are corrupt — the
    decoders raise (IndexError/ValueError/zlib.error), not return None, so
    the kernel must translate the raise into a quarantine row instead of
    failing the task (a deterministic replay fails identically and the
    stream would wedge permanently)."""
    import struct
    import zlib

    def chunk(t, d):
        c = t + d
        return struct.pack(">I", len(d)) + c + struct.pack(">I", zlib.crc32(c))

    # PNG: palette image whose pixels index past the 1-entry PLTE
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"\x00\x05\x05" + b"\x00\x05\x05"
    bad_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", b"\xff\x00\x00")
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    # GIF: stream truncated inside the image descriptor
    hdr = b"GIF89a" + b"\x08\x00\x08\x00" + bytes([0x80]) + b"\x00\x00"
    bad_gif = hdr + b"\x00\x00\x00\xff\xff\xff" + b"\x2c\x00\x00\x00\x00"
    # PNG: IDAT is not a DEFLATE stream at all
    corrupt_idat = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", b"\x01\x02\x03\x04not-deflate")
        + chunk(b"IEND", b"")
    )
    good_px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    rows = [
        (10, "image", MM.encode_png_pixels(good_px), "image/png", 4, 4, None),
        (11, "image", bad_png, "image/png", 2, 2, None),
        (12, "image", bad_gif, "image/gif", 8, 8, None),
        (13, "image", corrupt_idat, "image/png", 2, 2, None),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_media_stream_malformed_payloads_quarantined(spark, tmp_path):
    """One corrupt payload must NOT wedge the stream: the malformed PNG
    (out-of-range palette index), truncated GIF, and corrupt-DEFLATE PNG
    land in quarantine with payloads preserved, while the good PNG in the
    SAME microbatch still produces features."""
    src, out, ckpt = str(tmp_path / "in"), str(tmp_path / "media"), str(tmp_path / "ckpt")
    _malformed_rows(spark).coalesce(1).write.mode("append").parquet(src)
    run_media_stream(spark, src, out, ckpt)

    feats = {r["media_id"] for r in read_media_features(spark, out).collect()}
    assert feats == {10}
    q = {r["media_id"]: r for r in spark.read.parquet(out + "_quarantine").collect()}
    assert set(q) == {11, 12, 13}
    assert all(q[i]["payload"] is not None and q[i]["n_bytes"] > 0 for i in q)
