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


def test_frame_sample_plan(media, spark):
    frames = MM.frame_sample_plan(media, every_ms=1000).collect()
    assert sorted((r["media_id"], r["frame_ts_ms"]) for r in frames) == [
        (3, 0),
        (3, 1000),
        (3, 2000),
        (3, 3000),
    ]
