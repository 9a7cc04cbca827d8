"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as ``binary``
columns with a metadata struct; decode/feature steps run as Arrow-batched
``mapInPandas`` so payload bytes never round-trip through the driver and
batch size bounds executor memory.

The decode kernels themselves are STUBBED here (no image/audio libraries in
this container): ``decode_stub`` raises NotImplementedError unless
``deterministic_fake=True``, which derives a stable fake feature vector from
the payload hash — the Spark-side contract (schema, partitioning, UDF
signature, Arrow batch shape) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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
    """Deterministic stand-in for a real decoder: 16 floats in [0,1) derived
    from the sha256 of the payload."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_features(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow batches).

    Real deployments plug a decoder (PIL/librosa/ffmpeg) into ``kernel``;
    this container has none, so without ``deterministic_fake`` the kernel
    raises NotImplementedError per the stubbing contract."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present in this container"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else None),
                    "features": pdf["payload"].map(
                        lambda b: _fake_features(bytes(b)) if b is not None else None
                    ),
                }
            )
            yield out

    # repartition by media_id so payload bytes spread evenly across tasks
    return media.repartition("media_id").mapInPandas(kernel, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each video row into frame
    timestamps JVM-side (sequence+explode); the per-frame decode would hang
    off the exploded rows via :func:`extract_features`."""
    vids = media.filter(F.col("modality") == "video")
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))).alias("frame_ts_ms"),
    )
