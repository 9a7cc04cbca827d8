"""Continuous media-corpus ingest — the multimodal face of corpus_ingest.

Image/audio drops arrive as parquet batches of opaque binary payloads
(the MEDIA_SCHEMA contract of operators/multimodal.py). Each microbatch
runs the REAL decode + featurize kernels (pure-numpy codecs: BMP, PNG,
GIF, baseline JPEG, WAV-PCM, FLAC) and lands in two lanes, both
batch_id-partitioned with dynamic overwrite so crash replays overwrite
their own output — the same idempotence-by-layout contract as the
document corpus and the ANN index:

- ``<out>/features``: (media_id, modality, n_bytes, features) for every
  payload a built-in codec decodes;
- ``<out>_quarantine``: rows NO decoder recognizes (foreign containers,
  truncated files), payload preserved for replay once a codec exists —
  the W5 dead-letter discipline; at crawl scale undecodable media is
  data to audit, not an exception to crash on and not a row to lose.

Scale: the kernel is one Arrow-batched ``mapInPandas`` pass (payload
bytes never visit the driver); the decoded/undecodable split is computed
ONCE per batch (localCheckpoint) and feeds both writes, so payloads
decode exactly once per microbatch.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from consensource_sds_spark.operators.multimodal import (
    MALFORMED_MEDIA_ERRORS,
    MEDIA_SCHEMA,
    _audio_features,
    _decode_one,
    _image_features,
)

#: a deterministic replay of malformed bytes fails identically, so letting
#: a decoder exception escape the kernel wedges the stream permanently —
#: they are quarantine rows, not task failures. The malformed taxonomy
#: itself lives with the decoders (multimodal.MALFORMED_MEDIA_ERRORS) so
#: transform passes and this ingest can never disagree on it; foreign
#: formats (NotImplementedError) quarantine here too.
_MALFORMED_PAYLOAD_ERRORS = (NotImplementedError, *MALFORMED_MEDIA_ERRORS)

#: file-stream schema for media drops — THE canonical record schema
#: (one definition, the repo's no-drift schema rule; a hand-written DDL
#: twin here had already drifted in nullability)
MEDIA_STREAM_SCHEMA = MEDIA_SCHEMA

_SPLIT_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
        StructField("decoded", BooleanType(), False),
        StructField("payload", BinaryType(), True),  # quarantine only
    ]
)


def ingest_media_batch(batch_df: DataFrame, batch_id: int, out_dir: str) -> None:
    """One microbatch: decode+featurize once, split into the features and
    quarantine lanes, idempotent batch_id-partitioned writes."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for _i, r in pdf.iterrows():
                payload = r["payload"]
                if payload is None:
                    # nothing to decode: quarantine, never the features
                    # lane (a decoded=True row with NULL features would
                    # poison downstream feature consumers)
                    rows.append((r["media_id"], r["modality"], None, None, False, None))
                    continue
                # the quarantine catch wraps DECODE ONLY — a featurizer bug
                # on a successfully-decoded payload must fail the task
                # loudly, not silently quarantine the whole corpus
                try:
                    decoded = _decode_one(bytes(payload))
                except _MALFORMED_PAYLOAD_ERRORS:
                    rows.append(
                        (
                            r["media_id"],
                            r["modality"],
                            len(payload),
                            None,
                            False,
                            bytes(payload),
                        )
                    )
                    continue
                kind, data = decoded
                feats = _audio_features(data) if kind == "audio" else _image_features(data)
                rows.append(
                    (
                        r["media_id"],
                        r["modality"],
                        len(payload),
                        feats,
                        True,
                        None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "modality", "n_bytes", "features", "decoded", "payload"]
            )

    split = (
        batch_df.repartition("media_id")
        .mapInPandas(kernel, _SPLIT_SCHEMA)
        .withColumn("batch_id", F.lit(batch_id))
        .localCheckpoint()  # decode exactly once; both writes read this
    )
    (
        split.filter(F.col("decoded"))
        .drop("decoded", "payload")
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(os.path.join(out_dir, "features"))
    )
    (
        split.filter(~F.col("decoded"))
        .select("media_id", "modality", "n_bytes", "payload", "batch_id")
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(out_dir.rstrip("/") + "_quarantine")
    )


def run_media_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream media parquet drops through decode/featurize into the
    features + quarantine lanes. ``available_now`` drains and stops (the
    backfill/test trigger); False runs continuously."""
    stream = spark.readStream.schema(MEDIA_STREAM_SCHEMA).parquet(source_dir)

    def body(batch_df: DataFrame, batch_id: int) -> None:
        ingest_media_batch(batch_df, batch_id, out_dir)

    writer = stream.writeStream.foreachBatch(body).option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()


def read_media_features(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "features"))


__all__ = [
    "MEDIA_STREAM_SCHEMA",
    "ingest_media_batch",
    "run_media_stream",
    "read_media_features",
]
