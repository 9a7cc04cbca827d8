"""Structured Streaming shell around the batch pipeline.

The reference's ingest loop is a single-threaded ZMQ poll with a 1 s receive
timeout (subscriber.rs:87-93); the Spark equivalent is a microbatch trigger
over a replayable source. This container has no validator, so the runner
streams the same envelope schema from files (Parquet) — any replayable
source (Kafka, a ZMQ->Kafka bridge, Delta CDF) drops in because the
transform is source-agnostic.

Mapping of the reference's connector duties (SURVEY §2.1):

- S1 poll loop          -> ``trigger(processingTime=...)`` microbatches
- S2 server-side filter -> source-level pushdown: the namespace predicate in
  :func:`~consensource_sds_spark.operators.transforms.parse_state_deltas` is
  a plain ``startswith`` filter Catalyst pushes into the scan
- S3 catch-up cursor    -> the streaming checkpoint (exactly-once resume) +
  ``ScdParquetStore.known_block_ids`` for offering known heads to a live
  validator source
- S4 graceful shutdown  -> ``StreamingQuery.stop()``
- W1 per-block txn      -> idempotent ``foreachBatch`` keyed on batch_id
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from consensource_sds_spark import schemas
from consensource_sds_spark.operators.scd2 import ScdParquetStore
from consensource_sds_spark.pipeline import transform_events


def _query_id(checkpoint_dir: str) -> str | None:
    """The engine's persistent streaming query id (written to
    ``<checkpoint>/metadata`` at stream start, stable across restarts of
    the same checkpoint) — the store's replay-idempotency app id, exactly
    Delta's txnAppId. Rebuilt checkpoint => new id => batch 0 is a new
    stream, not a replay."""
    import json
    import os

    try:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return json.load(f)["id"]
    except (OSError, ValueError, KeyError):
        return None


def run_file_stream(
    spark: SparkSession,
    source_dir: str,
    store: ScdParquetStore,
    checkpoint_dir: str,
    trigger_once: bool = True,
    processing_time: str = "1 second",
    auto_compact: bool = False,
):
    """Stream envelope Parquet files through the pipeline into the store.

    Files must carry the schemas.EVENT columns + delivery_id. Returns the
    started StreamingQuery; caller awaits/stops it (S4). ``auto_compact``
    runs the store's threshold maintenance policy after every applied
    batch — under threshold it costs one manifest read, over it the
    accumulated closed/block segments fold in their own committed
    generation (a maintenance commit between batches, never inside one)."""

    def apply_batch(batch_df, batch_id: int):
        # transform_events materializes the decoded changes once (one decode
        # pass per microbatch); ScdParquetStore.apply is the transaction
        # boundary (W1) and is idempotent on (stream identity, batch_id)
        # replay — the stream identity is the engine's persistent query id.
        store.apply(
            transform_events(batch_df, materialize=True, n_buckets=store._n_buckets()),
            batch_id=batch_id,
            txn_app_id=_query_id(checkpoint_dir),
        )
        if auto_compact:
            store.maybe_compact()

    reader = (
        spark.readStream.schema(
            schemas.StructType(
                schemas.EVENT.fields
                + [schemas.StructField("delivery_id", schemas.LongType(), False)]
            )
        )
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    writer = reader.writeStream.foreachBatch(apply_batch).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def run_validator_stream(
    spark: SparkSession,
    spool_dir: str,
    store: ScdParquetStore,
    checkpoint_dir: str,
    trigger_once: bool = True,
    processing_time: str = "1 second",
):
    """Stream wire envelopes from the validator spool source
    (``sources/validator_source.py``) through the pipeline into the store —
    the full S1->W1 path on the custom DataSource.

    The S3 handshake: the store's highest known block seeds the source's
    ``start_block`` so a rebuilt checkpoint never re-ingests history the
    store already holds (the reference's fetch_known_blocks -> subscribe
    flow, main.rs:57-63). With an existing checkpoint, the engine's offset
    log takes precedence — exactly-once either way."""
    from consensource_sds_spark.sources import validator_source as vs

    from pyspark.sql import functions as F

    vs.register(spark)
    head = store.blocks().agg(F.max("block_num").alias("m")).collect()[0]["m"]
    start_block = head if head is not None else -1

    def apply_batch(batch_df, batch_id: int):
        store.apply(
            transform_events(batch_df, materialize=True, n_buckets=store._n_buckets()),
            batch_id=batch_id,
            txn_app_id=_query_id(checkpoint_dir),
        )

    reader = (
        spark.readStream.format(vs.FORMAT_NAME)
        .option("path", spool_dir)
        .option("start_block", str(start_block))
        .load()
    )
    writer = reader.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def stop_stream(query, timeout_sec: int = 60) -> None:
    """S4 graceful shutdown (subscriber.rs:121-151 / main.rs:67-71 analog):
    stop the microbatch trigger and wait for the in-flight batch to drain.
    ``foreachBatch`` commits are atomic on the store manifest and the
    checkpoint survives, so the next ``run_file_stream`` over the same
    checkpoint resumes exactly-once."""
    query.stop()
    query.awaitTermination(timeout_sec)
