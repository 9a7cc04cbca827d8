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


def _stream_identity():
    """(holder, resolve) for the store's replay-idempotency app id —
    exactly Delta's txnAppId: the engine's persistent query id, stable
    across restarts of one checkpoint, new on a rebuilt checkpoint (so
    its batch 0 is a new stream, not a replay).

    The id comes from ``StreamingQuery.id`` on the STARTED query (the
    runner sets the holder right after ``start()``; the first microbatch
    waits the few ms until then) instead of a driver-local ``open()`` of
    ``<checkpoint>/metadata``: a production checkpoint lives on
    fault-tolerant storage (hdfs://, s3a://) where the local read fails
    on every batch — and a silently-None app id degrades apply() to the
    GLOBAL last_batch_id guard, under which a rebuilt checkpoint's fresh
    batches 0..N are skipped as replays (permanent silent data loss).
    Unresolvable identity now raises instead."""
    import threading

    ready = threading.Event()
    holder: dict = {}

    def resolve() -> str:
        if not ready.wait(timeout=120):
            raise RuntimeError(
                "stream identity was not resolved within 120 s of the first "
                "microbatch — refusing to fall back to the global batch-id "
                "guard (a rebuilt checkpoint would silently skip its fresh "
                "batches as replays)"
            )
        return holder["id"]

    def publish(query) -> None:
        holder["id"] = str(query.id)
        ready.set()

    return resolve, publish


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

    reader = (
        spark.readStream.schema(schemas.event_envelope_schema())
        .option("maxFilesPerTrigger", "16")
        .parquet(source_dir)
    )
    return _start_pipeline_stream(
        reader, store, checkpoint_dir, trigger_once, processing_time, auto_compact
    )


def _start_pipeline_stream(
    reader, store, checkpoint_dir, trigger_once, processing_time, auto_compact
):
    """Shared writer scaffolding for every envelope source (file spool,
    validator DataSource, future Kafka): one place for the apply/identity/
    trigger wiring so batch-application changes cannot land in one runner
    and silently miss the other (the auto_compact knob had already
    drifted that way — r9 review)."""
    resolve_qid, publish_qid = _stream_identity()

    def apply_batch(batch_df, batch_id: int):
        # transform_events materializes the decoded changes once (one decode
        # pass per microbatch); ScdParquetStore.apply is the transaction
        # boundary (W1) and is idempotent on (stream identity, batch_id)
        # replay — the stream identity is the engine's persistent query id.
        store.apply(
            transform_events(batch_df, materialize=True, n_buckets=store._n_buckets()),
            batch_id=batch_id,
            txn_app_id=resolve_qid(),
        )
        if auto_compact:
            store.maybe_compact()

    writer = reader.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    q = writer.start()
    publish_qid(q)
    return q


def run_validator_stream(
    spark: SparkSession,
    spool_dir: str,
    store: ScdParquetStore,
    checkpoint_dir: str,
    trigger_once: bool = True,
    processing_time: str = "1 second",
    auto_compact: bool = False,
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

    reader = (
        spark.readStream.format(vs.FORMAT_NAME)
        .option("path", spool_dir)
        .option("start_block", str(start_block))
        .load()
    )
    return _start_pipeline_stream(
        reader, store, checkpoint_dir, trigger_once, processing_time, auto_compact
    )


def stop_stream(query, timeout_sec: int = 60) -> None:
    """S4 graceful shutdown (subscriber.rs:121-151 / main.rs:67-71 analog):
    DRAIN the in-flight microbatch, then stop. ``StreamingQuery.stop()``
    interrupts the batch thread and cancels its jobs — the opposite of the
    reference's finish-the-block contract — so this polls the trigger
    status until the current batch completes (bounded by ``timeout_sec``;
    a continuously-busy stream is stopped at the deadline, where the
    store's atomic manifest commit + idempotent replay keep it safe).
    ``foreachBatch`` commits are atomic on the store manifest and the
    checkpoint survives, so the next run over the same checkpoint resumes
    exactly-once."""
    import time

    deadline = time.monotonic() + timeout_sec
    while (
        query.isActive
        and query.status.get("isTriggerActive")
        and time.monotonic() < deadline
    ):
        time.sleep(0.2)
    query.stop()
    query.awaitTermination(timeout_sec)
