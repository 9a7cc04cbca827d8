"""Event-time windowed aggregation with late-data watermarks.

The reference pipeline needs no watermarks — the validator serializes
blocks, so event time == arrival order (SURVEY §2.8). A general engine over
the same tables does need them: this module is the streaming analytics
surface for the ``events``-shaped stream (user activity / telemetry), built
the idiomatic Structured Streaming way:

- transformations are pure ``DataFrame -> DataFrame`` so identical code
  runs in batch (tests, backfill) and under ``readStream``;
- ``withWatermark`` bounds state: windows older than the watermark are
  finalized and their state dropped; late rows beyond it are discarded
  (exactly the pretraining-ingest contract: accept bounded disorder,
  never hold unbounded state);
- in append output mode a window is emitted exactly once, when the
  watermark passes its end — the downstream sink sees finalized,
  immutable window rows (the same append-only discipline as the SCD2
  store's closed partitions).

Scale: tumbling-window aggregation is a hash aggregate keyed on
(window, group) — partial aggregation map-side, one shuffle, state size =
open windows x groups, bounded by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from consensource_sds_spark.functions.money import cents_total


def windowed_event_stats(
    events: DataFrame,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time windows per event_type: count + value total.

    Works unchanged on a batch DataFrame (watermark is a no-op there) and a
    streaming one (bounds state / drops late rows)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            cents_total(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_windowed_stream(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
):
    """File-source shell for :func:`windowed_event_stats` into an
    append-mode parquet sink: each emitted row is a finalized, immutable
    window — the sink only ever grows, and checkpointed restarts resume
    exactly-once. Any replayable source drops in; the transform is
    source-agnostic."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_stats(stream, window=window, watermark=watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def topk_per_window(stats: DataFrame, k: int = 3) -> DataFrame:
    """Rank :func:`windowed_event_stats` output to the top-k event types
    per window (count desc, type asc ties). Pure batch transform."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        stats.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("window_start", "window_end", "event_type", "n_events", "rk")
    )


def run_trending_stream(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
):
    """Streaming "trending" feed — the stream maintains the windowed counts
    (update mode, watermark-bounded state) and each microbatch lands its
    UPDATED (window, event_type) count rows stamped with ``batch_id``,
    partitioned by batch_id with dynamic overwrite so a crash-replayed
    batch overwrites its own output instead of appending duplicates (the
    same idempotence-by-layout contract as the media/corpus ingest lanes).

    Ranking happens at READ time (:func:`latest_trending`), not in the
    sink: an update-mode microbatch carries only the rows it touched, so
    ranking inside foreachBatch would rank a window over the types updated
    that batch and silently drop a quieter type's earlier (larger) count
    from the snapshot. The sink stores counts; the reader resolves each
    (window, type) to its latest count, then ranks — always over the full
    set of types ever seen per window.

    Batch 0 truncates the sink: batch_id 0 only ever runs as the FIRST
    batch of a fresh (or rebuilt) checkpoint, so any partitions already in
    ``out_dir`` belong to a PREVIOUS run whose batch_ids restart from 0 —
    left in place, the old run's higher batch_ids would win every
    max-batch_id resolution and serve its stale counts forever. One
    partition accrues per microbatch; fold the tail with
    :func:`compact_trending` on whatever maintenance cadence the sink's
    file count warrants."""

    def emit(batch_df, batch_id: int):
        w = batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("overwrite")
        if batch_id > 0:  # own-partition overwrite: crash-replay idempotent
            w = w.option("partitionOverwriteMode", "dynamic")
        w.partitionBy("batch_id").parquet(out_dir)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_event_stats(stream, window=window, watermark=watermark)
    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(emit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def latest_trending(snapshots: DataFrame, k: int = 3) -> DataFrame:
    """Resolve :func:`run_trending_stream` output to the current top-k per
    window: latest count per (window, event_type) — max ``batch_id`` wins —
    then rank. Two window functions over count-of-updates-sized data."""
    return topk_per_window(latest_trending_counts(snapshots), k=k)


#: consolidated partition id for compacted trending snapshots — below
#: every real batch_id, so live batches always win max-batch_id
#: resolution against folded history (same convention as the corpus
#: index's consolidated segment).
COMPACTED_BATCH_ID = -1


def compact_trending(spark, out_dir: str, keep_batches: int = 8) -> bool:
    """Fold all but the newest ``keep_batches`` batch partitions of a
    :func:`run_trending_stream` sink into the ``batch_id=-1`` consolidated
    partition — the maintenance policy that bounds a long-lived stream's
    one-partition-per-microbatch growth (the trending analog of the corpus
    index's ``compact_indexes``).

    Crash-safe by the reader's own semantics, in the repo's
    consolidated-first order: the resolved-latest rows are written into
    the consolidated partition FIRST (dynamic overwrite of that partition
    only); a crash before the old partitions are removed leaves duplicates
    that ``latest_trending`` resolves identically (the surviving original
    carries the higher batch_id and the same count). Returns True when a
    fold ran."""
    import os
    import shutil

    if not os.path.isdir(out_dir):
        return False
    parts = sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(out_dir)
        if name.startswith("batch_id=")
        and int(name.split("=", 1)[1]) != COMPACTED_BATCH_ID
    )
    fold = parts[:-keep_batches] if keep_batches > 0 else parts
    if not fold:
        return False
    snaps = spark.read.parquet(out_dir)
    resolved = latest_trending_counts(
        snaps.filter(F.col("batch_id").isin(fold + [COMPACTED_BATCH_ID]))
    )
    (
        resolved.withColumn("batch_id", F.lit(COMPACTED_BATCH_ID))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(out_dir)
    )
    for b in fold:
        shutil.rmtree(os.path.join(out_dir, f"batch_id={b}"), ignore_errors=True)
    return True


def latest_trending_counts(snapshots: DataFrame) -> DataFrame:
    """The resolved latest count per (window, event_type) — the shared
    max-batch_id-wins rule, without the ranking stage (compaction folds
    counts, not ranks)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start", "event_type")
    return (
        snapshots.withColumn("_maxb", F.max("batch_id").over(w))
        .filter(F.col("batch_id") == F.col("_maxb"))
        .drop("_maxb", "batch_id")
    )
