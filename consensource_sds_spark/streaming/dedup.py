"""Streaming deduplication and stream-stream joins.

The batch dedup family (x01/x03/x07: exact, MinHash-LSH, SimHash) answers
"is this a duplicate of anything in the corpus"; an *ingest* pipeline also
needs the streaming form — "is this a duplicate of something seen
recently" — with bounded state. Structured Streaming's native tools:

- ``dropDuplicatesWithinWatermark(keys)``: exact key dedup whose state
  expires with the event-time watermark, so a 100 TB/day firehose holds
  only the watermark horizon's keys (vs. ``dropDuplicates``, whose state
  grows forever on a stream);
- watermarked stream-stream interval joins: both sides buffer only rows
  newer than watermark - interval, the planner derives the state cleanup
  bound from the join's time-range predicate.

Both transforms are pure ``DataFrame -> DataFrame`` (the repo-wide
batch/stream parity rule), so the same code backfills in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_within_watermark(
    df: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "30 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """Keep the first arrival per key; forget keys once the watermark passes
    them. On a stream this is state-bounded exact dedup (at-least-once
    source -> effectively-once downstream). On a batch frame "first
    arrival" has no meaning, so the deterministic stand-in is the
    EARLIEST-``ts_col`` row per key (full-row tiebreak) — a plain
    ``dropDuplicates`` would keep an arbitrary, partition-order-dependent
    row, letting a backfill disagree with the stream on identical input."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
    rest = [c for c in df.columns if c not in keys and c != ts_col]
    order = F.struct(F.col(ts_col), *[F.col(c) for c in rest])
    return (
        df.groupBy(*keys)
        .agg(F.min_by(F.struct(*df.columns), order).alias("_r"))
        .select("_r.*")
    )


def attribute_within(
    clicks: DataFrame,
    views: DataFrame,
    within: str = "10 seconds",
    watermark: str = "30 seconds",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream attribution join: each click is matched to the same
    user's views landing in (click.ts, click.ts + within]. The time-range
    predicate is what lets the planner bound both join-state buffers by the
    watermark (an equi-only stream-stream join would buffer forever).

    ``how="leftOuter"`` additionally emits every unmatched click with NULL
    view columns — the conversion-funnel "no follow-up" signal. The engine
    can only declare a click unmatched once the watermark passes
    ``click.ts + within`` (its match window is provably closed), so outer
    rows trail the inner ones by the watermark delay; state stays
    watermark-bounded either way."""
    c = clicks.withWatermark("ts", watermark).alias("c")
    v = views.withWatermark("ts", watermark).alias("v")
    return c.join(
        v,
        F.expr(
            f"c.user_id = v.user_id AND v.ts > c.ts AND v.ts <= c.ts + INTERVAL {within}"
        ),
        how,
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("c.user_id").alias("user_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("v.ts").alias("view_ts"),
    )
