"""Watermarked windowed aggregation: batch/stream parity, append-mode
finalization, and late-data dropping across checkpointed runs."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from consensource_sds_spark.streaming.windows import run_windowed_stream, windowed_event_stats

SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
        StructField("ts", TimestampType(), False),
    ]
)


def _t(sec: int) -> datetime:
    return datetime.fromtimestamp(1700000000 + sec, tz=timezone.utc).replace(tzinfo=None)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_batch_parity(spark):
    """The same transform runs on a batch frame (watermark no-op)."""
    df = _rows(
        spark,
        [
            (1, "click", 1.0, _t(1)),
            (2, "click", 2.0, _t(9)),
            (3, "view", 5.0, _t(12)),
        ],
    )
    out = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_stats(df).collect()
    }
    assert out[(_t(0), "click")] == (2, 3.0)
    assert out[(_t(10), "view")] == (1, 5.0)


def test_append_mode_emits_finalized_windows_and_drops_late(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    def sink_rows():
        return {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.read.parquet(out).collect()
        }

    # run 1: events up to t=100 -> watermark 70 -> windows ending <= 70 emit
    _rows(
        spark,
        [
            (1, "click", 1.0, _t(5)),
            (2, "click", 2.0, _t(8)),
            (3, "view", 3.0, _t(65)),
            (4, "click", 4.0, _t(100)),
        ],
    ).write.parquet(src)
    q = run_windowed_stream(spark, src, out, ckpt, SCHEMA)
    q.awaitTermination(120)
    run1 = sink_rows()
    assert run1 == {(_t(0), "click"): (2, 3.0), (_t(60), "view"): (1, 3.0)}

    # run 2 over the same checkpoint: one fresh event at t=110 (advances the
    # watermark) and one LATE event at t=6 — far beyond the 30 s watermark,
    # its window is already finalized, so it must be dropped, not re-emitted
    _rows(
        spark,
        [
            (5, "view", 9.0, _t(110)),
            (6, "click", 99.0, _t(6)),
        ],
    ).write.mode("append").parquet(src)
    q2 = run_windowed_stream(spark, src, out, ckpt, SCHEMA)
    q2.awaitTermination(120)
    emitted = sink_rows()
    new = {k: v for k, v in emitted.items() if k not in run1}
    # run1's finalized windows are immutable in the sink
    assert all(emitted[k] == v for k, v in run1.items())
    # the late click at t=6 appears nowhere (its 99.0 would change totals);
    # watermark is now 110-30=80 so [100,110) stays open (not emitted)
    assert emitted[(_t(0), "click")] == (2, 3.0)
    assert all(ws >= _t(70) for ws, _ in new)
    assert (_t(100), "click") not in emitted


def test_trending_topk_per_window(spark, tmp_path):
    from consensource_sds_spark.streaming.windows import latest_trending, run_trending_stream

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "outk"), str(tmp_path / "ckptk")
    rows = (
        [(i, "view", 1.0, _t(1)) for i in range(5)]
        + [(10 + i, "click", 1.0, _t(2)) for i in range(3)]
        + [(20 + i, "scroll", 1.0, _t(3)) for i in range(2)]
        + [(30, "buy", 1.0, _t(4))]
        + [(99, "view", 1.0, _t(120))]  # advances the watermark
    )
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    q = run_trending_stream(spark, src, out, ckpt, SCHEMA, window="10 seconds")
    q.awaitTermination(120)
    trending = latest_trending(spark.read.parquet(out), k=3)
    first_window = [
        (r["event_type"], r["n_events"], r["rk"])
        for r in trending.filter(F.col("window_start") == _t(0)).orderBy("rk").collect()
    ]
    assert first_window == [("view", 5, 1), ("click", 3, 2), ("scroll", 2, 3)]
    # k bound respected per window
    per_win = trending.groupBy("window_start").count().collect()
    assert all(r["count"] <= 3 for r in per_win)


def test_trending_update_batch_does_not_drop_untouched_types(spark, tmp_path):
    """Regression: an update-mode microbatch carries only the (window, type)
    rows it touched. Ranking the batch alone made a 1-event newcomer the
    window's #1 and dropped the established 100-event type from the latest
    snapshot; ranking at read time over latest-per-(window, type) must keep
    the true leader."""
    from consensource_sds_spark.streaming.windows import latest_trending, run_trending_stream

    src, out, ckpt = str(tmp_path / "src2"), str(tmp_path / "outk2"), str(tmp_path / "ckptk2")
    # run 1: window [0,10) gets view x5
    spark.createDataFrame(
        [(i, "view", 1.0, _t(1)) for i in range(5)], SCHEMA
    ).coalesce(1).write.parquet(src)
    q = run_trending_stream(spark, src, out, ckpt, SCHEMA, window="10 seconds")
    q.awaitTermination(120)
    # run 2 (same checkpoint): ONE click lands in the same window — the
    # microbatch updates only (window, click)
    spark.createDataFrame([(50, "click", 1.0, _t(2))], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = run_trending_stream(spark, src, out, ckpt, SCHEMA, window="10 seconds")
    q2.awaitTermination(120)
    got = [
        (r["event_type"], r["n_events"], r["rk"])
        for r in latest_trending(spark.read.parquet(out), k=3)
        .filter(F.col("window_start") == _t(0))
        .orderBy("rk")
        .collect()
    ]
    assert got == [("view", 5, 1), ("click", 1, 2)]


def test_trending_checkpoint_rebuild_truncates_stale_run(spark, tmp_path):
    """Regression (r9 review): a rebuilt checkpoint restarts batch_id at
    0; a previous run's partitions left in out_dir carry HIGHER batch_ids
    and would win every max-batch_id resolution — serving the old run's
    counts forever. Batch 0 of a fresh checkpoint must truncate the
    sink."""
    import shutil

    from consensource_sds_spark.streaming.windows import latest_trending, run_trending_stream

    src, out, ckpt = str(tmp_path / "src3"), str(tmp_path / "outk3"), str(tmp_path / "ckptk3")
    # run 1 over two microbatch-producing appends: view x5
    spark.createDataFrame(
        [(i, "view", 1.0, _t(1)) for i in range(5)], SCHEMA
    ).coalesce(1).write.parquet(src)
    q = run_trending_stream(spark, src, out, ckpt, SCHEMA, window="10 seconds")
    q.awaitTermination(120)
    spark.createDataFrame([(9, "view", 1.0, _t(2))], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = run_trending_stream(spark, src, out, ckpt, SCHEMA, window="10 seconds")
    q.awaitTermination(120)
    # operator reprocesses from scratch: checkpoint AND source replaced,
    # out_dir kept — the new world has click x2 only
    shutil.rmtree(ckpt)
    shutil.rmtree(src)
    spark.createDataFrame(
        [(50, "click", 1.0, _t(1)), (51, "click", 1.0, _t(2))], SCHEMA
    ).coalesce(1).write.parquet(src)
    q = run_trending_stream(spark, src, out, ckpt, SCHEMA, window="10 seconds")
    q.awaitTermination(120)
    got = [
        (r["event_type"], r["n_events"])
        for r in latest_trending(spark.read.parquet(out), k=3)
        .filter(F.col("window_start") == _t(0))
        .collect()
    ]
    # the old run's view counts are gone, not resurrected by stale batches
    assert got == [("click", 2)]


def test_compact_trending_folds_history_without_changing_reads(spark, tmp_path):
    """The trending sink's maintenance policy: folding all but the newest
    partitions into batch_id=-1 must leave latest_trending's answer
    bit-identical (the consolidated partition loses every max-batch_id
    tie to live batches by construction) while the partition count drops
    to keep + 1."""
    import os

    from consensource_sds_spark.streaming.windows import (
        compact_trending,
        latest_trending,
        run_trending_stream,
    )

    src, out, ckpt = str(tmp_path / "src4"), str(tmp_path / "outk4"), str(tmp_path / "ckptk4")
    batches = [
        [(i, "view", 1.0, _t(1)) for i in range(3)],
        [(10, "click", 1.0, _t(2))],
        [(11, "click", 1.0, _t(3))],
        [(12, "scroll", 1.0, _t(12))],
    ]
    for rows in batches:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)
        q = run_trending_stream(spark, src, out, ckpt, SCHEMA, window="10 seconds")
        q.awaitTermination(120)

    def snapshot():
        return sorted(
            (str(r["window_start"]), r["event_type"], r["n_events"], r["rk"])
            for r in latest_trending(spark.read.parquet(out), k=3).collect()
        )

    before = snapshot()
    assert compact_trending(spark, out, keep_batches=1) is True
    parts = [p for p in os.listdir(out) if p.startswith("batch_id=")]
    assert len(parts) == 2  # newest live batch + the consolidated partition
    assert "batch_id=-1" in parts
    assert snapshot() == before
    # under threshold: no-op
    assert compact_trending(spark, out, keep_batches=8) is False
