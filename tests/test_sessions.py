"""Stateful sessionization (applyInPandasWithState): gap-close, idle
timeout via watermark, checkpointed state across runs."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from consensource_sds_spark.streaming.sessions import run_session_stream

SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("value", DoubleType(), False),
    ]
)

BASE = 1700000000


def _t(sec: int) -> datetime:
    return datetime.fromtimestamp(BASE + sec, tz=timezone.utc).replace(tzinfo=None)


def _us(sec: int) -> int:
    return (BASE + sec) * 1_000_000


def test_sessionize_gap_close_and_state_across_runs(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    def sessions():
        return sorted(
            (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"], r["total_value"])
            for r in spark.read.parquet(out).collect()
        )

    # run 1: user 1 has a burst at t=0..10; user 2 at t=5; nothing closes
    # yet (no gap crossed, watermark too low for idle timeout)
    spark.createDataFrame(
        [
            (1, _t(0), 1.0),
            (1, _t(10), 2.5),
            (2, _t(5), 4.0),
        ],
        SCHEMA,
    ).write.parquet(src)
    q = run_session_stream(spark, src, out, ckpt, SCHEMA, gap_sec=30)
    q.awaitTermination(120)
    assert sessions() == []

    # run 2 (same checkpoint, state restored): user 1 returns at t=100 —
    # the 90 s gap closes session [0,10] (3.5 total) and opens a new one;
    # the watermark jump also times out user 2's idle session [5,5]
    spark.createDataFrame([(1, _t(100), 9.0)], SCHEMA).write.mode("append").parquet(src)
    q2 = run_session_stream(spark, src, out, ckpt, SCHEMA, gap_sec=30)
    q2.awaitTermination(120)
    got = sessions()
    assert (1, _us(0), _us(10), 2, 3.5) in got
    assert (2, _us(5), _us(5), 1, 4.0) in got
    # user 1's new session at t=100 is still open (not emitted)
    assert all(not (u == 1 and s == _us(100)) for u, s, *_ in got)
