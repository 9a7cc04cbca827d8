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


def test_late_event_extends_session_start_or_forms_earlier_session(spark, tmp_path):
    """Regression: a late-but-within-watermark event OLDER than the stored
    session start must lower session_start_us (within gap) or close as its
    own earlier session (beyond gap) — folding only against last_ts
    silently absorbed it with the start left too high."""
    from consensource_sds_spark.streaming.sessions import sessionize

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            sessionize(stream, gap_sec=10, watermark="60 seconds")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: session [100,105]; watermark advances to 105-60=45
    spark.createDataFrame([(1, _t(100), 1.0), (1, _t(105), 1.0)], SCHEMA).coalesce(
        1
    ).write.parquet(src)
    run()
    # run 2: t=70 (>gap before start -> own earlier session), t=95 (within
    # gap of start -> extends it downward), t=300 (closes everything)
    spark.createDataFrame(
        [(1, _t(70), 1.0), (1, _t(95), 1.0), (1, _t(300), 1.0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    got = sorted(
        (r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    )
    assert (_us(70), _us(70), 1) in got
    assert (_us(95), _us(105), 3) in got


def test_gap_separated_sessions_wait_for_watermark_before_emitting(spark, tmp_path):
    """Regression (r9 review): two same-batch events more than ``gap``
    apart must NOT be emitted as closed sessions while the watermark
    still admits an event between them — a later batch's above-watermark
    event may legally bridge the gap, and an eagerly-emitted session
    would then overlap the merged one in the append sink."""
    from consensource_sds_spark.streaming.sessions import sessionize

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            sessionize(stream, gap_sec=30, watermark="30 seconds")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def sessions():
        return sorted(
            (r["session_start_us"], r["session_end_us"], r["n_events"], r["total_value"])
            for r in spark.read.parquet(out).collect()
        )

    # batch 1: t=0 and t=40 — 40 s apart (> gap) but the watermark only
    # reaches 10, so an event at t in [10, 30] could still bridge them
    spark.createDataFrame([(1, _t(0), 1.0), (1, _t(40), 1.0)], SCHEMA).coalesce(
        1
    ).write.parquet(src)
    run()
    assert sessions() == []
    # batch 2: the bridge arrives at t=20 (above the watermark) — ONE
    # session [0,40] forms; watermark still 10, nothing final yet
    spark.createDataFrame([(1, _t(20), 1.0)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    assert sessions() == []
    # batch 3: t=120 pushes the watermark to 90 > 40+30 — [0,40] is now
    # provably final and emits exactly once, with the bridged count
    spark.createDataFrame([(1, _t(120), 1.0)], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    assert sessions() == [(_us(0), _us(40), 3, 3.0)]


def test_cents_round_half_up_matches_sql_round(spark):
    """The stream's cents rounding must equal the q51 batch twin's SQL
    ``cast(round(value * 100) AS bigint)`` (HALF_UP over the double's
    shortest decimal repr) — Python's builtin ``round`` is banker's
    HALF_EVEN and diverges on exact halves (0.125 -> 12, SQL: 13).
    Differential pin over the half-cent / repr-edge values."""
    from pyspark.sql import functions as F

    from consensource_sds_spark.streaming.sessions import _cents

    assert _cents(0.125) == 13  # banker's would give 12
    assert _cents(0.105) == 11  # banker's would give 10
    vals = [0.125, 0.115, 0.105, 1.0, 2.675, 0.005, 123.455, 0.0, 7.77]
    got = spark.createDataFrame([(v,) for v in vals], "value double").select(
        "value", F.expr("cast(round(value * 100) AS bigint)").alias("c")
    ).collect()
    assert all(r["c"] == _cents(r["value"]) for r in got), [
        (r["value"], r["c"], _cents(r["value"])) for r in got
    ]


def test_state_version_sidecar_guards_incompatible_checkpoint(spark, tmp_path):
    """A checkpoint stamped by a different state layout fails at stream
    START with the drain-and-restart remedy (not mid-batch from an
    executor); a fresh checkpoint gets stamped with the current version."""
    import pytest

    from consensource_sds_spark.streaming.sessions import (
        _STATE_VERSION,
        _VERSION_SIDECAR,
        SessionStateVersionError,
        check_state_compat,
    )

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    spark.createDataFrame([(1, _t(0), 1.0)], SCHEMA).write.parquet(src)
    q = run_session_stream(spark, src, out, ckpt, SCHEMA, gap_sec=30)
    q.awaitTermination(120)
    sidecar = tmp_path / "ckpt" / _VERSION_SIDECAR
    assert sidecar.read_text() == str(_STATE_VERSION)

    # a checkpoint written by an older layout (stamp mismatch) is rejected
    # before the stream starts, with the remedy in the message
    sidecar.write_text("2")
    with pytest.raises(SessionStateVersionError, match="(?i)fresh checkpoint"):
        run_session_stream(spark, src, out, ckpt, SCHEMA, gap_sec=30)

    # an UNSTAMPED checkpoint that already has state files is pre-v3
    sidecar.unlink()
    with pytest.raises(SessionStateVersionError, match="unstamped"):
        check_state_compat(ckpt)


def test_spark_rejects_struct_changed_state_restore(spark, tmp_path):
    """Pin the RAW failure mode the runbook documents: restoring a
    checkpoint whose state was written with a different state STRUCT
    trips Spark's state-schema compatibility check and fails the query
    (loudly, not by corrupting state). This is why pre-v3 checkpoints
    need drain + fresh checkpoint; from v3 on, evolutions reuse the
    ``meta`` spare slots and never change the struct."""
    import pandas as pd
    import pytest

    from consensource_sds_spark.streaming.sessions import sessionize

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    # batch 1: leaves PENDING state (no gap crossed, watermark too low)
    spark.createDataFrame([(1, _t(0), 1.0), (1, _t(10), 1.0)], SCHEMA).write.parquet(src)
    q = run_session_stream(spark, src, out, ckpt, SCHEMA, gap_sec=30)
    q.awaitTermination(120)

    # restart against the same checkpoint with a DIFFERENT state struct
    # (the old 5-array layout, no meta) — Spark must reject the restore
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import ArrayType

    old_state = StructType(
        [
            StructField(n, ArrayType(LongType()), False)
            for n in ("starts_us", "ends_us", "n_events", "value_cents", "n_valued")
        ]
    )
    from consensource_sds_spark.streaming.sessions import SESSION_SCHEMA

    def fn(key, pdfs, state):
        for _ in pdfs:
            pass
        yield pd.DataFrame(columns=[f.name for f in SESSION_SCHEMA.fields])

    spark.createDataFrame([(1, _t(200), 1.0)], SCHEMA).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q2 = (
        stream.withWatermark("ts", "30 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=old_state,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception) as ei:
        q2.awaitTermination(120)
        if q2.exception() is not None:
            raise q2.exception()
    msg = str(ei.value).lower()
    assert "state" in msg and "schema" in msg, msg[:2000]
