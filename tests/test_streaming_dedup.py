"""Streaming dedup (state-bounded) and stream-stream interval join."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql.types import LongType, StringType, StructField, StructType, TimestampType

from consensource_sds_spark.streaming.dedup import attribute_within, dedup_within_watermark

SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("ts", TimestampType(), False),
    ]
)


def _t(sec: int) -> datetime:
    return datetime.fromtimestamp(1700000000 + sec, tz=timezone.utc).replace(tzinfo=None)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_streaming_dedup_drops_repeats_within_watermark(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write(
        spark,
        src,
        [
            (1, 10, "click", _t(1)),
            (1, 10, "click", _t(2)),  # duplicate key within watermark
            (2, 10, "click", _t(3)),
            (2, 10, "click", _t(3)),  # exact duplicate row
            (3, 11, "view", _t(60)),  # advances the watermark
        ],
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        dedup_within_watermark(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]


def test_batch_parity_dedup(spark):
    df = spark.createDataFrame(
        [(1, 10, "click", _t(1)), (1, 10, "click", _t(2)), (2, 10, "view", _t(3))], SCHEMA
    )
    assert sorted(
        r["event_id"] for r in dedup_within_watermark(df).collect()
    ) == [1, 2]


def test_batch_dedup_keeps_earliest_deterministically(spark):
    """Regression: plain dropDuplicates keeps an arbitrary
    partition-order-dependent row; the batch path must keep the
    EARLIEST-ts row per key so a backfill is reproducible."""
    rows = [(7, 10, "resend", _t(30)), (7, 10, "original", _t(5)), (7, 10, "resend2", _t(60))]
    # spread the duplicates across partitions to surface order dependence
    df = spark.createDataFrame(rows, SCHEMA).repartition(8)
    out = dedup_within_watermark(df, keys=("event_id",)).collect()
    assert len(out) == 1
    assert out[0]["event_type"] == "original" and out[0]["ts"] == _t(5)


def test_stream_stream_attribution_join(spark, tmp_path):
    csrc, vsrc = str(tmp_path / "clicks"), str(tmp_path / "views")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write(
        spark,
        csrc,
        [(1, 10, "click", _t(0)), (2, 20, "click", _t(5)), (9, 10, "click", _t(100))],
    )
    _write(
        spark,
        vsrc,
        [
            (101, 10, "view", _t(4)),  # within 10s of click 1 -> match
            (102, 20, "view", _t(40)),  # 35s after click 2 -> no match
            (103, 30, "view", _t(6)),  # no click for user 30
            (104, 10, "view", _t(200)),  # advances both watermarks
        ],
    )
    clicks = spark.readStream.schema(SCHEMA).parquet(csrc)
    views = spark.readStream.schema(SCHEMA).parquet(vsrc)
    q = (
        attribute_within(clicks, views)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [(r["click_id"], r["view_id"]) for r in spark.read.parquet(out).collect()]
    assert got == [(1, 101)]


def test_batch_parity_attribution(spark):
    clicks = spark.createDataFrame([(1, 10, "click", _t(0))], SCHEMA)
    views = spark.createDataFrame(
        [(101, 10, "view", _t(4)), (102, 10, "view", _t(30))], SCHEMA
    )
    got = [(r["click_id"], r["view_id"]) for r in attribute_within(clicks, views).collect()]
    assert got == [(1, 101)]


def test_stream_stream_left_outer_attribution(spark, tmp_path):
    """Unmatched clicks surface with NULL view columns, but only after the
    watermark proves their match window closed (outer emission is
    watermark-gated — needs a later batch to advance the watermark)."""
    csrc, vsrc = str(tmp_path / "clicks"), str(tmp_path / "views")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write(spark, csrc, [(1, 10, "click", _t(0)), (2, 20, "click", _t(5))])
    _write(spark, vsrc, [(101, 10, "view", _t(4))])
    # second files: watermark advancers, forcing a later microbatch
    _write(spark, csrc, [(9, 99, "click", _t(300))])
    _write(spark, vsrc, [(109, 98, "view", _t(300))])
    clicks = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(csrc)
    )
    views = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(vsrc)
    q = (
        attribute_within(clicks, views, how="leftOuter")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r["click_id"], r["view_id"]) for r in spark.read.parquet(out).collect()}
    assert (1, 101) in got, got  # matched pair
    assert (2, None) in got, got  # window closed with no view -> outer row
