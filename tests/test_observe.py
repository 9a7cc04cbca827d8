"""Pipeline observability: df.observe() metrics ride the job (no second
scan) — the hook a production pipeline uses to emit row counts / null
rates / domain checks per stage without re-reading data."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from consensource_sds_spark.queries import load

SF = "/root/testdata/sf0.001"


def test_observe_metrics_ride_the_scan(spark):
    obs = Observation("intake")
    li = load(spark, SF, "lineitem")
    audited = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("n_bad_qty"),
        F.min("l_shipdate").alias("min_ship"),
    )
    out = audited.filter(F.col("l_discount") > 0.05).count()  # the real job
    m = obs.get
    assert m["n_rows"] == li.count()
    assert m["n_bad_qty"] == 0
    assert m["min_ship"] is not None
    assert 0 < out < m["n_rows"]
