"""Mergeable HLL sketches: union-of-monthly must track exact yearly counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from consensource_sds_spark.queries import load
from consensource_sds_spark.queries.extensions import x50_hll_sketch_rollup

SF = "/root/testdata/sf0.001"


def test_sketch_union_matches_exact_within_2pct(spark):
    est = {r["oyear"]: r["est_customers"] for r in x50_hll_sketch_rollup(spark, SF).collect()}
    exact = {
        r["oyear"]: r["n"]
        for r in load(spark, SF, "orders")
        .groupBy(F.year("o_orderdate").alias("oyear"))
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact) and exact
    for y, n in exact.items():
        assert abs(est[y] - n) <= max(2, 0.02 * n), (y, est[y], n)
