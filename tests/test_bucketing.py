"""Bucketed co-located join: the shuffle-elimination strategy SCALE.md
promises for repeated big-big joins — written once bucketed by the join
key, every subsequent join on that key plans with NO Exchange on either
side (at 100 TB, the difference between re-shuffling the fact table per
query and never shuffling it)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = spark.range(1000).selectExpr("id AS o_orderkey", "id % 7 AS o_flag")
    lines = spark.range(3000).selectExpr(
        "id % 1000 AS l_orderkey", "id AS l_lineid", "id % 13 AS l_qty"
    )
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    (
        orders.write.mode("overwrite")
        .option("path", str(tmp_path / "bkt_orders"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bkt_orders")
    )
    (
        lines.write.mode("overwrite")
        .option("path", str(tmp_path / "bkt_lineitem"))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bkt_lineitem")
    )
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    # disable broadcast so the join strategy must be sort-merge — the
    # bucketed layout then satisfies both sides' distribution requirements
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.sql(
            f"""SELECT o_orderkey, COUNT(*) AS n, SUM(l_qty) AS q
                FROM {t1} JOIN {t2} ON o_orderkey = l_orderkey
                GROUP BY o_orderkey"""
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it computes the right thing
        rows = {r["o_orderkey"]: r["n"] for r in df.collect()}
        assert len(rows) == 1000 and all(v == 3 for v in rows.values())
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
