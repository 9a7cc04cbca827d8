"""The general relational query surface (SURVEY §2.8 / §2.7).

The reference's downstream store serves current-state lookups, FK joins,
time-travel range predicates and search over the mirrored tables; our engine
must expose the full relational surface over the driver's TPC-H-ish star
schema. Each query maps to §2 operators (noted per function) and is
DuckDB-oracle checked.

Scale notes baked into the plans:
- dimension joins (region/nation/supplier) are broadcast — no shuffle of the
  fact side;
- filters precede joins/aggs so Catalyst pushes them into the parquet scan;
- window top-k uses rank-then-filter (single shuffle per partition key), not
  global sorts;
- aggregations are partial-agg friendly (plain hash aggs over column refs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from consensource_sds_spark.functions.money import cents_total, to_cents
from consensource_sds_spark.queries import (
    finite_embeddings_oracle,
    load,
    load_finite_embeddings,
    local_hint,
    register,
)

# Order-insensitive floating aggregates
# -------------------------------------
# SUM/AVG over doubles depends on partitioning (summation order), so a
# ROUND(SUM(..), 2) that lands near a half-cent boundary can hash-differ
# from the oracle run-to-run. Accumulating in DECIMAL is exact and
# order-free — and the FINAL rounding must also happen in DECIMAL:
# rounding the cast-back double instead diverges between engines when the
# exact sum lands on a half boundary (Spark rounds the double's shortest
# decimal repr, DuckDB the binary value — r9 review, verified live on a
# sum of exactly 74721.5250000000). The oracle-side twins:
#   sums: CAST(ROUND(SUM(CAST(x AS DECIMAL(30,10))), s) AS DOUBLE)
#   avgs: CAST(ROUND(CAST(<sum-as-double> / COUNT(*) AS DECIMAL(30,10)), s)
#         AS DOUBLE) — the division is IEEE-identical on both engines
#         given identical inputs, and the double->DECIMAL(30,10) cast
#         agrees across engines (verified on the half-boundary products),
#         so the HALF_UP round sees one value.
# (At 100 TB this is also the right engine choice: decimal partial
# aggregates are deterministic under any AQE re-partitioning.)


def dsum(c, scale: int = 2):
    c = F.col(c) if isinstance(c, str) else c
    return F.round(F.sum(c.cast("decimal(30,10)")), scale).cast("double")


def davg(c, scale: int = 4):
    c = F.col(c) if isinstance(c, str) else c
    q = F.sum(c.cast("decimal(30,10)")).cast("double") / F.count(F.lit(1))
    return F.round(q.cast("decimal(30,10)"), scale).cast("double")

# --------------------------------------------------------------------------
# Aggregation (A-family) + filter pushdown (F-family)
# --------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 2) AS DOUBLE)      AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))), 2) AS DOUBLE)
                                                                                  AS sum_disc_price,
           CAST(ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS DECIMAL(30,10)), 4) AS DOUBLE)      AS avg_qty,
           CAST(ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS DECIMAL(30,10)), 4) AS DOUBLE) AS avg_price,
           CAST(ROUND(CAST(CAST(SUM(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS DECIMAL(30,10)), 4) AS DOUBLE)      AS avg_disc,
           COUNT(*)                                                               AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan + pushed filter + hash agg (partial-agg friendly,
    decimal accumulation for order-insensitive float results)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q02_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_partkey,
           CAST(ROUND(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10)), 2) AS DOUBLE) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
      AND l_discount > 0.05 AND l_quantity < 10
    """,
)
def q02_filter_pushdown(spark, sf_dir):
    """F-family: conjunctive predicates + narrow projection, all pushed to
    scan. The per-row money rounding goes through DECIMAL on both sides:
    ROUND on the raw double diverges between engines for products landing
    on a half-cent (116 of 60k sf0.01 lineitem rows — r9 review; the old
    form passed only because the predicate happened to select none)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
        & (F.col("l_discount") > 0.05)
        & (F.col("l_quantity") < 10)
    ).select(
        "l_orderkey",
        "l_partkey",
        F.round(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,10)"), 2
        )
        .cast("double")
        .alias("net_price"),
    )


@register(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue,
           epoch_us(o_orderdate)                             AS odate_us,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> joins -> agg -> top-k.

    Join order: orders x customer FIRST (the BUILDING segment keeps ~1/5 of
    orders), so the fact-side join builds a hash relation over the reduced
    o x c result rather than all filtered orders. Neither customer nor the
    o x c result is a true dimension, so their broadcast hints are
    ``local_hint`` (latency profile only): in the cluster profile the plan
    carries NO static fact-sized broadcast — AQE sizes the build at runtime
    (small date range -> broadcast; big -> shuffle hash join on
    l_orderkey)."""
    # explicit narrow projections ahead of the joins: the broadcast exchange
    # materializes its subplan's output, and trimming before the hint is
    # worth ~20% on the build (measured) on top of Catalyst's own pruning
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    oc = o.join(local_hint(c), o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return (
        li.join(local_hint(oc), li["l_orderkey"] == oc["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("odate_us"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    oracle="""
    SELECT n_name, CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q05_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: star join with broadcast dims + local-supplier predicate."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    # one pre-joined build side (orders x customer, date-filtered) keeps the
    # fact table in a single map-side stage in the local profile; it is NOT
    # a dim, so the hint is profile-gated (cluster: AQE runtime sizing).
    # True dims (supplier/nation/region) broadcast unconditionally. Narrow
    # projections precede every join (the broadcast materializes its input).
    oc = o.join(local_hint(c), o["o_custkey"] == c["c_custkey"]).select("o_orderkey", "c_nationkey")
    return (
        li.join(local_hint(oc), li["l_orderkey"] == oc["o_orderkey"])
        .join(F.broadcast(s), (li["l_suppkey"] == s["s_suppkey"]) & (oc["c_nationkey"] == s["s_nationkey"]))
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q06_broadcast_dim_join",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_suppliers, CAST(ROUND(CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS DECIMAL(30,10)), 4) AS DOUBLE) AS avg_bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q06_broadcast_dim_join(spark, sf_dir):
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_suppliers"), davg("s_acctbal").alias("avg_bal"))
    )


@register(
    "q07_star_join_parts",
    oracle="""
    SELECT p_brand, COUNT(*) AS line_count,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS gross,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 15
    GROUP BY p_brand
    """,
)
def q07_star_join_parts(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("line_count"),
            dsum("l_extendedprice").alias("gross"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@register(
    "q10_window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q10_window_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer: rank-then-filter, one shuffle on o_custkey."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "q11_window_running_sum",
    oracle="""
    SELECT user_id, event_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10))) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) NULLS LAST, event_id
                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS running_value
    FROM events
    """,
)
def q11_window_running_sum(spark, sf_dir):
    """Frame aggregate: running per-user total over event time.

    ``value`` is exact 2-decimal money, so the exact-and-order-free
    accumulator is LONG CENTS (round(value*100)), not decimal(30,10):
    integer window sums are ~3x cheaper than 128-bit decimal and /100.0
    yields the same correctly-rounded double as the oracle's decimal->double
    cast. (For free-precision inputs the decimal form in ``dsum`` stays the
    right tool.)

    NULL-timestamp rows order EXPLICITLY last (both engines): Spark's
    ascending default is NULLS FIRST, DuckDB's is NULLS LAST — any window
    ordered by a nullable key must pin the choice or the frame contents
    silently differ (hostile-fixture finding)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc_nulls_last(), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cents = to_cents(F.col("value"))
    return e.select(
        "user_id",
        "event_id",
        F.round((F.sum(cents).over(w) / 100.0), 2).alias("running_value"),
    )


@register(
    "q12_window_lag_delta",
    oracle="""
    SELECT user_id, event_id,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) NULLS LAST, event_id), 2) + 0 AS delta
    FROM events
    """,
)
def q12_window_lag_delta(spark, sf_dir):
    """Lag delta per user over event time. NULL-timestamp rows order
    explicitly last on both engines (see q11's note). Oracle ROUND
    carries + 0 for -0.0 parity (q24's rule): a -0.0 value lagged by a
    +0.0 one yields an IEEE -0.0 delta that DuckDB's ROUND keeps."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts_us").asc_nulls_last(), "event_id")
    return e.select(
        "user_id", "event_id", F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta")
    )


@register(
    "q13_dense_rank_suppliers",
    oracle="""
    SELECT n_name, s_name, s_acctbal,
           DENSE_RANK() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC) AS bal_rank
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def q13_dense_rank_suppliers(spark, sf_dir):
    from pyspark.sql import Window

    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("s_acctbal").desc())
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("n_name", "s_name", "s_acctbal", F.dense_rank().over(w).alias("bal_rank"))
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube
# --------------------------------------------------------------------------


@register(
    "q15_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q15_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "q16_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q16_cube(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    )


@register(
    "q17_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q17_grouping_sets(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gs_lineitem")
    return spark_sql(
        li,
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
    )


def spark_sql(df, sql):
    return df.sparkSession.sql(sql)


# --------------------------------------------------------------------------
# Sort / limit / set operations / distinct
# --------------------------------------------------------------------------


@register(
    "q20_sort_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def q20_sort_topk(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject, no full sort."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy(F.col("o_totalprice").desc(), "o_orderkey").limit(25)


@register(
    "q21_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q21_distinct(spark, sf_dir):
    return load(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "q22_set_ops",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def q22_set_ops(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.intersect(o)


@register(
    "q23_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def q23_except(spark, sf_dir):
    """Set EXCEPT (bag-eliminating, not exceptAll): customers with no
    high-value order. The right side is filtered so the result is non-trivial
    on the test data — an empty EXCEPT proves nothing."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.subtract(o)


@register(
    "q24_union_all",
    oracle="""
    SELECT 'high' AS tier, c_custkey, ROUND(c_acctbal, 2) + 0 AS bal FROM customer WHERE c_acctbal >= 9000
    UNION ALL
    SELECT 'low'  AS tier, c_custkey, ROUND(c_acctbal, 2) + 0 AS bal FROM customer WHERE c_acctbal < 1000
    """,
)
def q24_union_all(spark, sf_dir):
    """Tiered union. Oracle ROUND carries + 0 to normalize IEEE -0.0
    (Spark's BigDecimal HALF_UP round has no signed zero, DuckDB keeps
    it)."""
    c = load(spark, sf_dir, "customer")
    hi = c.filter(F.col("c_acctbal") >= 9000).select(
        F.lit("high").alias("tier"), "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )
    lo = c.filter(F.col("c_acctbal") < 1000).select(
        F.lit("low").alias("tier"), "c_custkey", F.round("c_acctbal", 2).alias("bal")
    )
    return hi.unionAll(lo)


# --------------------------------------------------------------------------
# Semi/anti joins, subqueries
# --------------------------------------------------------------------------


@register(
    "q25_semi_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_active
    FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q25_semi_join(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_active"))
    )


@register(
    "q26_anti_join",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_inactive
    FROM customer WHERE NOT EXISTS
      (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    GROUP BY c_nationkey
    """,
)
def q26_anti_join(spark, sf_dir):
    """Anti join: customers with no high-value order, per nation. The order
    filter keeps the anti side selective enough that the result is
    non-empty on the test data (every customer has *some* order)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_inactive"))
    )


@register(
    "q27_left_join_nulls",
    oracle="""
    SELECT n_name, CAST(COUNT(c_custkey) AS BIGINT) AS n_customers
    FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
)
def q27_left_join_nulls(spark, sf_dir):
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    return (
        n.join(c, n["n_nationkey"] == c["c_nationkey"], "left")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@register(
    "q28_scalar_subquery",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_premium,
           CAST(ROUND(CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS DECIMAL(30,10)), 4) AS DOUBLE) AS avg_price
    FROM part
    WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) FROM part)
    GROUP BY p_brand
    """,
)
def q28_scalar_subquery(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    p.createOrReplaceTempView("sq_part")
    return spark_sql(
        p,
        """
        SELECT p_brand, COUNT(*) AS n_premium,
               CAST(ROUND(CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS DECIMAL(30,10)), 4) AS DOUBLE) AS avg_price
        FROM sq_part
        WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) FROM sq_part)
        GROUP BY p_brand
        """,
    )


@register(
    "q29_having",
    oracle="""
    SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS BIGINT)) > 2000
    """,
)
def q29_having(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 2000)
    )


# --------------------------------------------------------------------------
# Scalar function families (string / date / math / conditional)
# --------------------------------------------------------------------------


@register(
    "q30_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand)                                   AS brand_upper,
           SUBSTR(p_name, 1, 8)                             AS name_prefix,
           LENGTH(p_name)                                   AS name_len,
           CONCAT(COALESCE(p_brand, ''), ':', COALESCE(p_type, '')) AS brand_type,
           REPLACE(p_type, ' ', '_')                        AS type_snake,
           CAST(CONTAINS(p_name, 'red') AS BOOLEAN)         AS has_red
    FROM part WHERE p_partkey <= 500
    """,
)
def q30_string_funcs(spark, sf_dir):
    """String-function family. brand_type spells its NULL rule out with
    COALESCE on both engines: the two concat surfaces disagree silently
    otherwise — Spark's concat_ws drops the SEPARATOR next to a NULL
    ('Brand#1'), DuckDB's CONCAT skips only the NULL and keeps the colon
    ('Brand#1:') — so the contract is NULL-as-empty, separator always
    present (hostile-fixture finding)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    empty = F.lit("")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(
            F.coalesce(F.col("p_brand"), empty), F.lit(":"), F.coalesce(F.col("p_type"), empty)
        ).alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.col("p_name").contains("red").alias("has_red"),
    )


@register(
    "q31_date_funcs",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)  AS oyear,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS omonth,
           COUNT(*) AS n, CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS total
    FROM orders GROUP BY 1, 2
    """,
)
def q31_date_funcs(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("oyear"),
            F.month("o_orderdate").cast("long").alias("omonth"),
        )
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))
    )


@register(
    "q32_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(SQRT(l_extendedprice), 4)          AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 4)        AS price_ln,
           CAST(CEIL(l_discount * 100) AS BIGINT)   AS disc_pct_ceil,
           CAST(FLOOR(l_tax * 100) AS BIGINT)       AS tax_pct_floor,
           ABS(l_quantity - 25)                     AS qty_dev
    FROM lineitem WHERE l_orderkey <= 1000
    """,
)
def q32_math_funcs(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
    )


@register(
    "q33_case_when_enum",
    oracle="""
    SELECT CASE o_orderstatus WHEN 'O' THEN 'OPEN' WHEN 'F' THEN 'FULFILLED'
                              WHEN 'P' THEN 'PENDING' ELSE 'UNSET_STATUS' END AS status_name,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def q33_case_when_enum(spark, sf_dir):
    """P3 analog: total CASE WHEN enum decode."""
    o = load(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "O", "OPEN")
        .when(F.col("o_orderstatus") == "F", "FULFILLED")
        .when(F.col("o_orderstatus") == "P", "PENDING")
        .otherwise("UNSET_STATUS")
    )
    return o.groupBy(status.alias("status_name")).agg(F.count("*").alias("n"))


@register(
    "q34_nullif_coalesce",
    oracle="""
    SELECT doc_id,
           NULLIF(source, 'src0')                    AS source_or_null,
           COALESCE(NULLIF(source, 'src0'), 'none')  AS source_norm
    FROM documents WHERE doc_id < 200
    """,
)
def q34_nullif_coalesce(spark, sf_dir):
    """P4 analog: sentinel-to-NULL normalization + back-fill."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.nullif(F.col("source"), F.lit("src0")).alias("source_or_null"),
        F.coalesce(F.nullif(F.col("source"), F.lit("src0")), F.lit("none")).alias("source_norm"),
    )


# --------------------------------------------------------------------------
# Unnest / array ops (U-family), last-wins (A1), dispatch (A3), SCD2 shapes
# --------------------------------------------------------------------------


@register(
    "q40_explode_unnest",
    oracle=finite_embeddings_oracle("""
    SELECT label, COUNT(*) AS n_components, CAST(ROUND(CAST(CAST(SUM(CAST(CAST(comp AS DOUBLE) AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS DECIMAL(30,10)), 4) AS DOUBLE) AS avg_comp
    FROM (SELECT label, UNNEST(embedding) AS comp FROM embeddings)
    GROUP BY label
    """),
)
def q40_explode_unnest(spark, sf_dir):
    """U1/U2 analog over the driver's array column. Finite-vector
    admission rule applied: a NaN component would abort BOTH engines'
    DECIMAL-accumulated average (hostile-sweep finding), so poisoned
    vectors are excluded at the door like every other embeddings
    consumer.

    Components are float32 and promote to DOUBLE BEFORE the DECIMAL
    accumulation on both engines (seed-23 sweep finding): a direct
    float32->DECIMAL(30,10) cast fills decimal digits 8-10 differently
    per engine (Spark converts through the float's shortest string,
    DuckDB through its exact binary expansion — at float32 ulp they
    disagree), and an average landing on a scale-4 half boundary then
    rounds apart. Double ulp is far below 1e-10 at embedding
    magnitudes, so the double-first cast is identical on both."""
    e = load_finite_embeddings(spark, sf_dir)
    return (
        e.select("label", F.explode("embedding").alias("comp"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_components"),
            davg(F.col("comp").cast("double")).alias("avg_comp"),
        )
    )


@register(
    "q41_maxby_lastwins",
    oracle="""
    SELECT user_id,
           event_type AS last_type,
           -- + 0 normalizes IEEE -0.0 to 0.0: Spark's HALF_UP round goes
           -- through BigDecimal (no signed zero), DuckDB's ROUND keeps it
           ROUND(value, 2) + 0 AS last_value,
           event_id AS last_event_id
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
    """,
)
def q41_maxby_lastwins(spark, sf_dir):
    """A1 analog: last-wins per key via max_by over the arrival ordinal
    (the reference's Iterator::last at event_handler.rs:88).

    The oracle is a ROW pick (QUALIFY row_number), not ARG_MAX: last-wins
    takes the last row WHOLESALE, NULL fields included, while DuckDB's
    arg_max skips NULL value arguments and would answer "last non-NULL
    value" — a different operator (hostile-fixture finding). Spark's
    max_by carries the last row's NULL faithfully, matching the row
    pick."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.max_by("event_type", "event_id").alias("last_type"),
        F.round(F.max_by("value", "event_id"), 2).alias("last_value"),
        F.max("event_id").alias("last_event_id"),
    )


@register(
    "q42_type_dispatch",
    oracle="""
    SELECT SUBSTR(event_type, 1, 2) AS type_prefix,
           CASE WHEN event_type IN ('click','view') THEN 'engagement'
                WHEN event_type IN ('purchase','signup') THEN 'conversion'
                ELSE 'ops' END AS route,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q42_type_dispatch(spark, sf_dir):
    """A3 analog: prefix-based type dispatch into routed streams."""
    e = load(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type").isin("click", "view"), "engagement")
        .when(F.col("event_type").isin("purchase", "signup"), "conversion")
        .otherwise("ops")
    )
    return (
        e.groupBy(F.substring("event_type", 1, 2).alias("type_prefix"), route.alias("route"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "q43_scd2_versions",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) AS start_us,
           COALESCE(LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) NULLS LAST, event_id),
                    9223372036854775807) AS end_us,
           -- + 0: -0.0 -> 0.0, matching Spark's BigDecimal HALF_UP round
           ROUND(value, 2) + 0 AS value
    FROM events
    """,
)
def q43_scd2_versions(spark, sf_dir):
    """W2 analog, oracle-checkable: build SCD2 half-open version intervals
    from a changelog — each event's validity ends at the key's next event
    (close-then-insert as one window plan; sentinel = i64::MAX like
    MAX_BLOCK_NUM). NULL-timestamp rows order explicitly last on both
    engines (see q11's note)."""
    from pyspark.sql import Window

    from consensource_sds_spark.schemas import MAX_BLOCK_NUM

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts_us").asc_nulls_last(), "event_id")
    start = F.col("ts_us")
    return e.select(
        "user_id",
        "event_id",
        start.alias("start_us"),
        F.coalesce(F.lead(start).over(w), F.lit(MAX_BLOCK_NUM)).alias("end_us"),
        F.round("value", 2).alias("value"),
    )


@register(
    "q44_time_travel_asof",
    oracle="""
    SELECT user_id, event_type AS type_asof,
           CAST(ROUND(CAST(value AS DECIMAL(30,10)), 2) AS DOUBLE) AS value_asof
    FROM events WHERE epoch_us(ts) <= 1705276800000000
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
    """,
)
def q44_time_travel_asof(spark, sf_dir):
    """Time-travel read over the q43 version model: state as of a cutoff =
    latest version whose start <= cutoff (SURVEY §1.2). Cutoff constant =
    2024-01-15 UTC in epoch micros — INSIDE the fixture's event range
    (2024-01-01..2024-01-30), so the predicate actually excludes rows and
    the gate exercises the as-of semantics (the old 2024-03-01 cutoff
    filtered nothing and the check degenerated to plain last-wins —
    r9 review)."""
    e = load(spark, sf_dir, "events").filter(F.col("ts_us") <= 1705276800000000)
    return e.groupBy("user_id").agg(
        F.max_by("event_type", F.struct("ts_us", "event_id")).alias("type_asof"),
        F.round(F.max_by("value", F.struct("ts_us", "event_id")).cast("decimal(30,10)"), 2)
        .cast("double")
        .alias("value_asof"),
    )


@register(
    "q45_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)  AS n_suppliers,
           COUNT(DISTINCT l_partkey)  AS n_parts,
           COUNT(*)                   AS n_lines
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q45_distinct_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_lines"),
    )


@register(
    "q48_asof_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           c.event_id     AS click_id,
           epoch_us(c.ts) AS click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
      -- one click per (user, ts), max event_id: ASOF picks an ARBITRARY row
      -- among equal-ts matches, while the Spark plan's ascending last()
      -- deterministically carries the max event_id — collapse ties so both
      -- engines agree when two clicks share a timestamp
      SELECT user_id, ts, MAX(event_id) AS event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q48_asof_join(spark, sf_dir):
    """AS-OF join — for every purchase, the same user's most recent click
    at or before it. Spark has no asof-join operator; the scale-correct
    composition is the union-then-window plan: tag both streams, sort each
    user's rows once by (ts, kind), and carry the last click forward with
    last(ignorenulls) — ONE shuffle on user_id, no per-row probe join, no
    range explosion. (An inequality join would be O(clicks x purchases)
    per user; a backend with native asof, e.g. DuckDB here, is the
    oracle.) Ties (click exactly at purchase ts) match, clicks ordered
    before purchases at equal timestamps.

    NULL-key semantics follow the JOIN, not the window: a click with a
    NULL user_id or NULL ts can never satisfy ``p.user_id = c.user_id
    AND p.ts >= c.ts``, so such clicks are dropped BEFORE the union —
    the window plan would otherwise group NULL users together and carry
    a click no join would produce. NULL-ts purchases order explicitly
    FIRST (before every click) so they carry nothing, matching the
    never-true inequality (hostile-fixture finding)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    both = e.filter(
        is_purchase
        | (
            (F.col("event_type") == "click")
            & F.col("user_id").isNotNull()
            & F.col("ts_us").isNotNull()
        )
    ).select(
        "user_id",
        "ts_us",
        "event_id",
        is_purchase.cast("int").alias("kind"),  # clicks first on ties
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc_nulls_first(), "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_click = F.col("kind") == 0
    carried = both.select(
        "user_id",
        "ts_us",
        "event_id",
        "kind",
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True).over(w).alias("click_id"),
        F.last(F.when(is_click, F.col("ts_us")), ignorenulls=True).over(w).alias("click_ts_us"),
    )
    return carried.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        "click_id",
        "click_ts_us",
    )


@register(
    "q49_range_join",
    oracle="""
    SELECT a.event_id AS event_a, b.event_id AS event_b,
           epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
    FROM events a JOIN events b
      ON abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 1000000
     AND a.event_id < b.event_id
    """,
)
def q49_range_join(spark, sf_dir):
    """Range (interval) join with NO equi key — pairs of events within 1
    second of each other. A naive plan is a broadcast nested loop over
    n^2; the scale plan is BIN BANDING: bucket time into band-width bins,
    explode only the probe side into its bin and the two neighbors, and
    equi-join on the bin — every qualifying pair shares exactly one
    (probe_bin = build_bin) match, so no dedup pass is needed. Work drops
    to sum of bin^2 and the shuffle key is the bin (AQE handles hot
    bins). The oracle is the plain inequality join (DuckDB IEJoin)."""
    e = load(spark, sf_dir, "events").select("event_id", "ts_us")
    build = e.select(
        F.col("event_id").alias("event_b"),
        F.col("ts_us").alias("ts_b"),
        F.expr("ts_us div 1000000").alias("bin"),
    )
    probe = e.select(
        F.col("event_id").alias("event_a"),
        F.col("ts_us").alias("ts_a"),
        F.explode(F.expr("array(ts_us div 1000000 - 1, ts_us div 1000000, ts_us div 1000000 + 1)")).alias("bin"),
    )
    return (
        probe.join(build, "bin")
        .filter(
            (F.abs(F.col("ts_b") - F.col("ts_a")) <= 1_000_000)
            & (F.col("event_a") < F.col("event_b"))
        )
        .select("event_a", "event_b", (F.col("ts_b") - F.col("ts_a")).alias("dt_us"))
    )


@register(
    "q47_fulltext_search",
    oracle="""
    WITH inv AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok IN ('hash', 'join')
      GROUP BY doc_id, tok
    )
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS score
    FROM inv
    GROUP BY doc_id
    HAVING COUNT(DISTINCT tok) = 2
    ORDER BY score DESC, doc_id
    LIMIT 50
    """,
)
def q47_fulltext_search(spark, sf_dir):
    """§2.7 full-text search workload (the reference's downstream store pulls
    in diesel_full_text_search — Cargo.lock:214-220): inverted-index
    tokenize, AND-match over the query terms, rank by total term frequency.

    Plan: the term predicate lands inside the explode projection, so only
    matching postings survive the map side; one shuffle on doc_id does both
    the tf count and the AND check (count distinct terms == n_terms);
    top-50 is TakeOrderedAndProject, no global sort. At scale the postings
    build is the classic explode -> partial-agg inverted index."""
    terms = ["hash", "join"]
    d = load(spark, sf_dir, "documents")
    inv = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok").isin(terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    return (
        inv.groupBy("doc_id")
        .agg(F.sum("tf").alias("score"), F.countDistinct("tok").alias("nt"))
        .filter(F.col("nt") == len(terms))
        .select("doc_id", "score")
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(50)
    )


@register(
    "q50_array_map_funcs",
    oracle=finite_embeddings_oracle("""
    SELECT vec_id,
           len(embedding)                                        AS dim,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 4) + 0     AS comp_max,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 4) + 0     AS comp_min,
           ROUND(CAST(embedding[1] AS DOUBLE), 4) + 0            AS first_comp,
           ROUND(CAST(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))) AS DOUBLE), 4) + 0
                                                                 AS head_sum,
           len(list_filter(embedding, x -> x > 0))               AS n_positive
    FROM embeddings WHERE vec_id < 200
    """),
)
def q50_array_map_funcs(spark, sf_dir):
    """Array scalar-function family (§2.8): size / element_at / slice /
    array_max / higher-order filter+aggregate, all JVM-side. Finite-vector
    admission rule applied like every embeddings consumer (NaN would
    otherwise flow into comp_max/head_sum).

    Oracle ROUNDs carry the ``+ 0`` IEEE -0.0 normalization (the
    q24/q41/q43 rule): a stored -0.0 component — the hostile filler
    produces them at 4-decimal granularity (seed-23 sweep finding) —
    rounds to 0.0 through Spark's BigDecimal HALF_UP but keeps its sign
    in DuckDB, and the gate's stringified hash sees "-0.0" != "0.0"."""
    e = load_finite_embeddings(spark, sf_dir).filter(F.col("vec_id") < 200)
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("comp_max"),
        F.round(F.array_min("embedding").cast("double"), 4).alias("comp_min"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_comp"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 8), F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("head_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@register(
    "q51_sessionize_batch",
    oracle="""
    WITH marked AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), sessions AS (
      SELECT user_id, ts_us, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM marked
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0, 2) AS total_value
    FROM sessions GROUP BY user_id, session_idx
    """,
)
def q51_sessionize_batch(spark, sf_dir):
    """Gap-based sessionization, BATCH form (30-min inactivity gap): the
    classic lag -> gap-marker -> running-sum -> group plan. This is the
    backfill twin of streaming/sessions.py's applyInPandasWithState
    operator — same session semantics, expressed as two windows + one
    aggregation so historical corpus re-runs don't need streaming state.
    One shuffle on user_id serves both windows and the final group.

    NULL-timestamp events cannot be placed in a session (no position on
    the time axis) and are filtered on both engines — left in, each
    engine's opposite NULL-ordering default hands them to a different
    session (hostile-fixture finding)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").filter(F.col("ts_us").isNotNull())
    # event_id tiebreak on BOTH windows: with ts-only ordering, two events
    # of one user at the same timestamp make the running sum's row order —
    # and therefore their session assignment — engine/run dependent
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = e.select(
        "user_id",
        "ts_us",
        "event_id",
        "value",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000, 1).otherwise(0).alias("new_session"),
    )
    sessions = marked.withColumn("session_idx", F.sum("new_session").over(wrun).cast("long"))
    return sessions.groupBy("user_id", "session_idx").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        cents_total(F.col("value")).alias("total_value"),
    )


@register(
    "q46_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
    FROM events WHERE event_id < 1000
    """,
)
def q46_json_extract(spark, sf_dir):
    """Semi-structured: JSON path extraction from the props column."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k_value")
    )


@register(
    "q52_bm25_rank",
    oracle="""
    WITH sig AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS dl,
             len(list_filter(string_split(text, ' '), t -> t = 'hash'))   AS tf0,
             len(list_filter(string_split(text, ' '), t -> t = 'join'))   AS tf1,
             len(list_filter(string_split(text, ' '), t -> t = 'window')) AS tf2
      FROM documents),
    st AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, COUNT(*) AS n,
                  SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                  SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                  SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
           FROM sig)
    SELECT doc_id,
           ROUND(  ln((n - df0 + 0.5) / (df0 + 0.5) + 1) * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                 + ln((n - df1 + 0.5) / (df1 + 0.5) + 1) * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                 + ln((n - df2 + 0.5) / (df2 + 0.5) + 1) * tf2 * 2.2 / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS bm25
    FROM sig CROSS JOIN st
    WHERE tf0 + tf1 + tf2 > 0
    ORDER BY bm25 DESC, doc_id LIMIT 50
    """,
)
def q52_bm25_rank(spark, sf_dir):
    """BM25 ranked retrieval (k1=1.2, b=0.75) over the inverted index — the
    scoring step the §2.7 FTS workload implies beyond q47's boolean
    AND-match (Okapi BM25 is public textbook IR).

    Plan/scale: term postings survive the explode map-side (the IN filter
    lands inside the scan projection); df is a per-term count over the
    postings (3 rows, broadcast back); avgdl/N is a 1-row aggregate
    broadcast into the scoring join; one doc_id shuffle scores and sums;
    top-50 is TakeOrderedAndProject. avgdl is exact (integer sum / count)
    and the oracle mirrors the SAME fixed term-order fold (tf0+tf1+tf2),
    so summation order cannot split the engines (r9 review — the old
    per-term-row SUM accumulated in scan order). Residual risk, q73's
    documented class: the engines' ``ln`` may differ in the last ulp, so
    a score landing within ~1 ulp of a 0.00005 boundary could still round
    apart — accepted, same as q73."""
    # Small fixed query-term sets admit a SHUFFLE-FREE scoring plan: per-row
    # higher-order term counts (no explode, no postings shuffle), one 1-row
    # corpus-stats aggregate broadcast back, score as a pure projection,
    # top-50 via TakeOrderedAndProject. The inverted-index form (see q47)
    # is the variant for large/ad-hoc query sets.
    terms = ["hash", "join", "window"]
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.expr("split(text, ' ') AS toks"))
    tf_cols = [
        F.expr(f"size(filter(toks, t -> t = '{t}')) AS tf{i}") for i, t in enumerate(terms)
    ]
    sig = toks.select("doc_id", F.expr("size(toks) AS dl"), *tf_cols)
    stats = sig.agg(
        F.expr("CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl"),
        F.expr("count(*) AS n"),
        *[F.expr(f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}") for i in range(len(terms))],
    )
    contrib = " + ".join(
        f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1)"
        f" * tf{i} * 2.2d / (tf{i} + 1.2d * (0.25d + 0.75d * dl / avgdl))"
        for i in range(len(terms))
    )
    any_hit = " + ".join(f"tf{i}" for i in range(len(terms)))
    return (
        sig.crossJoin(F.broadcast(stats))
        .filter(F.expr(f"{any_hit} > 0"))
        .select("doc_id", F.expr(f"round({contrib}, 4) AS bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Correlated-subquery / decorrelation surface (TPC-H Q4/Q13/Q14/Q17/Q18/Q19
# shapes adapted to the driver schema — no partsupp/commitdate columns)
# --------------------------------------------------------------------------


@register(
    "q53_exists_correlated",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q53_exists_correlated(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS with a non-equi inner predicate
    (shipped >30 days after order), expressed as actual SQL EXISTS so the
    plan exercises Catalyst's decorrelation — the optimizer rewrites it to a
    left-semi hash join on l_orderkey with the date comparison as a join
    residual; the orders date filter is pushed to the scan."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("q53_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("q53_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM q53_orders o
        WHERE o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-07-01'
          AND EXISTS (SELECT 1 FROM q53_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q54_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q54_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: outer-join fan-out then a histogram of group sizes
    (customers by order count, zero-order customers included via the LEFT
    join's NULL-preserving COUNT(col)). Two hash aggs; the second runs over
    one row per customer — partial agg collapses both map-side."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q55_promo_share",
    oracle="""
    SELECT CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS ship_month,
           ROUND(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                           THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                           AS DECIMAL(30,10))) AS DOUBLE)
                       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(30,10))) AS DOUBLE), 4) AS promo_share
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY 1
    """,
)
def q55_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share per
    ship month). part is a broadcast dim; both sums accumulate in DECIMAL so
    the ratio is order-insensitive (see dsum); the date filter is pushed to
    the lineitem scan."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load(spark, sf_dir, "part")
    rev = F.expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))")
    promo = F.expr(
        "CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount)"
        " ELSE 0 END AS DECIMAL(30,10))"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.month("l_shipdate").cast("long").alias("ship_month"))
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 4
            ).alias("promo_share")
        )
    )


@register(
    "q56_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, epoch_us(o_orderdate) AS od_us,
           o_totalprice, total_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) big
      ON big.l_orderkey = o_orderkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q56_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: IN-subquery-over-aggregate rewritten as
    aggregate-then-join (the decorrelated plan TPC-H engines converge on).
    The HAVING filter shrinks the lineitem agg before it joins orders, so
    the join builds on ~per-mille of orders; top-100 is
    TakeOrderedAndProject. l_quantity values are integral doubles, so
    SUM is exact and cross-engine deterministic."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("od_us"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q57_small_qty_revenue",
    oracle="""
    SELECT p_brand,
           CAST(ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / 7.0 AS DECIMAL(30,10)), 2) AS DOUBLE)
             AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    GROUP BY p_brand
    """,
)
def q57_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar AVG subquery (small-quantity
    orders below 20% of the part's average), written as SQL so Catalyst
    decorrelates it into a per-part aggregate joined back on p_partkey.
    AVG over integral-double quantities is exact, so the threshold is
    cross-engine deterministic; revenue accumulates in DECIMAL."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("q57_lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("q57_part")
    return spark.sql(
        """
        SELECT p_brand,
               CAST(ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / 7.0 AS DECIMAL(30,10)), 2) AS DOUBLE)
                 AS avg_yearly
        FROM q57_lineitem JOIN q57_part ON p_partkey = l_partkey
        WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM q57_lineitem l2 WHERE l2.l_partkey = p_partkey)
        GROUP BY p_brand
        """
    )


@register(
    "q58_disjunctive_pred",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
    GROUP BY p_brand
    """,
)
def q58_disjunctive_pred(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive (brand, size, quantity)
    triples across both join sides. The brand disjunction's common subterms
    (p_brand IN ...) are implied per-branch, letting the scan prune part
    rows; the residual OR evaluates post-join inside codegen."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )
    )


@register(
    "q59_window_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           NTILE(4)       OVER w                   AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6)         AS pct_rank,
           ROUND(CUME_DIST()    OVER w, 6)         AS cume,
           FIRST_VALUE(l_linenumber) OVER w        AS top_line,
           LAST_VALUE(l_linenumber)  OVER
             (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS bottom_line,
           NTH_VALUE(l_linenumber, 2) OVER
             (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_line
    FROM lineitem WHERE l_orderkey <= 500
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber)
    """,
)
def q59_window_family(spark, sf_dir):
    """The remaining ranking/distribution window shapes (§2.8): ntile,
    percent_rank, cume_dist, first/last/nth value with explicit full-frame
    bounds. One shuffle on the partition key serves all seven functions
    (same window spec -> one Window physical operator); ordering ties are
    broken by l_linenumber so every value is deterministic."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    w = Window.partitionBy("l_orderkey").orderBy(F.col("l_extendedprice").desc(), "l_linenumber")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("l_linenumber").over(w).alias("top_line"),
        F.last("l_linenumber").over(wf).alias("bottom_line"),
        F.nth_value("l_linenumber", 2).over(wf).alias("second_line"),
    )


@register(
    "q60_pivot",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS oyear,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
    FROM orders GROUP BY 1
    """,
)
def q60_pivot(spark, sf_dir):
    """Pivot (long -> wide reshape): order counts by year x status. The
    explicit values list keeps the plan a single hash aggregate (no extra
    distinct-values job, the trap of unparameterized pivot at scale);
    empty cells coalesce to 0 to match the conditional-SUM oracle."""
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy(F.year("o_orderdate").cast("long").alias("oyear"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "oyear",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_fulfilled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_pending"),
    )


@register(
    "q65_multiset_ops",
    oracle="""
    SELECT 'except_all' AS op, l_partkey FROM (
      SELECT l_partkey FROM lineitem WHERE l_shipdate >= DATE '1997-01-01'
                                       AND l_shipdate <  DATE '1997-02-01'
      EXCEPT ALL
      SELECT l_partkey FROM lineitem WHERE l_shipdate >= DATE '1998-01-01'
                                       AND l_shipdate <  DATE '1998-02-01')
    UNION ALL
    SELECT 'intersect_all' AS op, l_partkey FROM (
      SELECT l_partkey FROM lineitem WHERE l_shipdate >= DATE '1997-01-01'
                                       AND l_shipdate <  DATE '1997-02-01'
      INTERSECT ALL
      SELECT l_partkey FROM lineitem WHERE l_shipdate >= DATE '1998-01-01'
                                       AND l_shipdate <  DATE '1998-02-01')
    """,
)
def q65_multiset_ops(spark, sf_dir):
    """Multiset set operations (EXCEPT ALL / INTERSECT ALL — q22/q23 cover
    the DISTINCT forms): multiplicity-preserving bag semantics, which Spark
    plans as a counted hash aggregate + generate rather than a distinct —
    the form dedup accounting actually needs (how many copies survive)."""
    li = load(spark, sf_dir, "lineitem")
    jan97 = li.filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    ).select("l_partkey")
    jan98 = li.filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-02-01")
    ).select("l_partkey")
    ex = jan97.exceptAll(jan98).select(F.lit("except_all").alias("op"), "l_partkey")
    inter = jan97.intersectAll(jan98).select(F.lit("intersect_all").alias("op"), "l_partkey")
    return ex.unionByName(inter)


@register(
    "q66_string_agg",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
           len(list_distinct(list(o_custkey)))                                 AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def q66_string_agg(spark, sf_dir):
    """Collection aggregates (§2.8): collect_set + sort + string join, made
    deterministic by sorting before concatenation (bare collect_list order
    is partition-dependent — never hash a raw one). The distinct-set
    accumulators are partial-agg mergeable, so this scales like any hash
    agg as long as per-group distinct cardinality is bounded."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("concat_ws(',', array_sort(collect_set(o_orderstatus))) AS statuses"),
        F.expr("size(collect_set(o_custkey)) AS n_customers"),
    )


@register(
    "q64_posexplode_ordinality",
    oracle="""
    SELECT doc_id, string_split(text, ' ')[i] AS tok, CAST(i AS BIGINT) AS ord
    FROM documents, LATERAL (SELECT UNNEST(range(1, 6)) AS i)
    WHERE i <= len(string_split(text, ' '))
    """,
)
def q64_posexplode_ordinality(spark, sf_dir):
    """Ordinality-preserving unnest (U1's posexplode, §2.4: the reference
    relies on Vec order, a DataFrame must carry the ordinal explicitly):
    each document's first five tokens with their 1-based position. Pure
    map-side generate — no shuffle."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.expr("slice(split(text, ' '), 1, 5)")).alias("pos", "tok")
    ).select("doc_id", "tok", (F.col("pos") + 1).cast("long").alias("ord"))


@register(
    "q63_stat_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(median(l_quantity), 4)                       AS med_qty,
           ROUND(quantile_cont(l_quantity, 0.25), 4)          AS q1_qty,
           quantile_disc(l_quantity, 0.9)                     AS p90_disc,
           ROUND(stddev_samp(l_quantity), 4)                  AS sd_qty,
           CAST(ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS DECIMAL(30,10)), 4) AS DOUBLE)                               AS mean_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q63_stat_aggs(spark, sf_dir):
    """Statistical aggregate family (§2.8): median / interpolated +
    discrete percentiles / sample stddev / exact mean. Quantities are
    integral doubles, so sums of squares are exact and stddev is
    cross-engine deterministic at 4 decimals; the mean accumulates in
    DECIMAL (dsum rule). Exact percentiles shuffle group values — the
    approx_percentile sketch (x30/x31 note) is the 100 TB swap."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("median(l_quantity)"), 4).alias("med_qty"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q1_qty"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").alias("p90_disc"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        davg("l_quantity").alias("mean_qty"),
        F.count("*").alias("n"),
    )


@register(
    "q61_hopping_windows",
    oracle="""
    WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events),
    f AS (SELECT event_type, us,
                 ((us - ((us % 300000000 + 300000000) % 300000000)) // 300000000) AS fd
          FROM e),
    s AS (SELECT event_type, us,
                 UNNEST([fd * 300000000, (fd - 1) * 300000000]) AS ws
          FROM f)
    SELECT ws AS window_start_us, ws + 600000000 AS window_end_us, event_type,
           COUNT(*) AS n_events
    FROM s WHERE us >= ws AND us < ws + 600000000
    GROUP BY 1, 2, 3
    """,
)
def q61_hopping_windows(spark, sf_dir):
    """Hopping (sliding) event-time windows in batch: 10-minute windows
    every 5 minutes per event_type — the backfill twin of the streaming
    windowed aggregation (streaming/windows.py), same ``F.window`` call.
    Each event lands in width/slide = 2 windows; Spark expands them
    map-side (no self-join), then one (window, type) hash agg. Epoch-µs
    projection keeps the hash timezone-proof. The oracle's slide index is
    a FLOOR division (the q62/q90 pmod idiom): DuckDB's ``//`` truncates
    toward zero, which diverges from ``F.window``'s floor alignment for
    pre-1970 (negative-µs) events (r9 review; latent on this fixture,
    pinned by the crafted-negative differential below)."""
    e = load(spark, sf_dir, "events")
    win = F.window(F.timestamp_micros(F.col("ts_us")), "10 minutes", "5 minutes")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            F.unix_micros("w.end").alias("window_end_us"),
            "event_type",
            "n_events",
        )
    )


@register(
    "q62_gap_fill",
    oracle="""
    WITH e AS (SELECT ((epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000) AS dnum, event_type FROM events),
    b AS (SELECT MIN(dnum) AS lo, MAX(dnum) AS hi FROM e),
    days AS (SELECT UNNEST(range(lo, hi + 1)) AS dnum FROM b),
    types AS (SELECT DISTINCT event_type FROM e),
    grid AS (SELECT dnum, event_type FROM days, types),
    c AS (SELECT dnum, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2)
    SELECT g.dnum * 86400000000 AS day_start_us, g.event_type,
           COALESCE(n, 0) AS n_events
    FROM grid g LEFT JOIN c ON g.dnum = c.dnum AND g.event_type = c.event_type
    """,
)
def q62_gap_fill(spark, sf_dir):
    """Date-series gap fill: daily event counts per type with zero rows for
    silent days (the time-series densification every monitoring/trend query
    needs; SQL engines use generate_series, Spark uses sequence+explode).

    Plan/scale: the day spine is sequence() over the 1-row min/max
    aggregate — rows = span x types, generated, never scanned; the
    aggregated per-(day, type) counts (bounded by the same span x types,
    tiny) are broadcast back onto the spine. The hint must sit on the
    counts side: a LEFT OUTER BroadcastHashJoin can only build its RIGHT
    side, so hinting the preserved spine is silently ignored and both
    sides would shuffle. The fact table shuffles once for its own
    aggregation and never again."""
    e = load(spark, sf_dir, "events").select(
        F.expr("(ts_us - pmod(ts_us, 86400000000)) div 86400000000 AS dnum"), "event_type"
    )
    days = e.agg(F.min("dnum").alias("lo"), F.max("dnum").alias("hi")).select(
        F.explode(F.expr("sequence(lo, hi)")).alias("dnum")
    )
    types = e.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    counts = e.groupBy("dnum", "event_type").agg(F.count("*").alias("n"))
    return (
        grid.join(F.broadcast(counts), ["dnum", "event_type"], "left")
        .select(
            F.expr("dnum * 86400000000 AS day_start_us"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
    )


@register(
    "q67_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity >= 30)                          AS n_bulk,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10)))
                 FILTER (WHERE l_quantity >= 30) AS DOUBLE), 2)              AS rev_bulk,
           COUNT(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1998-01-01')      AS n_recent,
           COUNT(*) FILTER (WHERE l_discount > 0.05)                         AS n_discounted,
           COUNT(*)                                                          AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q67_conditional_agg(spark, sf_dir):
    """Conditional (FILTER-clause) aggregates: several differently-filtered
    aggregates computed in ONE pass over the fact table — the idiomatic
    replacement for N self-joining subqueries. Spark expresses FILTER as
    when()-guarded aggregates; all partial-agg friendly (one shuffle on the
    group key, conditions evaluated map-side inside codegen)."""
    li = load(spark, sf_dir, "lineitem")
    bulk = F.col("l_quantity") >= 30
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(bulk, 1)).alias("n_bulk"),
        F.round(
            F.sum(
                F.when(bulk, (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,10)"))
            ).cast("double"),
            2,
        ).alias("rev_bulk"),
        F.count(
            F.when(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"), 1)
        ).alias("n_recent"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.count("*").alias("n"),
    )


@register(
    "q68_lateral_topn",
    oracle="""
    -- + 0: -0.0 -> 0.0, matching Spark's BigDecimal HALF_UP round
    SELECT n_name, s_name, ROUND(s_acctbal, 2) + 0 AS acctbal
    FROM nation, LATERAL (
      SELECT s_name, s_acctbal
      FROM supplier
      WHERE s_nationkey = n_nationkey
      ORDER BY s_acctbal DESC, s_name
      LIMIT 2)
    """,
)
def q68_lateral_topn(spark, sf_dir):
    """LATERAL correlated subquery: per-nation top-2 suppliers by balance.
    The lateral formulation is the API surface under test (Spark supports
    LATERAL joins with correlated LIMIT subqueries); Catalyst rewrites it
    into the same rank-then-filter window plan as q10 — one shuffle on the
    correlation key, no nested-loop per outer row. Oracle ROUND carries
    + 0 for -0.0 parity (q24's rule)."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("q68_nation")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("q68_supplier")
    return spark.sql(
        """
        SELECT n_name, s_name, ROUND(s_acctbal, 2) AS acctbal
        FROM q68_nation JOIN LATERAL (
          SELECT s_name, s_acctbal
          FROM q68_supplier
          WHERE s_nationkey = n_nationkey
          ORDER BY s_acctbal DESC, s_name
          LIMIT 2)
        """
    )


@register(
    "q69_histogram",
    oracle="""
    SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9) AS BIGINT) AS bucket,
           COUNT(*)                                                AS n_orders,
           ROUND(MIN(o_totalprice), 2)                             AS lo_price,
           ROUND(MAX(o_totalprice), 2)                             AS hi_price
    FROM orders
    GROUP BY bucket
    """,
)
def q69_histogram(spark, sf_dir):
    """Fixed-width histogram bucketing (width_bucket semantics, spelled as
    explicit arithmetic so both engines evaluate the identical IEEE
    expression): bucket = min(floor(price/50k), 9), then count + bounds per
    bucket. One map-side projection + one 10-group hash agg — the profile
    shape for any numeric-distribution audit at 100 TB."""
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bucket", F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(9)).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo_price"),
            F.round(F.max("o_totalprice"), 2).alias("hi_price"),
        )
    )


@register(
    "q70_bool_bit_aggs",
    oracle="""
    SELECT l_linestatus,
           bool_and(l_quantity < 50)            AS all_small,
           bool_or(l_discount > 0.09)           AS any_deep_discount,
           CAST(bit_and(l_orderkey) AS BIGINT)  AS key_and,
           CAST(bit_or(l_partkey) AS BIGINT)    AS part_or,
           CAST(bit_xor(l_suppkey) AS BIGINT)   AS supp_xor,
           COUNT(*)                             AS n
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q70_bool_bit_aggs(spark, sf_dir):
    """Boolean and bitwise aggregate family (EVERY/ANY + BIT_AND/OR/XOR):
    order-insensitive, partial-agg-perfect aggregates (AND/OR/XOR are
    associative+commutative, so map-side combine loses nothing) — also the
    building block for bitmap-style audits (xor-fold checksums)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.bool_and(F.col("l_quantity") < 50).alias("all_small"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.bit_and("l_orderkey").alias("key_and"),
        F.bit_or("l_partkey").alias("part_or"),
        F.bit_xor("l_suppkey").alias("supp_xor"),
        F.count("*").alias("n"),
    )


@register(
    "q71_range_frame",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           COUNT(*) OVER w AS n_5min,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,10))) OVER w AS DOUBLE), 2)
             AS val_5min
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
    """,
)
def q71_range_frame(spark, sf_dir):
    """RANGE-frame window: per-user trailing 5-minute event count and value
    sum — the value-based frame (all rows within an interval of the current
    row's timestamp, peers included) that ROWS frames can't express; the
    rate-limit / rolling-exposure shape. Epoch-µs numeric ordering keeps the
    frame arithmetic integer and timezone-proof; the sum accumulates in
    DECIMAL (dsum rule) so frame summation order can't flip the rounded
    double. One shuffle on user_id serves both aggregates."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-300_000_000, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_5min"),
        F.round(
            F.sum(F.col("value").cast("decimal(30,10)")).over(w).cast("double"), 2
        ).alias("val_5min"),
    )


@register(
    "q72_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT)  AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT)  AS g_status,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
                                                   AS gid,
           COUNT(*)                                AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q72_grouping_id(spark, sf_dir):
    """GROUPING()/GROUPING_ID() over a rollup: the indicator columns that
    let a consumer tell a subtotal row's NULL from a data NULL (without
    them, rollup output is ambiguous the moment a grouping column is
    nullable). Spark's grouping_id() bit order matches the grouping-list
    order, recomputed here as grouping()*2+grouping() so both engines
    state the same arithmetic. Same single-pass expand+agg plan as q15."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("long")
            .alias("gid"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "gid", "n")
    )


@register(
    "q73_regression_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) + 0     AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) + 0 AS icept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)            AS r2,
           ROUND(corr(l_extendedprice, l_quantity), 6) + 0           AS pearson,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q73_regression_aggs(spark, sf_dir):
    """Linear-regression aggregate family (REGR_SLOPE/INTERCEPT/R2 + CORR):
    price-vs-quantity fit per return flag, one pass, no self-join — the
    SQL-standard bivariate statistics every profiling layer leans on.
    Partial-agg friendly (the regr_* family reduces to co-moment sums, so
    map-side combine holds); results rounded (co-moment accumulation order
    differs across engines in the last ULPs)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("icept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("pearson"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


@register(
    "q74_fuzzy_join",
    oracle="""
    SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 12
    """,
)
def q74_fuzzy_join(spark, sf_dir):
    """Edit-distance fuzzy matching with a blocked join: candidate pairs
    are generated only within (brand, size) blocks — the classic
    entity-resolution blocking step — then scored with levenshtein. Scale:
    the join shuffles on the block key, never name x name; O(len^2)
    levenshtein runs only on block-mates. Tighter blocking (sorted
    neighborhood, q-gram prefilter — x04's pattern) is the lever if blocks
    skew."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand", "p_size")
    a = p.select(
        F.col("p_partkey").alias("pk_a"), F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand"), F.col("p_size").alias("size"),
    )
    b = p.select(
        F.col("p_partkey").alias("pk_b"), F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand"), F.col("p_size").alias("size"),
    )
    return (
        a.join(b, ["brand", "size"])
        .filter(F.col("pk_a") < F.col("pk_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_dist") <= 12)
        .select("pk_a", "pk_b", "name_a", "name_b", "edit_dist")
    )


@register(
    "q75_unpivot",
    oracle="""
    WITH wide AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS oyear,
             CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
             CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
      FROM orders GROUP BY 1)
    SELECT oyear, status, n FROM (
      SELECT oyear, 'n_open' AS status, n_open AS n FROM wide
      UNION ALL SELECT oyear, 'n_fulfilled', n_fulfilled FROM wide
      UNION ALL SELECT oyear, 'n_pending', n_pending FROM wide)
    """,
)
def q75_unpivot(spark, sf_dir):
    """UNPIVOT (wide -> long reshaping, the inverse of q60's pivot) via the
    DataFrame ``unpivot`` API — melts the per-status count columns into
    (year, status, n) rows. Map-side only after the q60-shaped aggregate
    (unpivot is a generate, no shuffle of its own); the oracle states the
    same reshape as the portable UNION ALL form."""
    o = load(spark, sf_dir, "orders")
    wide = o.groupBy(F.year("o_orderdate").cast("long").alias("oyear")).agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_fulfilled"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_pending"),
    )
    return wide.unpivot(
        ids=["oyear"],
        values=["n_open", "n_fulfilled", "n_pending"],
        variableColumnName="status",
        valueColumnName="n",
    )


@register(
    "q76_map_funcs",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events WHERE event_type IS NOT NULL
      GROUP BY user_id, event_type)
    SELECT user_id,
           COUNT(*)                                             AS n_types,
           MAX(CASE WHEN event_type = 'click' THEN n END)       AS n_clicks,
           MIN(event_type)                                      AS first_type,
           CAST(SUM(n) AS BIGINT)                               AS total_events
    FROM counts GROUP BY user_id
    """,
)
def q76_map_funcs(spark, sf_dir):
    """Map scalar-function family (the q50 twin for map columns): per-user
    event-type histograms are materialized as a MAP column
    (map_from_entries over sort-stabilized collected entries), then
    consumed with size / element_at / map_keys / map_values + a
    higher-order fold. Maps don't hash portably across engines, so the
    gate compares the SCALAR projections; the oracle states the same
    values relationally. Scale: the map per user is bounded by the
    event-type cardinality (small by design — maps are for bounded keys;
    unbounded keys stay as rows).

    The histogram covers TYPED events: a NULL event_type cannot be a map
    key (Spark raises NULL_MAP_KEY, rightly), so untyped rows are
    filtered on both engines instead of aborting the job
    (hostile-fixture finding)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    return m.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.element_at("m", "click").alias("n_clicks"),
        F.element_at(F.map_keys("m"), 1).alias("first_type"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_events"),
    )


@register(
    "q77_session_window_fn",
    oracle="""
    WITH marked AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), sessions AS (
      SELECT user_id, ts_us,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM marked)
    SELECT user_id,
           MIN(ts_us)              AS session_start_us,
           MAX(ts_us) + 1800000000 AS session_end_us,
           COUNT(*)                AS n_events
    FROM sessions GROUP BY user_id, session_idx
    """,
)
def q77_session_window_fn(spark, sf_dir):
    """Native ``session_window`` aggregation (the built-in q51): Spark's
    dynamic-gap session operator merges events closer than the gap and
    stamps [first_event, last_event + gap) bounds — note the half-open
    boundary (a gap of EXACTLY 30 min starts a new session), which the
    lag-cumsum oracle mirrors with >=. Same one-shuffle-on-user plan as
    q51; this form is also directly streamable (session_window works on
    streams with a watermark, merging state server-side). NULL-timestamp
    events filter on both engines (q51's rule)."""
    e = load(spark, sf_dir, "events").filter(F.col("ts_us").isNotNull())
    return (
        e.groupBy(
            F.session_window(F.timestamp_micros(F.col("ts_us")), "30 minutes").alias("w"),
            "user_id",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )


@register(
    "q78_dormant_accounts",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_cust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,10))), 2) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(ROUND(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS DECIMAL(30,10)), 4) AS DOUBLE)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    GROUP BY c_nationkey
    """,
)
def q78_dormant_accounts(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no qualifying
    activity (no large order), per nation — the scalar-subquery +
    correlated NOT EXISTS combination. Catalyst decorrelates the EXISTS
    into a LEFT ANTI join on c_custkey (the orders side pre-filtered on
    totalprice BEFORE the join, so the anti probe is small) and the AVG
    into a 1-row broadcast — no per-row subquery execution anywhere. The
    threshold average is computed in DECIMAL and rounded before the
    comparison (q99's rule): a raw double AVG is partition-order
    dependent in the last ULPs, and a boundary customer could flip sides
    between engines or between AQE re-plans (r9 review)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal").alias("ab"))
    big_orders = o.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@register(
    "q79_forward_fill",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           ROUND(LAST_VALUE(CASE WHEN value >= 10 THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY epoch_us(ts) NULLS LAST, event_id
                       ROWS UNBOUNDED PRECEDING), 2) AS filled_value
    FROM events
    """,
)
def q79_forward_fill(spark, sf_dir):
    """Forward fill / LOCF (last observation carried forward): low readings
    are nulled as sensor dropouts, then each row carries the most recent
    valid value — ``last(..., ignorenulls)`` over a running frame, the
    IGNORE NULLS window surface (and the standard time-series repair
    before any resampling/join). Rows before a user's first valid reading
    stay NULL (no peeking forward). One shuffle on user_id; at scale this
    is the same plan as the q11/q27 running windows. NULL-timestamp rows
    order explicitly last on both engines (see q11's note)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc_nulls_last(), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.when(F.col("value") >= 10, F.col("value"))
    return e.select(
        "user_id",
        "event_id",
        "ts_us",
        F.round(F.last(v, ignorenulls=True).over(w), 2).alias("filled_value"),
    )


@register(
    "q80_recursive_bands",
    oracle="""
    WITH RECURSIVE bands(lvl, lo) AS (
      SELECT 0, CAST(1000 AS DOUBLE)
      UNION ALL
      SELECT lvl + 1, lo * 2 FROM bands WHERE lo * 2 <= 1000000
    )
    SELECT lvl, lo AS band_lo,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS band_revenue
    FROM bands LEFT JOIN orders
      ON o_totalprice >= lo AND o_totalprice < lo * 2
    GROUP BY lvl, lo
    """,
)
def q80_recursive_bands(spark, sf_dir):
    """Recursive CTE (Spark 4's WITH RECURSIVE, the iterative-fixpoint
    surface §2.8 previously lacked): grow doubling price bands from 1000
    until the TPC-H totalprice ceiling (recursion DEPTH is data-independent
    ~10 levels — o_totalprice is bounded by spec regardless of SF, so the
    anchor/step never needs a data-dependent scalar in the stop condition),
    then band every order by a range join against the ~10-row recursion
    product (broadcast; the one intended nested-loop join).

    Scale: the recursion itself is O(levels) driver-cheap iterations over
    a one-row relation; the banding is a broadcast range join + hash agg —
    the fact table is scanned once."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("q80_orders")
    return spark_sql(
        o,
        """
        WITH RECURSIVE bands(lvl, lo) AS (
          SELECT 0, CAST(1000 AS DOUBLE)
          UNION ALL
          SELECT lvl + 1, lo * 2 FROM bands WHERE lo * 2 <= 1000000
        )
        SELECT lvl, lo AS band_lo,
               CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS band_revenue
        FROM bands LEFT JOIN q80_orders
          ON o_totalprice >= lo AND o_totalprice < lo * 2
        GROUP BY lvl, lo
        """,
    )


@register(
    "q81_variant_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    WHERE k > 50
    GROUP BY event_type
    """,
)
def q81_variant_json(spark, sf_dir):
    """Semi-structured column surface via Spark 4 VARIANT: ``parse_json``
    turns the props JSON string into a variant once, ``variant_get`` does
    typed path extraction — the engine's answer to schemaless columns
    (vs string-churning get_json_object: variant parses once, extracts
    many, and keeps extraction inside codegen). Filter + typed aggregate
    over the extracted field, oracle-checked against DuckDB's JSON
    functions."""
    e = load(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H gap shapes: Q7/Q8/Q9/Q10/Q11/Q16/Q20/Q21 (the classic plans the
# q-series had not yet covered). Reference parity: the downstream store
# serves exactly these reporting joins over the mirrored tables
# (SURVEY §2.8); predicates are adapted to the driver schema (no
# partsupp/commitdate — cost is modeled off p_retailprice, lateness off
# l_shipdate vs o_orderdate+90d).
# --------------------------------------------------------------------------


@register(
    "q82_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,10))), 2) AS DOUBLE)
             AS revenue,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey=o_custkey AND l_orderkey=o_orderkey
      AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
      AND l_returnflag='R' AND c_nationkey=n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q82_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item reporting — who returned the most
    revenue this quarter. Quarter filter pushed into the orders scan,
    returnflag filter into the lineitem scan; orders x customer first
    (both pre-filtered/narrow), nation broadcast; TakeOrderedAndProject
    caps the result driver-side (never a global sort materialization).
    Deterministic under ties via the c_custkey tie-break. Rounding happens
    IN DECIMAL (exact HALF_UP) before the double cast: rounding the double
    instead differs between engines when a sum lands exactly on a
    half-cent (Spark rounds the shortest-repr string, DuckDB the binary
    value)."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    oc = o.join(local_hint(c), F.col("o_custkey") == F.col("c_custkey"))
    return (
        li.join(local_hint(oc), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(30,10)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q83_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(CAST(volume AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 l_extendedprice*(1-l_discount) AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey=l_suppkey AND o_orderkey=l_orderkey AND c_custkey=o_custkey
            AND s_nationkey=n1.n_nationkey AND c_nationkey=n2.n_nationkey
            AND ((n1.n_name='NATION_1' AND n2.n_name='NATION_2')
              OR (n1.n_name='NATION_2' AND n2.n_name='NATION_1'))
            AND l_shipdate BETWEEN '1996-01-01' AND '1997-12-31')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q83_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    year. The two-nation predicate collapses supplier and customer to tiny
    broadcast sides BEFORE they touch the fact tables, so lineitem/orders
    are joined against broadcast hash relations only — the fact side never
    shuffles for a dim; the disjunctive nation-pair filter runs after the
    two (already tiny) dim joins."""
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    oc = o.join(local_hint(c), F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "cust_nation"
    )
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(local_hint(oc), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q84_market_share",
    oracle="""
    SELECT o_year,
           CAST(ROUND(CAST(CAST(SUM(CAST(CASE WHEN nation='NATION_3' THEN volume ELSE 0 END
                               AS DECIMAL(30,10))) AS DOUBLE) / CAST(SUM(CAST(volume AS DECIMAL(30,10))) AS DOUBLE) AS DECIMAL(30,10)), 6) AS DOUBLE) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice*(1-l_discount) AS volume, n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
          WHERE p_partkey=l_partkey AND s_suppkey=l_suppkey AND l_orderkey=o_orderkey
            AND o_custkey=c_custkey AND c_nationkey=n1.n_nationkey
            AND n1.n_regionkey=r_regionkey AND r_name='ASIA'
            AND s_nationkey=n2.n_nationkey AND p_type='ECONOMY')
    GROUP BY o_year
    """,
)
def q84_market_share(spark, sf_dir):
    """TPC-H Q8 shape: a supplier nation's share of regional market volume
    per year — the conditional-aggregate-ratio over a two-sided dim
    snowflake (customer->nation->region on one side, supplier->nation on
    the other). Every dim chain pre-collapses to a broadcast; the CASE
    numerator and the denominator come out of ONE aggregation pass
    (never two scans); decimal accumulation keeps the ratio deterministic
    under AQE re-partitioning."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select("s_suppkey", "nation")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    oc = o.join(local_hint(c), F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "o_orderdate"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(local_hint(oc), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
    )
    num = F.sum(
        F.when(F.col("nation") == "NATION_3", F.col("volume"))
        .otherwise(F.lit(0.0))
        .cast("decimal(30,10)")
    ).cast("double")
    den = F.sum(F.col("volume").cast("decimal(30,10)")).cast("double")
    return joined.groupBy("o_year").agg(F.round(num / den, 6).alias("mkt_share"))


@register(
    "q85_product_profit",
    oracle="""
    SELECT nation, o_year,
           CAST(ROUND(SUM(CAST(amount AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_profit
    FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 l_extendedprice*(1-l_discount) - 0.6*p_retailprice*l_quantity AS amount
          FROM part, supplier, lineitem, orders, nation
          WHERE s_suppkey=l_suppkey AND p_partkey=l_partkey AND o_orderkey=l_orderkey
            AND s_nationkey=n_nationkey AND p_name LIKE '%widget%')
    GROUP BY nation, o_year
    """,
)
def q85_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: product-line profit by supplier nation and year
    (cost modeled as 0.6 x retail price x quantity — the driver schema has
    no partsupp.ps_supplycost). The part-name LIKE filter collapses part
    to a broadcast before the fact join; supplier x nation pre-joins to a
    broadcast; only the lineitem x orders join (both fact-sized) shuffles,
    on l_orderkey."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "nation")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(local_hint(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
    )


@register(
    "q86_value_concentration",
    oracle="""
    WITH v AS (SELECT p_name, SUM(CAST(p_retailprice*l_quantity AS DECIMAL(30,10))) AS val
               FROM lineitem, part WHERE p_partkey=l_partkey GROUP BY p_name)
    SELECT p_name, ROUND(CAST(val AS DOUBLE),2) AS part_value
    FROM v
    WHERE CAST(val AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE)*0.017 FROM v)
    """,
)
def q86_value_concentration(spark, sf_dir):
    """TPC-H Q11 shape: value concentration — groups holding more than a
    fixed fraction of the GLOBAL total (HAVING against a scalar aggregate
    over the same derived table). The grouped frame is computed once and
    reused for both sides (self-referencing CTE semantics); the global
    total is a 1-row broadcast, so the filter is a codegen comparison, not
    a join. Decimal accumulation on both sides makes the threshold
    comparison order-free."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_name", "p_retailprice")
    v = (
        li.join(local_hint(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_name")
        .agg(
            F.sum((F.col("p_retailprice") * F.col("l_quantity")).cast("decimal(30,10)")).alias(
                "val"
            )
        )
    )
    total = v.agg((F.sum("val").cast("double") * 0.017).alias("thr"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("thr"))
        .select("p_name", F.round(F.col("val").cast("double"), 2).alias("part_value"))
    )


@register(
    "q87_parts_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey=l_partkey AND p_brand <> 'Brand#1'
      AND p_size IN (5,11,17,23,29,35,41,47)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q87_parts_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape: how many suppliers can supply each qualifying part
    class, excluding a complaint list (NOT IN subquery -> LEFT ANTI join;
    s_suppkey is non-null so the NULL-semantics trap of NOT IN never
    bites). The part filters collapse part to a broadcast; the anti probe
    is the (tiny) pre-filtered complaint set, also broadcast; the only
    shuffle is the distinct-count aggregation."""
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(5, 11, 17, 23, 29, 35, 41, 47)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q88_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey=l1.l_suppkey AND o_orderkey=l1.l_orderkey AND o_orderstatus='F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND s_nationkey=n_nationkey
      AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey=l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
                      WHERE l3.l_orderkey=l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND o3.o_orderkey=l3.l_orderkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    """,
)
def q88_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier finalized orders (lateness = shipped >90 days after
    order date; the driver schema has no commit/receipt dates). The
    EXISTS / NOT EXISTS pair decorrelates into one per-order aggregate:
    distinct suppliers and distinct LATE suppliers per order, computed in
    a single groupBy over the lateness-annotated lineitem — l1 qualifies
    iff the order has >1 distinct supplier and exactly one distinct late
    supplier (l1 itself). ONE shuffle on l_orderkey replaces both
    correlated scans; the per-order profile then broadcast-joins back."""
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").filter(
                    F.col("n_name").isin(
                        "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"
                    )
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderstatus")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(local_hint(o), F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    profile = lo.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    l1 = lo.filter(F.col("late") & (F.col("o_orderstatus") == "F")).select(
        F.col("l_orderkey").alias("k1"), "l_suppkey"
    )
    return (
        l1.join(local_hint(profile), F.col("k1") == F.col("l_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q89_potential_promotion",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem, part
        WHERE p_partkey=l_partkey AND p_name LIKE 'red%'
        GROUP BY l_suppkey, l_partkey HAVING SUM(l_quantity) > 50)
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name IN ('NATION_1','NATION_2','NATION_3'))
    """,
)
def q89_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape: suppliers in given nations who moved significant
    volume of a part class — nested IN subqueries, both becoming LEFT SEMI
    joins. The inner aggregate (per supplier x part quantity over the
    name-filtered parts) is the only shuffle; its distinct supplier keys
    and the nation keys are broadcast semi probes against supplier."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    movers = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    nat = (
        load(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .select("n_nationkey")
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(movers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q90_cohort_retention",
    oracle="""
    WITH d AS (SELECT user_id, ((epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000) AS day FROM events),
         f AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id),
         a AS (SELECT DISTINCT user_id, day FROM d)
    SELECT f.cohort_day, a.day - f.cohort_day AS age_days,
           COUNT(*) AS n_active
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY f.cohort_day, a.day - f.cohort_day
    """,
)
def q90_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-active day, counted
    on each subsequent day they return — THE product-analytics query (how
    many of day-N's new users are still active at age k). Day numbers are
    integer epoch-day arithmetic on ts_us (no calendar functions, so no
    timezone trap). Every stage keys on user_id: the cohort aggregate, the
    (user, day) distinct, and their join all reuse ONE user-keyed shuffle
    partitioning; the final (cohort, age) aggregate is over far fewer rows
    than events. Scale: no window over the raw stream, and the retention
    matrix is O(days²) rows regardless of corpus size.

    Day arithmetic is ``(ts_us - pmod(ts_us, day)) div day`` — exact
    integer FLOOR division (pmod is non-negative), the calendar-correct
    day bucketing for pre-1970 timestamps. Spark ``div`` and DuckDB's
    integer ``//`` BOTH truncate toward zero (one day late for negative
    ts_us), so the oracle spells the same pmod-style floor; pinned with
    crafted negatives in test_oracle_parity.py."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.expr("(ts_us - pmod(ts_us, 86400000000)) div 86400000000").alias("day")
    )
    f = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    a = e.distinct()
    return (
        a.join(f, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("age_days"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "q91_funnel_conversion",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         v AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, MIN(e.ts_us) AS t2 FROM e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts_us > v.t1 GROUP BY e.user_id),
         p AS (SELECT e.user_id FROM e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts_us > c.t2 GROUP BY e.user_id)
    SELECT '1_view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL SELECT '2_click', (SELECT COUNT(*) FROM c)
    UNION ALL SELECT '3_purchase', (SELECT COUNT(*) FROM p)
    """,
)
def q91_funnel_conversion(spark, sf_dir):
    """Ordered funnel: users who viewed, then clicked AFTER their first
    view, then purchased AFTER that first qualifying click — strict
    temporal ordering, not mere event co-occurrence (the distinction that
    makes funnels hard in plain SQL). Each stage narrows the previous
    stage's user set; all three stages aggregate and join on user_id, so
    the plan reuses one user-keyed partitioning end to end and the final
    counts are three 1-row aggregates unioned. Scale: events stream
    through type-pruned scans; no window over the full stream, state is
    one (user, ts) row per stage.

    Materialization: the v and c stage frames each feed TWO consumers
    (the next stage and their own count) — left lazy, every consumer
    re-derives its stage chain and events gets type-prune-scanned ~6x per
    run, which at 100 TB is re-reading the corpus. ``localCheckpoint``
    pins each stage (they are user-grouped aggregates, tiny relative to
    events), so the final plan holds exactly ONE events scan — the
    purchase stage's — with v/c read back from pinned partitions; pinned
    by ``test_plans.py::test_q91_single_events_scan``."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts_us")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
        .localCheckpoint()
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
        .localCheckpoint()
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        v.agg(F.lit("1_view").alias("stage"), F.count(F.lit(1)).alias("n_users"))
        .unionByName(
            c.agg(F.lit("2_click").alias("stage"), F.count(F.lit(1)).alias("n_users"))
        )
        .unionByName(
            p.agg(F.lit("3_purchase").alias("stage"), F.count(F.lit(1)).alias("n_users"))
        )
    )


@register(
    "q92_time_weighted_avg",
    oracle="""
    WITH o AS (
      SELECT user_id, value, epoch_us(ts) AS t, event_id,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) AS tn
      FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id,
           ROUND(CAST(SUM(CAST(value * (tn - t) AS DECIMAL(38, 6))) AS DOUBLE)
                 / NULLIF(CAST(SUM(tn - t) AS DOUBLE), 0), 6) AS twa,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM o WHERE tn IS NOT NULL
    GROUP BY user_id
    """,
)
def q92_time_weighted_avg(spark, sf_dir):
    """Time-weighted average over irregular samples — the metric an
    observability/IoT consumer computes over a mirror of sensor-style
    events: each reading holds until the NEXT one, so the mean weights
    every value by its holding interval (sum(v_i * dt_i) / sum(dt_i),
    per user, last reading contributing no interval). Users with a
    single event have no interval and drop — the SQL-standard answer,
    not an imputed one.

    Engine-parity note: the interval products accumulate in
    DECIMAL(38,6), not double — double summation is ORDER-DEPENDENT and
    Spark/DuckDB reduce in different orders, so exact decimal
    accumulation (x53's trick) is what makes the oracle hash stable; the
    single final division runs in IEEE double on both engines.

    Zero-duration guard: a user whose every reading shares one
    microsecond has sum(dt) = 0 — the time-weighted average is
    UNDEFINED over a zero-length horizon, so NULL (nullif, both
    engines) instead of an ANSI DIVIDE_BY_ZERO abort on a legal input.
    NULL-timestamp readings have no position on the time axis and are
    filtered BEFORE the lead window (both engines) — leaving them in
    hands the interval chain to each engine's opposite NULL-ordering
    default (Spark NULLS FIRST asc, DuckDB NULLS LAST).

    Scale: one user-keyed shuffle serves both the LEAD window and the
    aggregate (same partitioning — no second Exchange); state per row is
    one lead lookahead; nothing global."""
    from pyspark.sql import Window

    e = (
        load(spark, sf_dir, "events")
        .select("user_id", "value", "ts_us", "event_id")
        .filter(F.col("ts_us").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    o = e.withColumn("tn", F.lead("ts_us").over(w)).filter(F.col("tn").isNotNull())
    return (
        o.withColumn("dt", F.col("tn") - F.col("ts_us"))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.expr("CAST(value * dt AS DECIMAL(38, 6))")).cast("double")
                / F.expr("nullif(CAST(sum(dt) AS DOUBLE), 0D)"),
                6,
            ).alias("twa"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


@register(
    "q93_rolling_active_users",
    oracle="""
    WITH p AS (SELECT DISTINCT user_id, ((epoch_us(ts) - ((epoch_us(ts) % 86400000000 + 86400000000) % 86400000000)) // 86400000000) AS day FROM events WHERE ts IS NOT NULL),
         days AS (SELECT DISTINCT day FROM p)
    SELECT d.day,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM p
             WHERE p.day = d.day) AS dau,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM p
             WHERE p.day BETWEEN d.day - 29 AND d.day) AS mau30
    FROM days d
    """,
)
def q93_rolling_active_users(spark, sf_dir):
    """DAU and rolling 30-day MAU per observed day — the growth-analytics
    staple. Rolling DISTINCT cannot merge across days (distinct counts
    are not additive), so the exact answer comes from COVERAGE EXPLODE:
    each (user, day) pair supports days [day, day+29] and is exploded to
    those at most 30 coverage rows, restricted to observed days, then one
    (day)-keyed distinct count. The oracle states the same thing
    declaratively as correlated range subqueries.

    Scale: linear — user-day pairs x 30, never days x pairs (the range
    join this replaces is quadratic-ish under BNLJ); both distinct counts
    expand to two-level partial aggregates, so no (day, user) group
    gathers unbounded state. The approximate/mergeable alternative at
    warehouse scale is x50's HLL-per-day union — this is its exact
    yardstick.

    NULL-timestamp events belong to NO day and are filtered on both
    engines — left in, Spark's equi-join drops the NULL day while the
    oracle's correlated subqueries keep a phantom zero-count row
    (hostile-fixture finding)."""
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts_us").isNotNull())
        .select("user_id", F.expr("(ts_us - pmod(ts_us, 86400000000)) div 86400000000").alias("day"))
    )
    pairs = e.distinct()
    days = pairs.select("day").distinct()
    dau = pairs.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    cov = pairs.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + F.lit(29))).alias("cday")
    )
    mau = (
        cov.join(days.withColumnRenamed("day", "cday"), "cday")
        .groupBy("cday")
        .agg(F.countDistinct("user_id").alias("mau30"))
    )
    return dau.join(mau, dau["day"] == mau["cday"]).select("day", "dau", "mau30")


# --------------------------------------------------------------------------
# TPC-H gap shapes, second batch: Q12/Q14/Q17/Q18/Q19/Q22 equivalents on
# the available columns (no l_shipmode/l_commitdate/c_phone in the
# testdata, so each keeps the CLASSIC plan shape with a faithful column
# substitution, documented per query).
# --------------------------------------------------------------------------


@register(
    "q94_late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag
    """,
)
def q94_late_shipment_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipmode -> returnflag substitution): how many
    high- vs low-priority orders shipped LATE (>90 days after order
    date), bucketed by line class. One equi-join on the order key with
    the lateness predicate as a post-join filter (it references both
    sides), one hash aggregate over a 3-value group key with conditional
    counts folded map-side — no second pass, no pivot."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_count"),
        )
    )


@register(
    "q95_promo_revenue",
    oracle="""
    WITH r AS (
      SELECT
        ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO'
                            THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))
                            ELSE CAST(0 AS DECIMAL(30,10)) END) AS DOUBLE), 2) AS promo_revenue,
        CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01')
    SELECT promo_revenue, total_revenue,
           ROUND(100.0 * promo_revenue / total_revenue, 4) AS promo_pct
    FROM r
    """,
)
def q95_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promotion revenue share for a ship-date window —
    the conditional-aggregate-ratio pattern. ONE join + ONE aggregate
    computes both the promo and total sums (the CASE rides the same
    partial aggregate; no second scan, no scalar-subquery join); the
    ratio divides the two already-rounded decimals so the percentage is
    bit-stable under any partitioning. Part is dim-sized: broadcast in
    the local profile, AQE-sized in cluster."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,10)")
    agg = (
        li.join(local_hint(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(30,10)")
                    )
                ).cast("double"),
                2,
            ).alias("promo_revenue"),
            F.round(F.sum(rev).cast("double"), 2).alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(100.0 * F.col("promo_revenue") / F.col("total_revenue"), 4).alias("promo_pct"),
    )


@register(
    "q96_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey AS pk,
             CAST(ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS DECIMAL(30,10)), 4) AS DOUBLE) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / 7.0 AS DECIMAL(30,10)), 2) AS DOUBLE) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN pa ON pa.pk = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty
    """,
)
def q96_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue locked in SMALL-quantity orders of one
    brand — the correlated per-part average, decorrelated into one
    partkey-keyed aggregate joined back (never a per-row subquery). The
    per-part average accumulates in DECIMAL and rounds at scale 4 BEFORE
    the threshold comparison, so the boundary rows agree with the oracle
    bit-for-bit; lineitem is scanned twice by design (once for the
    averages, once for the probe) — at scale the pa aggregate is
    part-cardinality-sized and the join keys on l_partkey co-partition
    both sides in one shuffle wave."""
    li = load(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(davg("l_quantity").alias("avg_qty"))
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    return (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(local_hint(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(pa, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,10)")).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


@register(
    "q97_large_volume_orders",
    oracle="""
    WITH oq AS (
      SELECT l_orderkey AS lk,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 2) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,10))), 2) AS DOUBLE) > 200)
    SELECT c_name, o_orderkey, epoch_us(o_orderdate) AS odate_us, o_totalprice, total_qty
    FROM orders JOIN oq ON o_orderkey = lk
                JOIN customer ON c_custkey = o_custkey
    """,
)
def q97_large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: customers who placed LARGE-volume orders — the
    group-filter-then-enrich pattern. The per-order quantity aggregate
    (with its HAVING) runs FIRST and shrinks the order-key set before any
    wide join; orders then semi-filters through the surviving keys and
    customer attaches last (dim-sized, broadcastable). Quantity sums
    accumulate in DECIMAL so the HAVING boundary is partition-order
    free."""
    li = load(spark, sf_dir, "lineitem")
    oq = (
        li.groupBy(F.col("l_orderkey").alias("lk"))
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(oq, F.col("o_orderkey") == F.col("lk"))
        .join(local_hint(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("odate_us"),
            "o_totalprice",
            "total_qty",
        )
    )


@register(
    "q98_disjunctive_predicate_revenue",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1'  AND l_quantity BETWEEN 1  AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
)
def q98_disjunctive_predicate_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under an OR of conjunctive brand/size/
    quantity filter combos. The join stays a plain p_partkey equi hash
    join — the disjunction is a post-join filter, NOT a join condition,
    which is exactly what keeps the plan off BroadcastNestedLoopJoin
    (an OR in the ON clause would defeat the equi-join extractor; pinned
    by test_plans). Each disjunct's part-side conjuncts could also push
    into the part scan as a residual OR filter — Catalyst does this
    automatically (PushedFilters: Or(...))."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    d1 = (F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5)
    d2 = (F.col("p_brand") == "Brand#13") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10)
    d3 = (F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15)
    return (
        li.join(local_hint(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(d1 | d2 | d3)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@register(
    "q99_dormant_rich_by_nation",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(ROUND(CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*) AS DECIMAL(30,10)), 4) AS DOUBLE) AS ab
      FROM customer WHERE c_acctbal > 0)
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,10))), 2) AS DOUBLE) AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_nationkey
    """,
)
def q99_dormant_rich_by_nation(spark, sf_dir):
    """TPC-H Q22 shape (cntrycode -> nationkey substitution): customers
    richer than the positive-balance average with NO recent orders,
    rolled up by nation. The scalar average is a 1-row broadcast (the
    allowed BNLJ — same as q78's treatment), computed in DECIMAL and
    rounded before the comparison so boundary customers agree with the
    oracle; the NOT EXISTS decorrelates to a left anti join against the
    date-filtered orders (the filter pushes below the join, so the anti
    probe is small); one final nation-keyed aggregate."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    ab = c.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal").alias("ab"))
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@register(
    "q100_order_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q100_order_priority_check(spark, sf_dir):
    """TPC-H Q4 shape (commitdate -> shipdate-lag substitution): how many
    orders per priority had at least one line shipped late. The
    correlated EXISTS decorrelates to a LEFT SEMI join on the order key;
    the lateness predicate references both sides so it rides the join
    condition (still an equi join on l_orderkey — the extra conjunct is a
    post-match filter, not a join-shape change), then one 5-group
    aggregate."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q101_forecast_revenue_change",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,10))), 2) AS DOUBLE)
             AS potential_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q101_forecast_revenue_change(spark, sf_dir):
    """TPC-H Q6 shape: the pure scan-filter-aggregate — revenue that
    WOULD have been collected had small discounts been waived. No join at
    all; the whole query is one codegen span over the pushed-down date /
    discount / quantity predicates (with the buffer pool off, all three
    reach the parquet scan as PushedFilters — tests/test_plans pins
    pushdown generally)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("potential_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q102_customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q102_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: the distribution of orders-per-customer INCLUDING
    zero-order customers — the left-join-then-double-aggregate pattern
    (COUNT(col) counting only matched rows is the null-semantics crux).
    First aggregate keys on the customer (the join's own key — one
    shuffle wave serves both), second on the tiny count domain.

    NOTE: exercises the same operator path as q54_customer_distribution
    (both are the Q13 shape; this one landed with the r7 classic-TPC-H
    sweep before the overlap was noticed). Kept because removing a
    registry entry breaks the driver's accumulated-coverage history; any
    change to the Q13 pattern must be mirrored in q54."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q103_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,10))), 2) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q103_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with the quarter's maximum
    revenue — the view-then-max-equality pattern. The revenue view
    aggregates once (DECIMAL, rounded — the equality against MAX then
    compares identical doubles, so ties resolve identically to the
    oracle); the max rides a window over the view instead of a second
    scan-and-subquery pass, and the supplier dim attaches last
    (broadcastable)."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    top = (
        rev.withColumn("_mx", F.max("total_revenue").over(W.partitionBy()))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .drop("_mx")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(local_hint(s), F.col("l_suppkey") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "q104_min_cost_part_per_class",
    oracle="""
    WITH mn AS (
      SELECT p_brand AS mb, p_size AS ms, MIN(p_retailprice) AS min_price
      FROM part GROUP BY p_brand, p_size)
    SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
    FROM part JOIN mn ON p_brand = mb AND p_size = ms AND p_retailprice = min_price
    WHERE p_size <= 10
    """,
)
def q104_min_cost_part_per_class(spark, sf_dir):
    """TPC-H Q2 shape on the available tables (no partsupp in the
    testdata, so the correlated minimum runs over part itself): for each
    (brand, size) class, the part(s) at the class's MINIMUM price — the
    correlated scalar subquery decorrelated into a grouped MIN joined
    back on (group key, value), Q2's defining plan move. The size filter
    pushes below both the aggregate and the join (both sides prune
    before shuffling)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    mn = p.groupBy(
        F.col("p_brand").alias("mb"), F.col("p_size").alias("ms")
    ).agg(F.min("p_retailprice").alias("min_price"))
    return p.join(
        mn,
        (F.col("p_brand") == F.col("mb"))
        & (F.col("p_size") == F.col("ms"))
        & (F.col("p_retailprice") == F.col("min_price")),
    ).select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
