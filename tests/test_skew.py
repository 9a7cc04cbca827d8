"""Skew mitigation: salted helpers match unsalted results; AQE splits a
skewed shuffle join at runtime (the SCALE.md claims, pinned)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from consensource_sds_spark.functions.skew import salted_aggregate, salted_join


@pytest.fixture()
def skewed_df(spark):
    # key 0 holds ~90% of rows; keys 1..20 share the rest
    return spark.range(50_000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 0 ELSE 1 + id % 20 END AS k",
        "id AS v",
    )


def test_salted_aggregate_matches_plain(spark, skewed_df):
    plain = {
        (r["k"],): (r["n"], r["s"], r["mx"])
        for r in skewed_df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"],): (r["n"], r["s"], r["mx"])
        for r in salted_aggregate(
            skewed_df, ["k"], {"n": "count(*)", "s": "sum(v)", "mx": "max(v)"}
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_non_reaggregable(skewed_df):
    with pytest.raises(ValueError):
        salted_aggregate(skewed_df, ["k"], {"a": "avg(v)"})


def test_salted_aggregate_rejects_distinct(skewed_df):
    """Regression: count(distinct x) per salt bucket then summed counts a
    value once per bucket — silently inflated; the guard must reject the
    DISTINCT modifier, not just non-re-aggregable function names."""
    with pytest.raises(ValueError, match="DISTINCT"):
        salted_aggregate(skewed_df, ["k"], {"d": "count(distinct v)"})
    with pytest.raises(ValueError, match="DISTINCT"):
        salted_aggregate(skewed_df, ["k"], {"d": "sum(DISTINCT v)"})


def test_salted_join_matches_plain(spark, skewed_df):
    dim = spark.range(25).selectExpr("id AS k", "concat('name', id) AS name")
    plain = sorted(
        (r["k"], r["v"], r["name"])
        for r in skewed_df.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in salted_join(skewed_df, dim, "k", buckets=8).collect()
    )
    assert salted == plain


def test_aqe_splits_skewed_join(spark, skewed_df, tmp_path):
    """Cluster-profile claim: AQE detects the hot key's oversized shuffle
    partition and splits it (skew=true in the adaptive plan)."""
    left = str(tmp_path / "left")
    right = str(tmp_path / "right")
    skewed_df.write.parquet(left)
    spark.range(30).selectExpr("id AS k", "id * 2 AS w").write.parquet(right)

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = spark.read.parquet(left).join(spark.read.parquet(right), "k")
        # execute THIS QueryExecution (a write would spawn its own; AQE
        # finalizes the adaptive plan only for the execution that ran)
        assert len(df.collect()) == 50_000
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, f"AQE did not split the skewed partition:\n{plan}"
    finally:
        for k, v in old.items():
            (spark.conf.set(k, v) if v is not None else spark.conf.unset(k))


def test_x65_sub_splits_mega_cluster(spark):
    """SemDeDup's pair join is label-keyed: one degenerate mega-cluster is
    a single join key whose |c|² pairs land on one AQE-unsplittable
    shuffle partition. Labels over the bound are SUB-SPLIT into secondary
    hash bands (pairs within a band only) instead of aborting the pass:
    the operator must COMPLETE with bounded per-key pair counts, cover
    every vector, and — since band-splitting can only MISS dup pairs,
    never invent them — keep a superset of the unsplit answer's kept set.
    Labels under the bound get exactly one band, so the default-bound
    answer is untouched."""
    from pyspark.sql import functions as F

    from consensource_sds_spark.queries import load
    from consensource_sds_spark.queries.extensions import x65_semantic_dedup

    sf = "/root/testdata/sf0.001"
    n = load(spark, sf, "embeddings").count()
    exact = x65_semantic_dedup(spark, sf)  # default bound: no label splits
    assert exact.count() == n
    kept_exact = {r["vec_id"] for r in exact.filter("keep").collect()}

    # bound pulled under the real cluster sizes: every label sub-splits —
    # the pass completes (no refusal), still covers every vector
    split = x65_semantic_dedup(spark, sf, max_cluster_rows=2)
    assert split.count() == n
    kept_split = {r["vec_id"] for r in split.filter("keep").collect()}
    assert kept_exact <= kept_split
    # and the sub-split actually bit: some cross-band dup pair was missed
    # (with bound=2 on multi-hundred-row labels this is a certainty)
    assert len(kept_split) > len(kept_exact)

    # the banding itself bounds the join keys: recompute the operator's
    # (label, band) grouping at bound=2 and check the worst group shrank
    # from the mega-key (|label|) to ~bound-sized in expectation
    e = load(spark, sf, "embeddings")
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("_n"))
    max_label = counts.agg(F.max("_n")).collect()[0][0]
    assert max_label > 2  # the scenario is real: labels exceed the bound
    banded = (
        e.join(F.broadcast(counts), "label")
        .select(
            "label",
            F.pmod(
                F.xxhash64("vec_id"),
                F.greatest(F.ceil(F.col("_n") / F.lit(2)).cast("int"), F.lit(1)),
            ).alias("band"),
        )
        .groupBy("label", "band")
        .agg(F.count(F.lit(1)).alias("grp"))
    )
    worst = banded.agg(F.max("grp")).collect()[0][0]
    assert worst <= 12, f"hash banding left a {worst}-row join key (label max {max_label})"


def test_salted_aggregate_rejects_wrapped_expressions(skewed_df):
    """Regression (r9 review): arithmetic-wrapped specs like 'sum(x)+1'
    parsed their fn prefix fine and were silently corrupted by the
    two-phase merge (+1 once per occupied salt bucket) — the guard must
    reject anything that is not exactly one re-aggregable call."""
    import pytest

    from consensource_sds_spark.functions.skew import salted_aggregate

    for bad in ("sum(v)+1", "sum(v)*2", "min(v) + max(v)", "1+sum(v)"):
        with pytest.raises(ValueError, match="re-aggregable"):
            salted_aggregate(skewed_df, ["k"], {"out": bad})
    # exactly-one-call specs (including nested plain functions) still pass
    got = salted_aggregate(skewed_df, ["k"], {"out": "sum(abs(v))"})
    assert "out" in got.columns
