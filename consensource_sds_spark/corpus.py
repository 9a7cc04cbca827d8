"""End-to-end training-corpus build: the registry operators composed into
the pipeline a data team actually ships.

    filter (x43 rules, auditable reasons)
      -> exact dedup (x01 digest groupBy, lowest doc_id survives)
      -> near-dedup (x03 LSH candidates -> x06 star-contraction clusters
         -> keep one representative per cluster AMONG THE SURVIVORS)
      -> per-domain cap (x61 rule)
      -> split/shard assignment (x25/x36 hashes)
      -> sharded parquet layout (dataset_writer, bounded row groups)

Every stage is the SAME code the oracle-checked registry entries run —
this module only sequences them and carries an audit trail: the returned
stats DataFrame attributes every dropped document to the stage + reason
that dropped it, so corpus shrinkage is monitorable per rule, per slice.

Stage outputs are materialized ONCE into ``<out_dir>_staging`` parquet
(a sibling of the corpus dir — the corpus write is a clean overwrite) and
re-read for every downstream use: the x43 verdicts feed both the keep
join and the audit from one computation, and x06's cluster map (which
internally re-derives the x02->x03 LSH chain) runs exactly once. At
100 TB each avoided recompute is a full corpus pass; staging tables are
also the natural restart points for a multi-day build.

Near-dedup representative choice is computed over the documents that
are still alive at that stage, not x06's global ``keep`` flag: if a
cluster's global minimum doc_id was already dropped by the rule filter
or exact dedup, the cluster still keeps one surviving representative
(the minimum doc_id among survivors) instead of vanishing entirely.

Scale posture: each stage is a hash-keyed shuffle or a projection; the
materializations are the staging tables and the final partitioned write.
Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from consensource_sds_spark.queries import load
from consensource_sds_spark.queries.extensions import (
    x06_dedup_clusters,
    x43_filter_pipeline,
)
from consensource_sds_spark.sources.dataset_writer import with_shard_columns, write_training_shards


def _near_dedup_survivors(alive: DataFrame, clusters: DataFrame) -> DataFrame:
    """One representative per near-dup cluster, chosen among the documents
    still ``alive`` at this stage (min doc_id of the surviving members).

    ``clusters`` is x06's (doc_id, cluster_id) map over ALL documents; a
    cluster whose global minimum was dropped upstream still keeps its
    smallest surviving member. One shuffle on cluster_id."""
    member = alive.select("doc_id").join(clusters, "doc_id")
    reps = member.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    return alive.join(reps.select("doc_id"), "doc_id", "left_semi")


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    domain_cap: int = 10,
    n_shards: int = 16,
) -> DataFrame:
    """Run the full pipeline and write ``split=*/shard_id=*`` parquet to
    ``out_dir``; returns the per-(stage, reason) drop accounting."""
    docs = load(spark, sf_dir, "documents")
    staging = out_dir.rstrip("/") + "_staging"

    # 1. rule filter — x43's verdict column, materialized once for both
    #    the keep join and the per-reason audit
    x43_filter_pipeline(spark, sf_dir).select("doc_id", "verdict").write.mode(
        "overwrite"
    ).parquet(os.path.join(staging, "verdicts"))
    verdicts = spark.read.parquet(os.path.join(staging, "verdicts"))
    kept1 = docs.join(verdicts.filter(F.col("verdict") == "keep"), "doc_id", "left_semi")

    # 2. exact dedup — digest groupBy, lowest doc_id per digest survives
    digests = kept1.select("doc_id", F.md5("text").alias("content_hash"))
    exact_keep = digests.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    kept2 = kept1.join(exact_keep.select("doc_id"), "doc_id", "left_semi")

    # 3. near-dedup — x06's cluster map (LSH chain runs once, into staging);
    #    representative = min doc_id among members still alive here
    x06_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id").write.mode(
        "overwrite"
    ).parquet(os.path.join(staging, "clusters"))
    clusters = spark.read.parquet(os.path.join(staging, "clusters"))
    kept3 = _near_dedup_survivors(kept2, clusters)

    # 4. per-domain cap (x61 rule: prefer longer docs, doc_id tie-break)
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    kept4 = (
        kept3.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= domain_cap)
        .drop("_rk")
    )

    # 5. deterministic split/shard columns + sharded layout
    write_training_shards(kept4, out_dir, key="doc_id", n_shards=n_shards)

    # audit trail: one row per (stage, reason) with drop counts — reads
    # the staging tables, never re-runs the stage computations
    filt = (
        verdicts.filter(F.col("verdict") != "keep")
        .groupBy(F.lit("filter").alias("stage"), F.col("verdict").alias("reason"))
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    exact_dropped = kept1.join(exact_keep.select("doc_id"), "doc_id", "left_anti")
    near_dropped = kept2.join(kept3.select("doc_id"), "doc_id", "left_anti")
    cap_dropped = kept3.join(kept4.select("doc_id"), "doc_id", "left_anti")

    def _one(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.lit(stage).alias("reason"),
            F.count(F.lit(1)).alias("n_dropped"),
        ).select("stage", "reason", "n_dropped")

    return (
        filt.unionByName(_one("exact_dedup", exact_dropped))
        .unionByName(_one("near_dedup", near_dropped))
        .unionByName(_one("domain_cap", cap_dropped))
    )


__all__ = ["build_training_corpus", "with_shard_columns"]
