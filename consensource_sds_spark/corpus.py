"""End-to-end training-corpus build: the registry operators composed into
the pipeline a data team actually ships:

    exact dedup (x01 digest groupBy on the RAW text, lowest doc_id)
      -> boilerplate scrub (x64's passage removal, in-order reassembly)
      -> rule filter (x43's verdict expressions over the CLEAN text)
      -> near-dedup (x02/x03 banding + x06 star-contraction over the
         clean text -> keep one representative per cluster AMONG THE
         SURVIVORS)
      -> per-domain cap (x61 rule, clean-text length)
      -> split/shard assignment (x25/x36 hashes)
      -> sharded parquet layout (dataset_writer, bounded row groups)

Exact dedup runs BEFORE the scrub, on the raw bytes: x64's boilerplate
semantics remove EVERY occurrence of a cross-document repeated passage,
so byte-exact duplicate documents — which share every chunk — would all
collapse to empty and be dropped as too_short, keeping ZERO copies of
that content (C4, Raffel et al. 2020, keeps one). Deduping raw text
first leaves exactly one full copy, whose chunks are then unique and
survive the scrub intact. The scrub still runs before the filters and
the near-dedup (the C4 ordering argument: boilerplate must not bias the
filter signals or glue unrelated documents into near-dup clusters), and
the keep-ONE-canonical-copy variant of repeated-span removal is the
optional exact-substring stage (x77), not the boilerplate scrub.

Every stage runs the SAME frame-level helpers the oracle-checked registry
entries run (scrub_boilerplate/x64, with_filter_verdict/x43,
minhash_band_values + connected_components/x02/x03/x06) — this module
only sequences them over the cleaned frame and carries an audit trail:
the returned stats DataFrame attributes every dropped document to the
stage + reason that dropped it, so corpus shrinkage is monitorable per
rule, per slice.

Stage outputs are materialized ONCE into ``<out_dir>_staging`` parquet
(a sibling of the corpus dir — the corpus write is a clean overwrite)
and re-read for every downstream use: the scrubbed text + verdicts land
together in one table feeding the keep join, every dedup stage, AND the
audit; the cluster map (which re-derives the LSH chain internally) runs
exactly once. At 100 TB each avoided recompute is a full corpus pass;
staging tables are also the natural restart points for a multi-day
build.

Near-dedup clusters over the documents still ALIVE at that stage (post
filter + exact dedup), and the representative is the minimum surviving
doc_id — so a cluster never vanishes just because its global minimum
was dropped upstream. Clustering the full corpus instead would let a
filter-rejected doc transitively bridge two dissimilar survivors into
one cluster (wrongly deleting one of them) and would pay the LSH
chain over the rejected majority of a crawl.

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
    exact_substring_scrub,
    near_dup_clusters,
    scrub_boilerplate,
    with_filter_verdict,
    with_gopher_verdict,
)
from consensource_sds_spark.sources.dataset_writer import with_shard_columns, write_training_shards


def _near_dedup_survivors(alive: DataFrame, clusters: DataFrame) -> DataFrame:
    """One representative per near-dup cluster, chosen among the documents
    still ``alive`` at this stage (min doc_id of the surviving members).

    ``clusters`` is a (doc_id, cluster_id) map covering at least the
    alive docs; members absent from ``alive`` are ignored, so a cluster
    whose minimum was dropped upstream still keeps its smallest
    surviving member. One shuffle on cluster_id."""
    member = alive.select("doc_id").join(clusters, "doc_id")
    reps = member.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    return alive.join(reps.select("doc_id"), "doc_id", "left_semi")


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    domain_cap: int = 10,
    n_shards: int = 16,
    substring_scrub: bool = False,
    gopher_gate: bool = False,
    gopher_rules: tuple[str, ...] | None = None,
    files_per_shard: int = 1,
) -> DataFrame:
    """Run the full pipeline and write ``split=*/shard_id=*`` parquet to
    ``out_dir``; returns the per-(stage, reason) drop accounting.

    ``gopher_gate`` inserts x80's Gopher rule set (Rae 2021) after the
    x43 filter, dropping failures with per-rule attribution in the audit
    (stage ``gopher_gate``, reason = first failing rule); ``gopher_rules``
    selects a rule subset by name. Off by default: the thresholds are
    tuned for web-crawl English prose and cut hard on short or
    synthetic-vocabulary corpora.

    ``substring_scrub`` inserts x77's exact-substring cut (Lee et al.
    2022) between the boilerplate scrub and the quality filter: every
    cross-document W-token run keeps one canonical copy corpus-wide, and
    the filters judge the post-cut text. Off by default — it is the
    expensive exact pass (O(tokens) window relation); the per-doc token
    loss lands in an ``n_substr_removed`` column, not the drop audit
    (documents are cut, not dropped — the downstream length filter is
    what drops a hollowed-out doc, same single-purpose-stage discipline
    as the boilerplate scrub)."""
    if gopher_rules is not None and not gopher_gate:
        raise ValueError(
            "gopher_rules was given but gopher_gate is False — the rules "
            "would be silently ignored and the corpus would ship ungated"
        )
    docs = load(spark, sf_dir, "documents")
    staging = out_dir.rstrip("/") + "_staging"

    def _stage_ids(name: str, df: DataFrame) -> DataFrame:
        """Materialize a stage's surviving doc_ids ONCE into staging.
        Every downstream consumer — the next stage, the final shard
        write, every audit branch — then reads the tiny id table instead
        of re-deriving the stage chain; without this, one
        ``stats.collect()`` re-ran the dedup aggregations and the
        domain-cap window several times over (at 100 TB, each avoided
        re-derivation is a full corpus pass)."""
        df.select("doc_id").write.mode("overwrite").parquet(os.path.join(staging, name))
        return spark.read.parquet(os.path.join(staging, name))

    # 1. exact dedup FIRST, on the RAW text (see module docstring: deduping
    #    after the scrub keeps ZERO copies of byte-exact duplicated docs).
    #    NULL-text docs cannot be content duplicates — they pass through so
    #    the filter stage can attribute them as 'malformed' instead of an
    #    inner join silently deleting them from the audit.
    exact_keep = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    ids1 = _stage_ids(
        "ids_exact",
        docs.filter(F.col("text").isNull()).select("doc_id").unionByName(
            exact_keep.select("doc_id")
        ),
    )
    survivors0 = docs.join(ids1, "doc_id", "left_semi")

    # 2+3. scrub boilerplate (and optionally the exact-substring cut),
    #      then judge the CLEAN text — all land in ONE staging table
    #      (text here = clean text; n_chars recomputed on it). LEFT join:
    #      scrub emits no row for NULL text, and an inner join would drop
    #      the doc before the verdict can stamp it 'malformed'.
    base = survivors0.select("doc_id", "lang", "source").join(
        scrub_boilerplate(survivors0.select("doc_id", "text")), "doc_id", "left"
    )
    extra_cols: list[str] = []
    if substring_scrub:
        # The scrub subtree is otherwise planned three times in this one
        # job: the outer join below plus exact_substring_scrub's two reads
        # of its input (token and window explodes). Materialize it once —
        # into STAGING, not a localCheckpoint: checkpoint blocks are
        # executor-local with lineage cut, so one lost executor during the
        # multi-hour exact pass would abort the whole build; the staging
        # table is the module's own fault-tolerant restart discipline.
        base.write.mode("overwrite").parquet(os.path.join(staging, "scrub_base"))
        base = spark.read.parquet(os.path.join(staging, "scrub_base"))
        ss = exact_substring_scrub(
            base.select("doc_id", F.col("clean_text").alias("text"))
        ).select(
            "doc_id",
            F.col("text_scrubbed").alias("_ss_text"),
            F.col("n_removed").alias("n_substr_removed"),
        )
        # left + coalesce: NULL-text docs have no scrub/cut rows but must
        # reach the filter's 'malformed' attribution
        base = (
            base.drop("clean_text")
            .join(ss, "doc_id", "left")
            .withColumnRenamed("_ss_text", "clean_text")
            .withColumn("n_substr_removed", F.coalesce("n_substr_removed", F.lit(0)))
        )
        extra_cols = ["n_substr_removed"]
    cleaned = base.select(
        "doc_id",
        F.col("clean_text").alias("text"),
        "lang",
        "source",
        F.length("clean_text").alias("n_chars"),
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        *extra_cols,
    )
    with_filter_verdict(cleaned).select(
        "doc_id", "text", "lang", "source", "n_chars", "n_removed", *extra_cols, "verdict"
    ).write.mode("overwrite").parquet(os.path.join(staging, "clean"))
    clean = spark.read.parquet(os.path.join(staging, "clean"))
    kept1 = clean.filter(F.col("verdict") == "keep").drop("verdict")
    if gopher_gate:
        # x80's rule set as a drop stage, per-rule attributed. The verdict
        # projection (a full pass of per-word folds over the clean-keep
        # rows) is staged ONCE and serves both the keep join and the audit
        # — previously every downstream job AND the audit branch re-ran it.
        with_gopher_verdict(kept1, rules=gopher_rules).select(
            "doc_id", "gopher_verdict"
        ).write.mode("overwrite").parquet(os.path.join(staging, "gopher"))
        gop_tbl = spark.read.parquet(os.path.join(staging, "gopher"))
        kept1 = kept1.join(
            gop_tbl.filter(F.col("gopher_verdict") == "keep").select("doc_id"),
            "doc_id",
            "left_semi",
        )

    # 4. near-dedup — cluster map over the docs ALIVE at this stage (LSH
    #    chain runs once, into staging). Clustering the full corpus
    #    instead would let a filter-rejected doc transitively BRIDGE two
    #    dissimilar survivors into one cluster (one of them then wrongly
    #    dropped) — and would pay the most expensive stage over the
    #    rejected majority. Representative survival needs no dead docs:
    #    the min-doc_id choice runs among the members present here.
    near_dup_clusters(kept1.select("doc_id", "text")).write.mode("overwrite").parquet(
        os.path.join(staging, "clusters")
    )
    clusters = spark.read.parquet(os.path.join(staging, "clusters"))
    ids3 = _stage_ids("ids_near", _near_dedup_survivors(kept1, clusters))
    kept3 = kept1.join(ids3, "doc_id", "left_semi")

    # 5. per-domain cap (x61 rule: prefer longer CLEAN docs, doc_id tie-break)
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ids4 = _stage_ids(
        "ids_cap",
        kept3.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= domain_cap),
    )
    kept4 = kept1.join(ids4, "doc_id", "left_semi")

    # 6. deterministic split/shard columns + sharded layout
    write_training_shards(
        kept4, out_dir, key="doc_id", n_shards=n_shards, files_per_shard=files_per_shard
    )

    # audit trail: one row per (stage, reason) with drop counts — every
    # branch is a projection over the staged tables joined against the
    # staged id sets, never a re-run of the stage computations
    filt = (
        clean.filter(F.col("verdict") != "keep")
        .groupBy(F.lit("filter").alias("stage"), F.col("verdict").alias("reason"))
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    exact_dropped = docs.join(ids1, "doc_id", "left_anti")
    near_dropped = kept1.join(ids3, "doc_id", "left_anti")
    cap_dropped = kept3.join(ids4, "doc_id", "left_anti")

    def _one(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(stage).alias("stage"),
            F.lit(stage).alias("reason"),
            F.count(F.lit(1)).alias("n_dropped"),
        ).select("stage", "reason", "n_dropped")

    out = (
        _one("exact_dedup", exact_dropped)
        .unionByName(filt)
        .unionByName(_one("near_dedup", near_dropped))
        .unionByName(_one("domain_cap", cap_dropped))
    )
    if gopher_gate:
        gop = (
            gop_tbl.filter(F.col("gopher_verdict") != "keep")
            .groupBy(
                F.lit("gopher_gate").alias("stage"),
                F.col("gopher_verdict").alias("reason"),
            )
            .agg(F.count(F.lit(1)).alias("n_dropped"))
        )
        out = out.unionByName(gop)
    return out


__all__ = ["build_training_corpus", "with_shard_columns"]
