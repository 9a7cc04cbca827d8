"""Continuous training-corpus ingest — the streaming face of corpus.py.

A data team's corpus is not rebuilt nightly at 100 TB; new crawl batches
arrive continuously and must pass the SAME gates the batch build applies:

    rule filter (x43's verdict expressions, imported — one rule set)
      -> incremental exact dedup vs the STANDING digest index
         (x58 semantics: the corpus is never rescanned, only its
         (digest, keep_doc_id) index is probed; within-batch dups
         collapse to the min doc_id first)
      -> sharded split=*/shard_id=* append (same layout/expressions as
         the batch writer, so loaders cannot tell the corpora apart)

Exactly-once story: the streaming checkpoint dedupes source files; inside
``foreachBatch`` every write is keyed by ``batch_id`` partition directory
with dynamic partition overwrite, so a REPLAYED microbatch (crash between
sink writes and checkpoint commit) overwrites its own previous output
instead of double-appending — idempotence by layout, the same trick the
SCD2 store gets from its manifest. The digest index is itself a
batch_id-partitioned parquet table: readers see one row per retained
digest regardless of replays.

Scale: the only per-batch work proportional to the CORPUS is the digest
index probe, a hash join where the (small) batch side builds; everything
else is O(batch). The index at 100 TB corpus scale is ~16 bytes/doc —
broadcastable for small batches, bucketed on digest for big ones. The
near-dup twin is x66's band-index probe; wiring it in is the same join
against the banded signature table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from consensource_sds_spark.queries.extensions import minhash_band_values, with_filter_verdict
from consensource_sds_spark.sources.dataset_writer import ROW_GROUP_BYTES, with_shard_columns

#: the documents-table schema (TESTDATA.md) — file streams need it declared
DOC_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def _digest_index(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The standing (digest, keep_doc_id) table, or None before first batch."""
    try:
        return spark.read.parquet(index_dir).select("digest", "keep_doc_id")
    except Exception:
        return None  # AnalysisException on empty/missing path


def _band_index(spark: SparkSession, band_dir: str) -> DataFrame | None:
    """The standing (doc_id, band, band_val) LSH index, or None."""
    try:
        return spark.read.parquet(band_dir).select("doc_id", "band", "band_val")
    except Exception:
        return None


def _near_dedup(spark: SparkSession, fresh: DataFrame, band_dir: str) -> DataFrame:
    """Drop near-duplicates via the x66 band probe, streaming form:

    1. within-batch — a doc sharing any band with a SMALLER doc_id in the
       same batch drops (the pairwise-predecessor rule, x65's semantic;
       chains collapse toward the minimum like x06's star contraction);
    2. vs the corpus — surviving docs probe the STANDING band index; any
       hit (a retained doc, necessarily from an earlier batch) drops the
       newcomer. Index doc_ids equal to the probe doc_id are ignored so a
       crash-replayed batch never treats its own previous write as a dup.

    Both joins key on (band, band_val): batch x batch is bucket-bounded
    and batch-sized; batch x index streams the index (bucketed on the
    band key it is shuffle-free). Never corpus x corpus."""
    bands = minhash_band_values(fresh.select("doc_id", "text")).localCheckpoint()
    a = bands.select(F.col("doc_id").alias("_da"), "band", "band_val")
    b = bands.select(F.col("doc_id").alias("_db"), "band", "band_val")
    dup_in_batch = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("_db") < F.col("_da"))
        .select(F.col("_da").alias("doc_id"))
        .distinct()
    )
    fresh = fresh.join(dup_in_batch, "doc_id", "left_anti")
    idx = _band_index(spark, band_dir)
    if idx is not None:
        hits = (
            bands.join(
                idx.select(F.col("doc_id").alias("_di"), "band", "band_val"),
                ["band", "band_val"],
            )
            .filter(F.col("_di") != F.col("doc_id"))
            .select("doc_id")
            .distinct()
        )
        fresh = fresh.join(hits, "doc_id", "left_anti")
    return fresh


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    index_dir: str,
    n_shards: int = 16,
    band_dir: str | None = None,
) -> None:
    """One microbatch through filter -> incremental dedup -> sharded append.

    Pure function of (batch, standing index) so the identical code runs
    under spark.read for backfill and inside foreachBatch for the stream."""
    kept = with_filter_verdict(batch_df).filter(F.col("verdict") == "keep")
    digests = kept.withColumn("digest", F.md5("text"))
    # collapse within-batch duplicates first (min doc_id survives), then
    # probe the standing index — one digest-keyed shuffle + one probe join
    batch_min = (
        digests.withColumn(
            "_rk", F.row_number().over(Window.partitionBy("digest").orderBy("doc_id"))
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    idx = _digest_index(spark, index_dir)
    fresh = (
        batch_min.join(F.broadcast(idx.select("digest")), "digest", "left_anti")
        if idx is not None
        else batch_min
    )
    fresh = fresh.select("doc_id", "text", "lang", "source", "n_chars", "digest").localCheckpoint()
    if band_dir is not None:
        fresh = _near_dedup(spark, fresh, band_dir).localCheckpoint()

    # idempotent-by-layout appends: each write owns its batch_id directory.
    # ORDER MATTERS for crash convergence: corpus rows first, index last —
    # a replay after a crash between the two recomputes `fresh` (the index
    # probe still misses) and overwrites the same corpus partitions; had
    # the index gone first, the replay's probe would filter the batch to
    # empty and its corpus rows would be lost.
    (
        with_shard_columns(fresh.drop("digest"), key="doc_id", n_shards=n_shards)
        .withColumn("batch_id", F.lit(batch_id))
        .repartition("split", "shard_id")
        .write.mode("overwrite")
        .partitionBy("batch_id", "split", "shard_id")
        .option("partitionOverwriteMode", "dynamic")
        .option("parquet.block.size", ROW_GROUP_BYTES)
        .parquet(out_dir)
    )
    (
        fresh.select("digest", F.col("doc_id").alias("keep_doc_id"))
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(index_dir)
    )
    if band_dir is not None:
        # only RETAINED docs enter the band index (dups must never become
        # probes' reference points); replay-safe like the digest index
        (
            minhash_band_values(fresh.select("doc_id", "text"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(band_dir)
        )


def run_corpus_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_shards: int = 16,
    available_now: bool = True,
    near_dedup: bool = False,
):
    """Stream document files from ``source_dir`` through the corpus gates
    into ``out_dir`` (+ ``<out_dir>_digest_index``; with ``near_dedup``
    also ``<out_dir>_band_index`` for the x66 LSH probe). ``available_now``
    drains what exists and stops — the backfill/test trigger; pass False
    for a continuously-running ingest."""
    index_dir = out_dir.rstrip("/") + "_digest_index"
    band_dir = out_dir.rstrip("/") + "_band_index" if near_dedup else None
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(source_dir)

    def body(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, batch_df, batch_id, out_dir, index_dir, n_shards, band_dir)

    writer = stream.writeStream.foreachBatch(body).option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()


def read_corpus(spark: SparkSession, out_dir: str) -> DataFrame:
    """The ingested corpus as a frame (batch_id/split/shard_id partition
    columns included)."""
    return spark.read.parquet(out_dir)


#: consolidated partition id for compacted index segments — negative so it
#: can never collide with a real stream batch id
_COMPACTED_BATCH_ID = -1


def compact_indexes(spark: SparkSession, out_dir: str) -> None:
    """Fold the per-batch index partitions into one consolidated segment.

    The ingest writes one ``batch_id=N`` directory per microbatch — the
    right shape for idempotent replay, the wrong one after 10k batches
    (small-files listing cost on every probe). Compaction rewrites each
    index into ``batch_id=-1`` and drops the per-batch directories.

    Crash-safe by probe semantics, no manifest needed: the consolidated
    segment is written FIRST (dynamic overwrite of its own partition),
    then per-batch dirs are removed. A crash in between leaves rows
    duplicated across old and consolidated partitions — and both probes
    are agnostic to duplicate index rows (anti joins and DISTINCT'd hit
    sets), so reads stay correct and the next compaction converges. New
    batches arriving after compaction append fresh batch_id dirs as
    usual."""
    import shutil

    for dir_ in (out_dir.rstrip("/") + "_digest_index", out_dir.rstrip("/") + "_band_index"):
        if not os.path.isdir(dir_):
            continue
        live = [
            d
            for d in os.listdir(dir_)
            if d.startswith("batch_id=") and d != f"batch_id={_COMPACTED_BATCH_ID}"
        ]
        if not live:
            continue
        # localCheckpoint cuts the file lineage BEFORE the write: the
        # consolidated rows are pinned in block storage, so the overwrite
        # never reads the directory it is rewriting
        consolidated = (
            spark.read.parquet(dir_)
            .drop("batch_id")
            .distinct()
            .withColumn("batch_id", F.lit(_COMPACTED_BATCH_ID))
            .repartition(max(1, len(live) // 64))
            .localCheckpoint()
        )
        (
            consolidated.write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(dir_)
        )
        for d in live:
            shutil.rmtree(os.path.join(dir_, d), ignore_errors=True)


__all__ = [
    "ingest_batch",
    "run_corpus_stream",
    "read_corpus",
    "compact_indexes",
    "DOC_SCHEMA",
]
