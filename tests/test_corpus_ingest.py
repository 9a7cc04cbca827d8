"""Streaming corpus ingest: the x43 gates + incremental digest dedup run
continuously over a file stream; later batches never re-admit content the
standing index already retains, and replaying a batch is idempotent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from consensource_sds_spark.streaming.corpus_ingest import (
    compact_indexes,
    ingest_batch,
    read_corpus,
    run_corpus_stream,
)

GOOD = " ".join(f"tok{i}" for i in range(30))  # passes every filter rule
GOOD2 = " ".join(f"other{i}" for i in range(30))
SHORT = "too short"
REPET = "dup " * 40  # 40 tokens, 1 distinct -> too_repetitive


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for (i, t, lang, src) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "incoming"),
        "out": str(tmp_path / "corpus"),
        "ckpt": str(tmp_path / "ckpt"),
        "idx": str(tmp_path / "corpus_digest_index"),
    }


def test_stream_filters_and_dedups_across_batches(spark, dirs):
    # batch 1: one good doc, one filtered-short, one filtered-repetitive
    _docs(
        spark, [(1, GOOD, "en", "a"), (2, SHORT, "en", "a"), (3, REPET, "en", "a")]
    ).coalesce(1).write.mode("append").parquet(dirs["src"])
    run_corpus_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"], n_shards=4)
    got = read_corpus(spark, dirs["out"])
    assert [r["doc_id"] for r in got.collect()] == [1]

    # batch 2: a duplicate of batch 1's text (new doc_id), a within-batch
    # dup pair, and a genuinely new doc
    _docs(
        spark,
        [(10, GOOD, "en", "b"), (11, GOOD2, "en", "b"), (12, GOOD2, "fr", "b"), (13, GOOD2, "en", "b")],
    ).coalesce(1).write.mode("append").parquet(dirs["src"])
    run_corpus_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"], n_shards=4)
    got = {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()}
    # 10 is a cross-batch dup of 1; 13 loses the within-batch tie to 11;
    # 12 is non-english
    assert got == {1, 11}

    # the standing index retains one row per digest
    idx = spark.read.parquet(dirs["idx"])
    assert idx.count() == idx.select("digest").distinct().count() == 2

    # layout: the corpus carries the split/shard partition columns
    cols = set(read_corpus(spark, dirs["out"]).columns)
    assert {"split", "shard_id", "batch_id"} <= cols


def test_replayed_batch_is_idempotent(spark, dirs):
    batch = _docs(spark, [(1, GOOD, "en", "a"), (2, GOOD2, "en", "a")])
    ingest_batch(spark, batch, 0, dirs["out"], dirs["idx"], n_shards=4)
    before = sorted(r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect())
    # crash-replay: the SAME batch id runs again (e.g. checkpoint not yet
    # committed) — batch_id-directory overwrite keeps output identical
    ingest_batch(spark, batch, 0, dirs["out"], dirs["idx"], n_shards=4)
    after = sorted(r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect())
    assert before == after == [1, 2]
    idx = spark.read.parquet(dirs["idx"])
    assert idx.count() == 2


def test_stream_near_dedup_via_band_index(spark, dirs):
    """With near_dedup on, a later batch's NEAR-duplicate (not byte-equal,
    so the digest probe misses it) is dropped by the standing band index;
    within-batch near-dups keep the smallest doc_id."""
    near = " ".join(f"tok{i}" for i in range(29)) + " changed"  # ~0.87 Jaccard to GOOD
    # batch 1: the original + an unrelated doc
    _docs(spark, [(1, GOOD, "en", "a"), (2, GOOD2, "en", "a")]).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["src"])
    run_corpus_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"], n_shards=4, near_dedup=True)
    assert {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()} == {1, 2}

    # batch 2: a near-dup of doc 1 (different bytes), plus a within-batch
    # near-dup pair (21 vs 22 share text shape), plus a genuinely new doc
    other = " ".join(f"fresh{i}" for i in range(30))
    other_near = " ".join(f"fresh{i}" for i in range(29)) + " tweaked"
    _docs(
        spark,
        [(20, near, "en", "b"), (21, other, "en", "b"), (22, other_near, "en", "b")],
    ).coalesce(1).write.mode("append").parquet(dirs["src"])
    run_corpus_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"], n_shards=4, near_dedup=True)
    got = {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()}
    # 20 near-dups corpus doc 1 -> dropped; 22 near-dups batch-mate 21 -> dropped
    assert got == {1, 2, 21}
    # the band index only carries retained docs
    bidx = spark.read.parquet(dirs["out"] + "_band_index")
    assert set(r["doc_id"] for r in bidx.select("doc_id").distinct().collect()) == {1, 2, 21}


def test_backfill_and_stream_share_code(spark, dirs):
    """ingest_batch is the foreachBatch body AND the backfill entry —
    running it under spark.read produces the same corpus as the stream."""
    rows = [(1, GOOD, "en", "a"), (2, GOOD2, "en", "a"), (3, SHORT, "en", "a")]
    _docs(spark, rows).coalesce(1).write.mode("append").parquet(dirs["src"])
    ingest_batch(spark, spark.read.parquet(dirs["src"]), 0, dirs["out"], dirs["idx"])
    batch_ids = {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()}
    assert batch_ids == {1, 2}


def test_compact_indexes_preserves_probe_behavior(spark, dirs):
    """After folding per-batch index partitions into one segment, later
    batches still dedup against everything ingested before compaction."""
    import os

    b1 = _docs(spark, [(1, GOOD, "en", "a")])
    b2 = _docs(spark, [(2, GOOD2, "en", "a")])
    band_dir = dirs["out"] + "_band_index"
    ingest_batch(spark, b1, 0, dirs["out"], dirs["idx"], 4, band_dir)
    ingest_batch(spark, b2, 1, dirs["out"], dirs["idx"], 4, band_dir)
    compact_indexes(spark, dirs["out"])

    # one consolidated partition per index, no per-batch dirs left
    for d in (dirs["idx"], band_dir):
        parts = sorted(p for p in os.listdir(d) if p.startswith("batch_id="))
        assert parts == ["batch_id=-1"]

    # a post-compaction batch: exact dup of b1, near-dup of b2, one new doc
    near2 = " ".join(f"other{i}" for i in range(29)) + " tweaked"
    b3 = _docs(spark, [(10, GOOD, "en", "b"), (11, near2, "en", "b"), (12, "brand " + " ".join(f"new{i}" for i in range(29)), "en", "b")])
    ingest_batch(spark, b3, 2, dirs["out"], dirs["idx"], 4, band_dir)
    got = {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()}
    assert got == {1, 2, 12}


def test_null_text_rows_dropped_as_malformed(spark, dirs):
    """Streamed crawl rows with NULL text/lang must trip the 'malformed'
    rule — never fall through the CASE chain to 'keep' (NULL predicates
    are not-true) and never collapse onto one null digest."""
    from consensource_sds_spark.queries.extensions import with_filter_verdict

    batch = spark.createDataFrame(
        [(1, GOOD, "en", "a", len(GOOD)), (2, None, "en", "a", None), (3, GOOD2, None, "a", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    v = {r["doc_id"]: r["verdict"] for r in with_filter_verdict(batch).collect()}
    assert v == {1: "keep", 2: "malformed", 3: "malformed"}
    ingest_batch(spark, batch, 0, dirs["out"], dirs["idx"], n_shards=4)
    assert [r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()] == [1]
