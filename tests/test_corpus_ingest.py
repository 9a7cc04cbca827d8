"""Streaming corpus ingest: the x43 gates + incremental digest dedup run
continuously over a file stream; later batches never re-admit content the
standing index already retains, and replaying a batch is idempotent."""

from __future__ import annotations

import os

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


def _no_broadcast(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")


def _restore_broadcast(spark):
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def _probe_plans(spark, dirs, band_dir):
    """The two production probe joins (same shape as ingest_batch /
    _near_dedup), as executed-plan strings with broadcast disabled so the
    scale-path plan shape is what gets pinned."""
    from consensource_sds_spark.streaming.corpus_ingest import (
        band_index,
        band_values_packed,
        digest_index,
    )

    batch = _docs(spark, [(100, GOOD, "en", "z")]).withColumn("digest", F.md5("text"))
    dig_probe = batch.join(
        digest_index(spark, dirs["idx"]).select("digest"), "digest", "left_anti"
    )
    bands = band_values_packed(batch.select("doc_id", "text"))
    band_probe = bands.join(
        band_index(spark, band_dir).select(
            F.col("doc_id").alias("_di"), "band", "band_val"
        ),
        ["band", "band_val"],
    )
    return (
        dig_probe._jdf.queryExecution().executedPlan().toString(),
        band_probe._jdf.queryExecution().executedPlan().toString(),
    )


def _assert_index_side_in_place(plan: str):
    """The index side must be a bucketed in-place scan: no BroadcastExchange
    anywhere (the index is the O(corpus) side — broadcasting it is the
    r5 scale defect), and NO Exchange on the index scan's ancestor chain
    (the bucket layout satisfies the join's distribution; only the small
    batch side may shuffle — its internal band/digest prep shuffles are
    batch-sized and fine)."""
    import re

    assert "BroadcastExchange" not in plan, plan
    lines = plan.splitlines()
    scan_i = next(
        i for i, l in enumerate(lines) if "FileScan" in l and "corpus_index_" in l
    )
    assert "Bucketed: true" in lines[scan_i], plan

    def col(line: str) -> int:
        m = re.search(r"[+:]-", line)
        return m.start() if m else 0

    cur = col(lines[scan_i])
    ancestors = []
    for line in reversed(lines[:scan_i]):
        c = col(line)
        if c < cur:
            ancestors.append(line)
            cur = c
    assert not any("Exchange" in a for a in ancestors), plan


def test_probe_joins_never_shuffle_or_broadcast_the_index(spark, dirs):
    band_dir = dirs["out"] + "_band_index"
    for b, rows in enumerate([[(1, GOOD, "en", "a")], [(2, GOOD2, "en", "a")]]):
        ingest_batch(spark, _docs(spark, rows), b, dirs["out"], dirs["idx"], 4, band_dir)
    _no_broadcast(spark)
    try:
        dig_plan, band_plan = _probe_plans(spark, dirs, band_dir)
        _assert_index_side_in_place(dig_plan)
        _assert_index_side_in_place(band_plan)
    finally:
        _restore_broadcast(spark)


def test_compacted_indexes_stay_probe_compatible(spark, dirs):
    """compact_indexes rewrites THROUGH the bucketed table, so the
    consolidated segment keeps the clustering and post-compaction probes
    plan identically (no Exchange / no BroadcastExchange on the index)."""
    band_dir = dirs["out"] + "_band_index"
    for b, rows in enumerate([[(1, GOOD, "en", "a")], [(2, GOOD2, "en", "a")]]):
        ingest_batch(spark, _docs(spark, rows), b, dirs["out"], dirs["idx"], 4, band_dir)
    compact_indexes(spark, dirs["out"])
    _no_broadcast(spark)
    try:
        dig_plan, band_plan = _probe_plans(spark, dirs, band_dir)
        _assert_index_side_in_place(dig_plan)
        _assert_index_side_in_place(band_plan)
    finally:
        _restore_broadcast(spark)
    # and the fold emitted one file per bucket (repartition aligned 1:1)
    import os

    from consensource_sds_spark.streaming.corpus_ingest import _N_INDEX_BUCKETS

    seg = os.path.join(dirs["idx"], "batch_id=-1")
    files = [f for f in os.listdir(seg) if f.endswith(".parquet")]
    assert 0 < len(files) <= _N_INDEX_BUCKETS


def test_legacy_unbucketed_index_is_migrated(spark, dirs, tmp_path):
    """An index written by the pre-bucketing layout (plain parquet,
    batch_id dirs) is rewritten through the bucketed table on first touch —
    its rows still dedup later batches, and probes plan bucketed."""
    # write the OLD layout directly: md5(GOOD) retained as doc 1
    (
        spark.createDataFrame([(1,)], "keep_doc_id long")
        .select(F.md5(F.lit(GOOD)).alias("digest"), "keep_doc_id")
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(dirs["idx"])
    )
    from consensource_sds_spark.streaming.corpus_ingest import _legacy_unbucketed

    assert _legacy_unbucketed(dirs["idx"])
    # next batch: an exact dup of the legacy-retained text + one new doc
    batch = _docs(spark, [(10, GOOD, "en", "b"), (11, GOOD2, "en", "b")])
    ingest_batch(spark, batch, 1, dirs["out"], dirs["idx"], n_shards=4)
    got = {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()}
    assert got == {11}  # 10 deduped against the migrated legacy index
    assert not _legacy_unbucketed(dirs["idx"])  # files now bucket-suffixed
    idx = spark.read.parquet(dirs["idx"])
    assert {r["keep_doc_id"] for r in idx.collect()} == {1, 11}


def test_maybe_compact_indexes_policy(spark, dirs):
    """The threshold policy: under max_live_batches it is a listdir no-op;
    over it, one call folds the per-batch partitions and reads are
    unchanged."""
    import os

    from consensource_sds_spark.streaming.corpus_ingest import maybe_compact_indexes

    texts = [GOOD, GOOD2, " ".join(f"third{i}" for i in range(30))]
    for b, t in enumerate(texts):
        ingest_batch(spark, _docs(spark, [(b + 1, t, "en", "a")]), b, dirs["out"], dirs["idx"], 4)
    before = {tuple(r) for r in spark.read.parquet(dirs["idx"]).drop("batch_id").collect()}
    assert maybe_compact_indexes(spark, dirs["out"], max_live_batches=8) is False
    assert len([d for d in os.listdir(dirs["idx"]) if d.startswith("batch_id=")]) == 3
    assert maybe_compact_indexes(spark, dirs["out"], max_live_batches=2) is True
    assert [d for d in os.listdir(dirs["idx"]) if d.startswith("batch_id=")] == ["batch_id=-1"]
    after = {tuple(r) for r in spark.read.parquet(dirs["idx"]).drop("batch_id").collect()}
    assert before == after


def test_bloom_equivalence_and_fast_path(spark, dirs, tmp_path, monkeypatch):
    """The bloom sidecar must change COST, never the retained set: the
    same batch sequence ingested with bloom on and off keeps identical
    docs. Fast path pinned: an all-novel batch (no bloom candidates) never
    touches the digest-index table at all — digest_index() is not even
    called — while a batch with a real dup takes the candidate join."""
    from consensource_sds_spark.streaming import corpus_ingest as ci

    b1 = _docs(spark, [(1, GOOD, "en", "a")])
    b2 = _docs(spark, [(10, GOOD, "en", "b"), (11, GOOD2, "en", "b")])

    # bloom OFF reference run
    off = {"out": str(tmp_path / "off"), "idx": str(tmp_path / "off_digest_index")}
    ci.ingest_batch(spark, b1, 0, off["out"], off["idx"], n_shards=4, bloom_bits=None)
    ci.ingest_batch(spark, b2, 1, off["out"], off["idx"], n_shards=4, bloom_bits=None)
    expect = {r["doc_id"] for r in read_corpus(spark, off["out"]).collect()}

    calls = []
    real = ci.digest_index
    monkeypatch.setattr(ci, "digest_index", lambda *a, **k: calls.append(1) or real(*a, **k))

    # bloom ON: batch 0 is all-novel (empty bloom) -> zero digest_index
    # calls; batch 1 carries a true dup of GOOD -> candidate join runs
    ci.ingest_batch(spark, b1, 0, dirs["out"], dirs["idx"], n_shards=4)
    assert calls == [], "all-novel batch must skip the index probe entirely"
    ci.ingest_batch(spark, b2, 1, dirs["out"], dirs["idx"], n_shards=4)
    assert calls == [1], "dup-carrying batch must take the candidate join"
    got = {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()}
    assert got == expect == {1, 11}
    assert os.path.exists(os.path.join(dirs["idx"], "_bloom"))


def test_bloom_executor_path_equivalence(spark, dirs, tmp_path, monkeypatch):
    """Above ``_BLOOM_DRIVER_BATCH_CAP`` the digest probe must auto-switch
    to the executor-side path (fixed-size bitmap broadcast + vectorized
    probe; sidecar updated via an OR-reduced bitmap, no digest collect) —
    and retain EXACTLY the same content as the driver path. Forced here by
    dropping the cap to 0 so every batch takes the executor path; the
    sidecar must still end up a superset of the index (the invariant the
    next batch's fast path relies on)."""
    from consensource_sds_spark.functions.bloom import BloomSidecar
    from consensource_sds_spark.streaming import corpus_ingest as ci

    b1 = _docs(spark, [(1, GOOD, "en", "a")])
    b2 = _docs(spark, [(10, GOOD, "en", "b"), (11, GOOD2, "en", "b")])

    # driver-path reference run (default cap)
    ref = {"out": str(tmp_path / "ref"), "idx": str(tmp_path / "ref_digest_index")}
    ci.ingest_batch(spark, b1, 0, ref["out"], ref["idx"], n_shards=4)
    ci.ingest_batch(spark, b2, 1, ref["out"], ref["idx"], n_shards=4)
    expect = {r["doc_id"] for r in read_corpus(spark, ref["out"]).collect()}

    # executor path: no driver digest collect may happen
    monkeypatch.setattr(ci, "_BLOOM_DRIVER_BATCH_CAP", 0)
    collected = []
    real_candidates = BloomSidecar.candidates
    monkeypatch.setattr(
        BloomSidecar, "candidates", lambda self, d: collected.append(1) or real_candidates(self, d)
    )
    ci.ingest_batch(spark, b1, 0, dirs["out"], dirs["idx"], n_shards=4)
    ci.ingest_batch(spark, b2, 1, dirs["out"], dirs["idx"], n_shards=4)
    assert collected == [], "executor path must never run the driver-side probe"
    got = {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()}
    assert got == expect == {1, 11}

    # sidecar superset invariant survives the bitmap-update path
    sc = BloomSidecar(os.path.join(dirs["idx"], "_bloom"))
    digs = [r["digest"] for r in spark.read.parquet(dirs["idx"]).select("digest").collect()]
    assert real_candidates(sc, digs) == digs

    # and a LATER batch on the default cap interoperates with the
    # bitmap-built sidecar (dup of GOOD2 dropped, new doc kept)
    monkeypatch.setattr(ci, "_BLOOM_DRIVER_BATCH_CAP", 1_000_000)
    b3 = _docs(spark, [(20, GOOD2, "en", "c"), (21, " ".join(f"next{i}" for i in range(30)), "en", "c")])
    ci.ingest_batch(spark, b3, 2, dirs["out"], dirs["idx"], n_shards=4)
    got = {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()}
    assert got == {1, 11, 21}


def test_bloom_crash_between_sidecar_and_index_converges(spark, dirs, monkeypatch):
    """Crash injected AFTER the bloom update but BEFORE the index insert:
    the sidecar now holds digests the index lacks (the allowed superset
    direction). The replay sees its own digests as bloom CANDIDATES, the
    exact join clears them against the still-empty index, and the batch
    lands exactly once — no loss, no dup, invariant intact."""
    from consensource_sds_spark.streaming import corpus_ingest as ci

    real = ci._insert_index
    boom = {"armed": True}

    def failing(spark_, table, df):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash before index insert")
        return real(spark_, table, df)

    monkeypatch.setattr(ci, "_insert_index", failing)
    b = _docs(spark, [(1, GOOD, "en", "a")])
    with pytest.raises(RuntimeError, match="injected"):
        ci.ingest_batch(spark, b, 0, dirs["out"], dirs["idx"], n_shards=4)

    # replay (what the streaming checkpoint does)
    ci.ingest_batch(spark, b, 0, dirs["out"], dirs["idx"], n_shards=4)
    assert [r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()] == [1]
    idx = spark.read.parquet(dirs["idx"])
    assert {r["keep_doc_id"] for r in idx.collect()} == {1}

    # and the standing state still dedups the next batch
    ci.ingest_batch(spark, _docs(spark, [(5, GOOD, "en", "c")]), 1, dirs["out"], dirs["idx"], n_shards=4)
    assert {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()} == {1}


def test_crash_before_digest_insert_keeps_band_and_fp_postings(spark, dirs, monkeypatch):
    """The digest insert is the batch's COMMIT POINT and must come LAST:
    a crash after the band/fingerprint inserts but before the digest
    insert leaves a replay whose digest probe still misses, so the SAME
    `fresh` recomputes, the batch's own earlier band rows don't eject it
    (same-doc_id hits are ignored; co-retained batch docs share no bands),
    and every index converges with no loss and no duplicate postings.
    Were the digest insert first (the pre-r7 ordering), the replay's probe
    would filter the batch to empty and the band/fp postings of its
    retained docs would be lost PERMANENTLY — invisible to every later
    near-dup and containment probe."""
    from consensource_sds_spark.streaming import corpus_ingest as ci

    band_dir = dirs["out"] + "_band_index"
    fp_dir = dirs["out"] + "_fp_index"
    dig_tbl = ci._index_table_name(dirs["idx"])
    real = ci._insert_index
    boom = {"armed": True}

    def failing(spark_, table, df):
        if boom["armed"] and table == dig_tbl:
            boom["armed"] = False
            raise RuntimeError("injected crash at the digest commit point")
        return real(spark_, table, df)

    monkeypatch.setattr(ci, "_insert_index", failing)
    b = _docs(spark, [(1, GOOD, "en", "a"), (2, GOOD2, "en", "a")])
    with pytest.raises(RuntimeError, match="injected"):
        ci.ingest_batch(
            spark, b, 0, dirs["out"], dirs["idx"], n_shards=4,
            band_dir=band_dir, fingerprint_dir=fp_dir,
        )
    # the crash window left band/fp postings WITHOUT digest-index rows
    assert {r["doc_id"] for r in spark.read.parquet(band_dir).collect()} == {1, 2}
    assert not ci._index_has_files(dirs["idx"])

    # replay (what the streaming checkpoint does)
    ci.ingest_batch(
        spark, b, 0, dirs["out"], dirs["idx"], n_shards=4,
        band_dir=band_dir, fingerprint_dir=fp_dir,
    )
    assert sorted(r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()) == [1, 2]
    assert {r["keep_doc_id"] for r in spark.read.parquet(dirs["idx"]).collect()} == {1, 2}
    # band/fp postings present for BOTH retained docs, and exactly once
    # (the replay dynamic-overwrote its own batch partition, no dup rows)
    bidx = spark.read.parquet(band_dir)
    assert {r["doc_id"] for r in bidx.select("doc_id").distinct().collect()} == {1, 2}
    assert bidx.count() == bidx.distinct().count()
    fidx = spark.read.parquet(fp_dir)
    assert {r["doc_id"] for r in fidx.select("doc_id").distinct().collect()} == {1, 2}
    assert fidx.count() == fidx.distinct().count()

    # the standing state still dedups (exact AND near) the next batch
    near = " ".join(f"tok{i}" for i in range(29)) + " changed"
    ci.ingest_batch(
        spark, _docs(spark, [(5, GOOD, "en", "c"), (6, near, "en", "c")]),
        1, dirs["out"], dirs["idx"], n_shards=4,
        band_dir=band_dir, fingerprint_dir=fp_dir,
    )
    assert {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()} == {1, 2}


def test_bloom_missing_sidecar_rebuilds_from_index(spark, dirs):
    """A non-empty index with NO sidecar (pre-bloom store, or the file was
    deleted) must NOT start from an empty filter — that would claim every
    digest is new and re-admit duplicates. The ingest rebuilds from the
    index before probing."""
    from consensource_sds_spark.streaming import corpus_ingest as ci

    ci.ingest_batch(spark, _docs(spark, [(1, GOOD, "en", "a")]), 0, dirs["out"], dirs["idx"], n_shards=4)
    os.remove(os.path.join(dirs["idx"], "_bloom"))

    ci.ingest_batch(spark, _docs(spark, [(9, GOOD, "en", "b")]), 1, dirs["out"], dirs["idx"], n_shards=4)
    assert [r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()] == [1]
    # sidecar restored and covering the index again
    from consensource_sds_spark.functions.bloom import BloomSidecar

    sc = BloomSidecar(os.path.join(dirs["idx"], "_bloom"))
    digs = [r["digest"] for r in spark.read.parquet(dirs["idx"]).select("digest").collect()]
    assert sc.candidates(digs) == digs


def test_jsonl_source_with_quarantine(spark, dirs, tmp_path):
    """JSONL ingest: well-formed lines flow through the same gates as
    parquet; a malformed line and a line missing required fields land in
    the quarantine lane (with the raw text preserved for the malformed
    one) instead of failing the stream or silently vanishing."""
    src = tmp_path / "jsonl_in"
    src.mkdir()
    lines = [
        '{"doc_id": 1, "text": "%s", "lang": "en", "source": "a", "n_chars": 1}' % GOOD,
        '{"doc_id": 2, "text": "%s", "lang": "en", "source": "a", "n_chars": 1}' % SHORT,
        '{"doc_id": 3, "lang": "en", "source": "a", "n_chars": 1}',  # no text
        '{not json at all',  # malformed
    ]
    (src / "drop1.jsonl").write_text("\n".join(lines) + "\n")

    run_corpus_stream(
        spark, str(src), dirs["out"], dirs["ckpt"], n_shards=4, source_format="json"
    )
    # doc 1 retained, doc 2 filtered (too short), docs 3/malformed quarantined
    assert [r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()] == [1]
    q = spark.read.parquet(dirs["out"] + "_quarantine")
    rows = sorted(q.collect(), key=lambda r: (r["doc_id"] is None, r["doc_id"] or 0))
    assert len(rows) == 2
    assert rows[0]["doc_id"] == 3 and rows[0]["text"] is None
    assert rows[1]["doc_id"] is None and "{not json" in rows[1]["_corrupt_record"]


def test_auto_compact_stream(spark, dirs):
    """auto_compact on the stream: after each batch the threshold policy
    runs; with the threshold forced low the per-batch index partitions
    fold and later batches still dedup against the folded index."""
    from unittest.mock import patch

    from consensource_sds_spark.streaming import corpus_ingest as ci

    for i, (did, text) in enumerate([(1, GOOD), (2, GOOD2)]):
        _docs(spark, [(did, text, "en", "a")]).coalesce(1).write.mode("append").parquet(dirs["src"])
        with patch.object(ci, "maybe_compact_indexes", lambda s, o, max_live_batches=1: ci.compact_indexes(s, o)):
            run_corpus_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"], n_shards=4, auto_compact=True)
    # everything folded into the consolidated partition
    assert ci._live_batch_dirs(dirs["idx"]) == []
    # the folded index still dedups
    _docs(spark, [(30, GOOD, "en", "z")]).coalesce(1).write.mode("append").parquet(dirs["src"])
    run_corpus_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"], n_shards=4)
    assert {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()} == {1, 2}


def test_corpus_profile(spark, dirs):
    """The footer-only ops profile: rows/files/bytes per surface, live
    batch-partition counts, bloom fill — consistent with actual reads and
    produced with NO Spark job."""
    from consensource_sds_spark.streaming.corpus_ingest import corpus_profile

    _docs(spark, [(1, GOOD, "en", "a"), (2, GOOD2, "en", "a")]).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["src"])
    run_corpus_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"], n_shards=4, near_dedup=True)
    prof = {p["surface"]: p for p in corpus_profile(dirs["out"])}
    assert prof["corpus"]["n_rows"] == read_corpus(spark, dirs["out"]).count() == 2
    assert prof["digest_index"]["n_rows"] == 2
    assert prof["digest_index"]["n_live_batches"] == 1
    assert prof["digest_index"]["bloom_n_added"] == 2
    assert 0 < prof["digest_index"]["bloom_fill"] < 0.01  # ~14 bits of 2^24
    assert prof["band_index"]["n_rows"] > 0
    assert prof["corpus"]["n_bytes"] > 0 and prof["corpus"]["n_files"] > 0
    assert "quarantine" not in prof  # parquet source: no quarantine surface


def test_maybe_rebuild_bloom_policy(spark, dirs):
    """Under the fill threshold: a header-read no-op. Over it (forced by
    an artificially tiny sidecar): one call rebuilds from the index at
    grown size, preserving the superset contract — dedup still works."""
    from consensource_sds_spark.functions.bloom import BloomSidecar
    from consensource_sds_spark.streaming.corpus_ingest import (
        ingest_batch,
        maybe_rebuild_bloom,
    )

    ingest_batch(spark, _docs(spark, [(1, GOOD, "en", "a"), (2, GOOD2, "en", "a")]), 0, dirs["out"], dirs["idx"], n_shards=4)
    assert maybe_rebuild_bloom(spark, dirs["out"]) is False  # healthy fill

    # replace the sidecar with a saturated 64-bit toy covering the index
    bp = os.path.join(dirs["idx"], "_bloom")
    os.remove(bp)
    tiny = BloomSidecar(bp, m_bits=16)
    digs = [r["digest"] for r in spark.read.parquet(dirs["idx"]).select("digest").collect()]
    tiny.add_digests(digs * 5)
    assert tiny.fill_fraction() > 0.5

    assert maybe_rebuild_bloom(spark, dirs["out"]) is True
    re = BloomSidecar(bp)
    assert re.m_bits == 16 * 4 and re.candidates(digs) == digs
    assert maybe_rebuild_bloom(spark, dirs["out"]) is False  # healthy again
    # and the rebuilt sidecar still dedups the next batch
    ingest_batch(spark, _docs(spark, [(9, GOOD, "en", "z")]), 1, dirs["out"], dirs["idx"], n_shards=4)
    got = {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()}
    assert got == {1, 2}


def test_long_run_soak_policies_converge(spark, dirs):
    """A 12-batch run with dups, near-dups, replays, and all three
    maintenance policies firing (index compaction, bloom health check):
    the retained set is exactly the distinct, non-near-dup documents; the
    indexes fold to one consolidated partition and still dedup; the
    profile agrees with actual reads."""
    from consensource_sds_spark.streaming.corpus_ingest import (
        corpus_profile,
        ingest_batch,
        maybe_compact_indexes,
        maybe_rebuild_bloom,
    )

    texts = {i: " ".join(f"w{i}tok{j}" for j in range(30)) for i in range(6)}
    batches = []
    for b in range(12):
        doc_id = 100 * b
        if b % 3 == 0:
            rows = [(doc_id, texts[b % 6], "en", f"s{b}")]  # fresh or exact dup
        elif b % 3 == 1:
            # near-dup of an earlier text (one token changed)
            rows = [(doc_id, texts[(b - 1) % 6].replace("tok3", "CHANGED"), "en", f"s{b}")]
        else:
            rows = [(doc_id, texts[b % 6], "en", f"s{b}"), (doc_id + 1, texts[b % 6], "en", f"s{b}")]
        batches.append(rows)

    for b, rows in enumerate(batches):
        ingest_batch(spark, _docs(spark, rows), b, dirs["out"], dirs["idx"], n_shards=4,
                     band_dir=dirs["out"] + "_band_index")
        if b == 5:  # crash replay mid-run: same batch again
            ingest_batch(spark, _docs(spark, rows), b, dirs["out"], dirs["idx"], n_shards=4,
                         band_dir=dirs["out"] + "_band_index")
        maybe_compact_indexes(spark, dirs["out"], max_live_batches=4)
        maybe_rebuild_bloom(spark, dirs["out"])

    got = {r["doc_id"]: r["text"] for r in read_corpus(spark, dirs["out"]).collect()}
    # the schedule introduces t0/t2/t3/t5 as base texts (t1/t4 appear only
    # as near-dup variants); exact dups fold to the first carrier and
    # every variant is caught by the band probe — the retained set is
    # EXACTLY the four first carriers
    assert got == {0: texts[0], 200: texts[2], 300: texts[3], 500: texts[5]}
    # compaction kept at most 4 live batch partitions per index
    from consensource_sds_spark.streaming.corpus_ingest import _live_batch_dirs

    assert len(_live_batch_dirs(dirs["idx"])) <= 4
    # profile rows agree with reads
    prof = {p["surface"]: p for p in corpus_profile(dirs["out"])}
    assert prof["corpus"]["n_rows"] == len(got)
    assert prof["digest_index"]["n_rows"] == spark.read.parquet(dirs["idx"]).count()
    assert prof["digest_index"]["bloom_fill"] < 0.5
    # and the standing state still dedups: replaying the four RETAINED
    # texts admits nothing, while never-retained t1 (novel bands, novel
    # digest) is correctly admitted
    replay = [(9999 + i, texts[k], "en", "zz") for i, k in enumerate((0, 2, 3, 5))]
    replay.append((9990, texts[1], "en", "zz"))
    ingest_batch(spark, _docs(spark, replay), 99, dirs["out"], dirs["idx"], n_shards=4,
                 band_dir=dirs["out"] + "_band_index")
    after = {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()}
    assert not any(d >= 9999 for d in after)
    assert 9990 in after


def test_containment_index_and_probe(spark, dirs, tmp_path):
    """The standing fingerprint index: a retained doc's winnowed postings
    persist; a later batch QUOTING a chunk of it scores high containment
    (the doc-in-doc case band-level near-dedup misses); a replayed batch
    never reports itself; compaction folds the index without changing
    probe answers."""
    from consensource_sds_spark.streaming.corpus_ingest import (
        compact_indexes,
        ingest_batch,
        probe_containment,
    )

    fp_dir = dirs["out"] + "_fp_index"
    base = " ".join(f"tok{i}" for i in range(40))
    ingest_batch(spark, _docs(spark, [(1, base, "en", "a")]), 0, dirs["out"], dirs["idx"],
                 n_shards=4, fingerprint_dir=fp_dir)

    # newcomer: half of doc 1's text + novel tail -> high containment hit
    quoter = " ".join(f"tok{i}" for i in range(20)) + " " + " ".join(f"new{i}" for i in range(20))
    hits = probe_containment(spark, _docs(spark, [(50, quoter, "en", "b")]), fp_dir).collect()
    assert len(hits) == 1
    h = hits[0]
    assert (h["new_doc_id"], h["corpus_doc_id"]) == (50, 1)
    assert h["shared"] >= 5 and 0.2 <= h["containment"] <= 0.8

    # a fully-novel doc reports nothing
    novel = " ".join(f"zzz{i}" for i in range(40))
    assert probe_containment(spark, _docs(spark, [(60, novel, "en", "b")]), fp_dir).count() == 0

    # replay shape: the SAME retained doc probes -> same-id hits ignored
    assert probe_containment(spark, _docs(spark, [(1, base, "en", "a")]), fp_dir).count() == 0

    # compaction folds the fp index and the probe answer is unchanged
    before = sorted((r["new_doc_id"], r["corpus_doc_id"], r["shared"])
                    for r in probe_containment(spark, _docs(spark, [(50, quoter, "en", "b")]), fp_dir).collect())
    compact_indexes(spark, dirs["out"])
    from consensource_sds_spark.streaming.corpus_ingest import _live_batch_dirs

    assert _live_batch_dirs(fp_dir) == []
    after = sorted((r["new_doc_id"], r["corpus_doc_id"], r["shared"])
                   for r in probe_containment(spark, _docs(spark, [(50, quoter, "en", "b")]), fp_dir).collect())
    assert after == before


def test_stream_with_containment_index(spark, dirs):
    """containment_index=True on the stream maintains the fp index for
    retained docs end to end, and the profile reports it."""
    from consensource_sds_spark.streaming.corpus_ingest import corpus_profile

    _docs(spark, [(1, GOOD, "en", "a")]).coalesce(1).write.mode("append").parquet(dirs["src"])
    run_corpus_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"], n_shards=4,
                      containment_index=True)
    fp = spark.read.parquet(dirs["out"] + "_fp_index")
    assert fp.count() > 0 and {r["doc_id"] for r in fp.collect()} == {1}
    prof = {p["surface"]: p for p in corpus_profile(dirs["out"])}
    assert prof["fp_index"]["n_rows"] == fp.count()
    assert prof["fp_index"]["n_live_batches"] == 1


def test_ingest_gopher_rules_gate(spark, tmp_path):
    """gopher_rules activates the x80 gate inside the streaming ingest:
    docs failing an active rule never reach the corpus or the digest
    index, and the gate agrees with the batch build's with_gopher_verdict
    (shared expressions)."""
    from consensource_sds_spark.queries.extensions import with_gopher_verdict

    out = str(tmp_path / "corpus")
    idx = out + "_digest_index"
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    active = ("word_count", "mean_word_len")
    ingest_batch(spark, docs, 0, out, idx, n_shards=4, gopher_rules=active)
    got_ids = {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()}
    # every retained doc passes the active rules on its (unmodified) text
    v = with_gopher_verdict(docs, rules=active)
    failing = {r["doc_id"] for r in v.filter(F.col("gopher_verdict") != "keep").collect()}
    assert got_ids and not (got_ids & failing)
    # and the gate actually dropped something beyond the x43 filter
    base_out = str(tmp_path / "corpus_nogate")
    ingest_batch(spark, docs, 0, base_out, base_out + "_digest_index", n_shards=4)
    base_ids = {r["doc_id"] for r in spark.read.parquet(base_out).select("doc_id").collect()}
    assert got_ids < base_ids
    from consensource_sds_spark.streaming import corpus_ingest as ci

    spark.sql(f"DROP TABLE IF EXISTS {ci._index_table_name(idx)}")
    spark.sql(f"DROP TABLE IF EXISTS {ci._index_table_name(base_out + '_digest_index')}")


def test_migration_crash_after_legacy_removed_recovers_from_aside(spark, dirs):
    """Write-aside-then-swap crash pin: a migration that died AFTER the
    legacy dir was removed (the old code's permanent-data-loss window —
    localCheckpoint blocks are not durable) must recover the index from
    the completed aside copy and keep deduping against it."""
    import shutil

    # legacy layout on disk: md5(GOOD) retained as doc 1
    (
        spark.createDataFrame([(1,)], "keep_doc_id long")
        .select(F.md5(F.lit(GOOD)).alias("digest"), "keep_doc_id")
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(dirs["idx"])
    )
    # simulate the migration up to the crash: aside copy complete
    # (_SUCCESS landed), legacy dir gone, bucketed rewrite never ran
    aside = os.path.abspath(dirs["idx"]) + ".migrating"
    spark.read.parquet(dirs["idx"]).write.parquet(aside)
    assert os.path.isfile(os.path.join(aside, "_SUCCESS"))
    shutil.rmtree(dirs["idx"])

    batch = _docs(spark, [(10, GOOD, "en", "b"), (11, GOOD2, "en", "b")])
    ingest_batch(spark, batch, 1, dirs["out"], dirs["idx"], n_shards=4)
    got = {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()}
    assert got == {11}  # 10 deduped against the aside-recovered index
    idx = spark.read.parquet(dirs["idx"])
    assert {r["keep_doc_id"] for r in idx.collect()} == {1, 11}
    assert not os.path.isdir(aside)  # migration committed, aside reclaimed


def test_null_doc_id_never_enters_pipeline_without_quarantine(spark, dirs):
    """The W5 contract holds with quarantine OFF: a NULL doc_id row
    duplicating a real doc must not win the within-batch digest collapse
    (ascending orderBy ranks NULLs first) and eject the real doc, nor
    plant NULL keep_doc_id rows in the standing index."""
    batch = spark.createDataFrame(
        [(None, GOOD, "en", "a", len(GOOD)), (1, GOOD, "en", "a", len(GOOD)), (2, GOOD2, "en", "a", len(GOOD2))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    ingest_batch(spark, batch, 0, dirs["out"], dirs["idx"], n_shards=4)
    kept = read_corpus(spark, dirs["out"]).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2]  # the real doc won
    idx = spark.read.parquet(dirs["idx"])
    assert idx.filter(F.col("keep_doc_id").isNull()).count() == 0
    assert {r["keep_doc_id"] for r in idx.collect()} == {1, 2}


def test_containment_probe_agnostic_to_duplicated_postings(spark, dirs, tmp_path):
    """An interrupted compaction (consolidated insert landed, per-batch
    partition drops didn't) leaves every fp posting duplicated; the
    containment COUNT must not double `shared` or push containment past
    1.0 — reads stay correct until the next compaction converges."""
    from consensource_sds_spark.streaming.corpus_ingest import (
        _insert_index,
        _index_table_name,
        probe_containment,
    )

    fp_dir = str(tmp_path / "corpus_fp_index")
    base = " ".join(f"tok{i}" for i in range(40))
    ingest_batch(
        spark,
        _docs(spark, [(1, base, "en", "a")]),
        0,
        dirs["out"],
        dirs["idx"],
        n_shards=4,
        fingerprint_dir=fp_dir,
    )
    quoter = base + " plus novel tail content here"
    before = {
        (r["corpus_doc_id"], r["shared"], r["containment"])
        for r in probe_containment(spark, _docs(spark, [(9, quoter, "en", "b")]), fp_dir).collect()
    }
    assert before, "probe must hit the quoted corpus doc"
    # simulate the crash window: the same postings duplicated under the
    # consolidated batch_id=-1 partition
    name = _index_table_name(fp_dir)
    dup = spark.table(name).select("doc_id", "fp_hash", F.lit(-1).cast("int").alias("batch_id"))
    _insert_index(spark, name, dup)
    after = {
        (r["corpus_doc_id"], r["shared"], r["containment"])
        for r in probe_containment(spark, _docs(spark, [(9, quoter, "en", "b")]), fp_dir).collect()
    }
    assert after == before
    assert all(c <= 1.0 for (_d, _s, c) in after)


@pytest.mark.slow
def test_hundred_batch_soak_bounds_hold(spark, dirs):
    """Long-horizon standing-index soak: ~100 microbatches of synth docs
    through the full surface (gates, bloom-probed exact dedup, band
    near-dedup, fingerprint postings) with the maintenance policies on
    their production cadence. Every per-batch claim in this module is
    pinned per batch; this test pins the UNBOUNDED-HORIZON behavior no
    single-batch test can see:

    (a) segment bounds — live batch-partition count per index and total
        index file count stay bounded under ``maybe_compact_indexes``
        (without the policy they grow linearly, one segment per batch);
    (b) per-batch wall-clock does not drift upward — the late-run median
        stays within 2x of the early-run median (an O(corpus) term in
        the probe path would compound ~10x over the run);
    (c) the bloom sidecar's fill-fraction policy FIRES: a deliberately
        tiny initial bitmap crosses max_fill mid-run and
        ``maybe_rebuild_bloom`` rebuilds it at growth x the bits.

    Ends with the standing-state invariants: retained digests unique and
    a full-corpus replay admits nothing."""
    import statistics
    import time

    from consensource_sds_spark.functions.bloom import BloomSidecar
    from consensource_sds_spark.sources.synth import generate_documents
    from consensource_sds_spark.streaming.corpus_ingest import (
        _live_batch_dirs,
        digest_index,
        maybe_compact_indexes,
        maybe_rebuild_bloom,
    )

    n_batches, per_batch = 100, 10
    docs = generate_documents(spark, n_batches * per_batch).localCheckpoint()
    band = dirs["out"] + "_band_index"
    fp = dirs["out"] + "_fp_index"
    times, rebuilds = [], 0
    for b in range(n_batches):
        lo, hi = b * per_batch, (b + 1) * per_batch
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        t0 = time.perf_counter()
        ingest_batch(
            spark, batch, b, dirs["out"], dirs["idx"], n_shards=4,
            band_dir=band, fingerprint_dir=fp, bloom_bits=1 << 12,
        )
        maybe_compact_indexes(spark, dirs["out"], max_live_batches=8)
        rebuilds += bool(maybe_rebuild_bloom(spark, dirs["out"]))
        times.append(time.perf_counter() - t0)

    # (a) compaction held every index to its live-segment bound
    for d in (dirs["idx"], band, fp):
        assert len(_live_batch_dirs(d)) <= 8, d
    n_files = sum(
        1 for r, _, fs in os.walk(dirs["idx"]) for f in fs if f.endswith(".parquet")
    )
    # <= (8 live + 1 consolidated + 1 in-flight) partitions x 4 buckets,
    # plus slack; without compaction this is ~100 partitions x 4
    assert n_files <= 60, n_files

    # (b) no upward wall-clock drift: compare noise-robust window medians
    # (each window spans several compaction cycles, so the cadence cost
    # lands in both)
    early = statistics.median(times[10:30])
    late = statistics.median(times[-20:])
    print(
        f"soak: {n_batches} batches, early median {early:.3f}s, "
        f"late median {late:.3f}s, drift {late / early:.2f}x, "
        f"bloom rebuilds {rebuilds}"
    )
    assert late <= 2.0 * early, f"per-batch drift: early {early:.2f}s -> late {late:.2f}s"

    # (c) the fill-fraction policy fired and grew the bitmap
    assert rebuilds >= 1
    hdr = BloomSidecar.read_header(os.path.join(os.path.abspath(dirs["idx"]), "_bloom"))
    assert hdr["m"] > (1 << 12)

    # standing-state invariants after 100 batches
    idx_df = digest_index(spark, dirs["idx"])
    assert idx_df.count() == idx_df.select("digest").distinct().count()
    before = read_corpus(spark, dirs["out"]).count()
    ingest_batch(
        spark, docs, 999, dirs["out"], dirs["idx"], n_shards=4,
        band_dir=band, fingerprint_dir=fp, bloom_bits=1 << 12,
    )
    assert read_corpus(spark, dirs["out"]).count() == before


def test_band_index_v1_migrates_to_packed_layout(spark, dirs, tmp_path):
    """r12 layout bump: a v1 band index (band_val STRING "h0|h1") is
    migrated to the packed-BIGINT v2 layout on first open — same retained
    docs before and after, version sidecar stamped, future versions
    rejected loudly."""
    import json

    from consensource_sds_spark.queries.extensions import minhash_band_values
    from consensource_sds_spark.streaming.corpus_ingest import (
        _BAND_LAYOUT_VERSION,
        _band_layout_path,
        _index_table_name,
        _N_INDEX_BUCKETS,
        CorpusIndexLayoutError,
        band_index,
        band_values_packed,
        ingest_batch,
        read_corpus,
    )

    band_dir = str(tmp_path / "band_v1")
    # build a BUCKETED v1 index exactly as the pre-r12 module would have:
    # v1 DDL (band_val STRING) + dynamic-overwrite insert of string rows
    name = _index_table_name(band_dir)
    spark.sql(
        f"""CREATE TABLE {name} (doc_id BIGINT, band INT, band_val STRING, batch_id INT)
            USING PARQUET PARTITIONED BY (batch_id)
            CLUSTERED BY (band, band_val) SORTED BY (band, band_val)
            INTO {_N_INDEX_BUCKETS} BUCKETS
            LOCATION '{band_dir}'"""
    )
    seed_docs = _docs(spark, [(1, GOOD, "en", "a"), (2, GOOD2, "en", "a")])
    v1_rows = minhash_band_values(seed_docs.select("doc_id", "text")).select(
        "doc_id", "band", "band_val", F.lit(0).cast("int").alias("batch_id")
    )
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        v1_rows.write.mode("overwrite").insertInto(name)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)

    # first open migrates: schema is BIGINT, rows equal the packed frame
    idx = band_index(spark, band_dir)
    assert dict(idx.dtypes)["band_val"] == "bigint"
    expect = {
        (r["doc_id"], r["band"], r["band_val"])
        for r in band_values_packed(seed_docs.select("doc_id", "text")).collect()
    }
    got = {(r["doc_id"], r["band"], r["band_val"]) for r in idx.collect()}
    assert got == expect and len(got) > 0
    with open(_band_layout_path(band_dir)) as f:
        assert json.load(f)["version"] == _BAND_LAYOUT_VERSION
    # reopen is a no-op (idempotent), and the migrated index still DROPS a
    # cross-batch near-duplicate through the normal ingest path
    assert band_index(spark, band_dir).count() == len(expect)
    batch = _docs(
        spark, [(10, GOOD, "en", "b"), (11, " ".join(f"fresh{i}" for i in range(30)), "en", "b")]
    )
    ingest_batch(spark, batch, 1, dirs["out"], dirs["idx"], n_shards=4, band_dir=band_dir)
    kept = {r["doc_id"] for r in read_corpus(spark, dirs["out"]).collect()}
    assert 10 not in kept and 11 in kept  # 10 is a near-dup of retained doc 1

    # forward-compat: a future layout version refuses to open
    with open(_band_layout_path(band_dir), "w") as f:
        json.dump({"version": _BAND_LAYOUT_VERSION + 1}, f)
    with pytest.raises(CorpusIndexLayoutError):
        band_index(spark, band_dir)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
