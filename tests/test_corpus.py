"""End-to-end corpus build: the composed pipeline writes the sharded
layout, survivors satisfy every stage's own invariant, and the audit
trail accounts for every dropped document exactly once."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import consensource_sds_spark.corpus as corpus_mod
from consensource_sds_spark.corpus import _near_dedup_survivors, build_training_corpus
from consensource_sds_spark.queries import load

SF = "/root/testdata/sf0.001"


def test_near_dedup_keeps_surviving_representative(spark):
    """A cluster whose global-minimum doc was dropped upstream must still
    keep one representative (the smallest SURVIVING member), not vanish."""
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 9)], "doc_id long, cluster_id long"
    )
    # doc 1 (the global cluster-1 minimum) was dropped by an earlier stage
    alive = spark.createDataFrame([(2,), (3,), (7,)], "doc_id long")
    out = sorted(r["doc_id"] for r in _near_dedup_survivors(alive, clusters).collect())
    assert out == [2, 7]  # cluster 1 keeps 2 (not empty); singleton 7 stays


def test_stages_computed_once(spark, tmp_path, monkeypatch):
    """The scrub, filter, and cluster stages are full-corpus passes; the
    build must invoke each exactly once (staging parquet serves every
    downstream use, including the audit)."""
    calls = {"scrub": 0, "verdict": 0, "clusters": 0}
    reals = {
        "scrub": corpus_mod.scrub_boilerplate,
        "verdict": corpus_mod.with_filter_verdict,
        "clusters": corpus_mod.near_dup_clusters,
    }

    def counting(name):
        def f(df):
            calls[name] += 1
            return reals[name](df)

        return f

    monkeypatch.setattr(corpus_mod, "scrub_boilerplate", counting("scrub"))
    monkeypatch.setattr(corpus_mod, "with_filter_verdict", counting("verdict"))
    monkeypatch.setattr(corpus_mod, "near_dup_clusters", counting("clusters"))
    stats = build_training_corpus(spark, SF, str(tmp_path / "c"), domain_cap=5, n_shards=2)
    stats.collect()  # drive the audit branch too
    assert calls == {"scrub": 1, "verdict": 1, "clusters": 1}


def test_build_training_corpus(spark, tmp_path):
    out = str(tmp_path / "corpus")
    stats = build_training_corpus(spark, SF, out, domain_cap=5, n_shards=4)

    written = spark.read.parquet(out)
    n_total = load(spark, SF, "documents").count()
    n_kept = written.count()
    dropped = {(r["stage"], r["reason"]): r["n_dropped"] for r in stats.collect()}
    # conservation: every doc either survives or is attributed to one stage
    assert n_kept + sum(dropped.values()) == n_total
    assert n_kept > 0

    # layout: split=*/shard_id=* directories, shard ids within range
    splits = {d.split("=")[1] for d in os.listdir(out) if d.startswith("split=")}
    assert splits <= {"train", "val", "test"} and "train" in splits
    shard_ids = {r["shard_id"] for r in written.select("shard_id").distinct().collect()}
    assert shard_ids <= set(range(4))

    # stage invariants on the survivors
    surv = written
    # exact dedup: content digests unique
    assert surv.groupBy(F.md5("text")).count().filter("count > 1").count() == 0
    # domain cap respected
    per_src = surv.groupBy("source").count().agg(F.max("count")).first()[0]
    assert per_src <= 5
    # filter rules: no shorties survive (x43's cheapest gate)
    assert surv.filter(F.expr("size(split(text,' ')) < 20")).count() == 0

    # deterministic: same input -> identical survivor set and shards
    out2 = str(tmp_path / "corpus2")
    build_training_corpus(spark, SF, out2, domain_cap=5, n_shards=4)
    a = sorted(r["doc_id"] for r in written.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in spark.read.parquet(out2).select("doc_id").collect())
    assert a == b


def test_build_with_substring_scrub(spark, tmp_path):
    """The optional exact-substring stage: every cross-doc W-token run
    keeps one canonical copy — so the SURVIVORS' texts share no window —
    the per-doc loss is accounted in n_substr_removed, and the rest of
    the pipeline (filters, dedups, cap, layout) behaves as before."""
    from consensource_sds_spark.queries.extensions import _X76_W

    out = str(tmp_path / "corpus_ss")
    stats = build_training_corpus(
        spark, SF, out, domain_cap=50, n_shards=4, substring_scrub=True
    )
    stats.collect()
    surv = spark.read.parquet(out)
    assert "n_substr_removed" in surv.columns
    # in THIS pipeline the boilerplate scrub runs first and already eats
    # the corpus's repeated passages, so the substring stage may see
    # nothing left — the cut's bite is proven on the RAW text instead,
    # where the testdata's shared runs are plentiful
    from consensource_sds_spark.queries.extensions import exact_substring_scrub

    raw_cut = exact_substring_scrub(load(spark, SF, "documents").select("doc_id", "text"))
    assert raw_cut.agg(F.sum("n_removed")).first()[0] > 0
    # post-cut invariant: no W-token window appears in two surviving docs
    win = (
        surv.select("doc_id", F.split("text", " ").alias("ts"))
        .filter(F.size("ts") >= _X76_W)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ts) - {_X76_W} + 1),"
                    f" i -> md5(concat_ws(' ', slice(ts, i, {_X76_W}))))"
                )
            ).alias("h"),
        )
        .distinct()
    )
    cross = win.groupBy("h").agg(F.count_distinct("doc_id").alias("nd")).filter("nd > 1")
    assert cross.count() == 0
    # exact dedup still holds on the post-cut text
    assert surv.groupBy(F.md5("text")).count().filter("count > 1").count() == 0


def test_build_with_gopher_gate(spark, tmp_path):
    """gopher_gate drops x80-failing docs between the x43 filter and
    exact dedup, with per-rule attribution: conservation still holds,
    every survivor passes the full rule set, and each gopher drop reason
    is a real rule name."""
    from consensource_sds_spark.queries.extensions import (
        with_gopher_verdict,
        x80_gopher_quality_rules,
    )

    # the stopword rule presumes English prose and would annihilate this
    # synthetic-vocabulary corpus (zero survivors) — exactly the tuning
    # case the rules= knob exists for
    active = ("word_count", "mean_word_len", "symbol_ratio", "alpha_word_frac")
    out = str(tmp_path / "corpus_g")
    stats = build_training_corpus(
        spark, SF, out, domain_cap=5, n_shards=4, gopher_gate=True, gopher_rules=active
    )
    written = spark.read.parquet(out)
    assert written.count() > 0
    n_total = load(spark, SF, "documents").count()
    dropped = {(r["stage"], r["reason"]): r["n_dropped"] for r in stats.collect()}
    assert written.count() + sum(dropped.values()) == n_total
    gop = {r: n for (s, r), n in dropped.items() if s == "gopher_gate"}
    assert gop, "the gate dropped nothing on this corpus — vacuous test"
    assert set(gop) <= set(active) | {"malformed"}
    # survivors pass every ACTIVE rule (check against the registry entry's
    # flags: the gate and x80 must agree — shared expressions, pinned here)
    flags = x80_gopher_quality_rules(spark, SF).filter(
        ~(
            F.col("word_count_ok") & F.col("mean_word_len_ok")
            & F.col("symbol_ratio_ok") & F.col("alpha_word_frac_ok")
        )
    )
    bad = written.join(flags.select("doc_id"), "doc_id", "left_semi").count()
    assert bad == 0
    # verdict helper: first-tripped-rule attribution, NULL text -> malformed
    d = spark.createDataFrame(
        [(1, None), (2, "a " * 60)], "doc_id long, text string"
    )
    v = {r["doc_id"]: r["gopher_verdict"] for r in with_gopher_verdict(d).collect()}
    assert v[1] == "malformed"
    assert v[2] == "mean_word_len"  # 60 words of len 1: word_count passes first


def test_clusters_built_over_alive_docs_only(spark, tmp_path):
    """The LSH cluster map must cover only docs alive after the filter +
    exact-dedup stages: clustering the full corpus would let a
    filter-rejected doc transitively bridge two dissimilar survivors
    into one cluster (wrongly deleting one) — and pays the most
    expensive stage over the rejected majority."""
    out = str(tmp_path / "corpus")
    build_training_corpus(spark, SF, out, domain_cap=50, n_shards=4)
    clean = spark.read.parquet(str(tmp_path / "corpus_staging" / "clean"))
    dropped = {r["doc_id"] for r in clean.filter("verdict != 'keep'").collect()}
    assert dropped, "fixture corpus must have filter-dropped docs"
    clustered = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "corpus_staging" / "clusters")).collect()
    }
    assert not (clustered & dropped)


def test_files_per_shard_raises_write_parallelism(spark, tmp_path):
    """files_per_shard > 1 salts the shard repartition: each
    split=*/shard_id=* directory gets multiple co-located files (write
    parallelism no longer capped at 3 x n_shards tasks) with the SAME
    rows as the one-file layout."""
    from consensource_sds_spark.sources.dataset_writer import write_training_shards

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )
    one, many = str(tmp_path / "one"), str(tmp_path / "many")
    write_training_shards(df, one, n_shards=2)
    write_training_shards(df, many, n_shards=2, files_per_shard=4)
    a = sorted(r["doc_id"] for r in spark.read.parquet(one).collect())
    b = sorted(r["doc_id"] for r in spark.read.parquet(many).collect())
    assert a == b
    train0 = os.path.join(many, "split=train", "shard_id=0")
    files = [f for f in os.listdir(train0) if f.endswith(".parquet")]
    assert len(files) > 1


def test_duplicated_content_keeps_one_copy(spark, tmp_path):
    """Regression: with the scrub BEFORE exact dedup, byte-exact duplicate
    docs shared every chunk, so the boilerplate scrub emptied ALL copies
    and the corpus kept ZERO copies of that content (C4 keeps one). Exact
    dedup now runs first on the raw text: exactly one full copy survives."""
    body = " ".join(f"unique{i}" for i in range(40))
    other = " ".join(f"filler{i}" for i in range(40))
    rows = [
        (1, body, "en", "a", len(body)),
        (2, body, "en", "a", len(body)),   # byte-exact duplicate
        (3, body, "en", "b", len(body)),   # and a third copy
        (4, other, "en", "b", len(other)), # unrelated control
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    out = str(tmp_path / "corpus")
    stats = build_training_corpus(spark, sf, out, domain_cap=50, n_shards=2)
    surv = spark.read.parquet(out)
    kept = {r["doc_id"]: r["text"] for r in surv.collect()}
    # one copy of the duplicated content survives, with its text INTACT
    assert 1 in kept and kept[1] == body
    assert 2 not in kept and 3 not in kept
    assert 4 in kept and kept[4] == other
    dropped = {(r["stage"], r["reason"]): r["n_dropped"] for r in stats.collect()}
    assert dropped[("exact_dedup", "exact_dedup")] == 2
    assert len(kept) + sum(dropped.values()) == 4


def test_null_text_doc_attributed_malformed_not_lost(spark, tmp_path):
    """Regression: a NULL-text doc produced no scrub row and the inner
    join deleted it BEFORE the filter could stamp 'malformed' — the audit
    conservation (kept + dropped == total) silently broke. It must now be
    attributed, and conservation must hold."""
    good = " ".join(f"tok{i}" for i in range(40))
    rows = [
        (1, good, "en", "a", len(good)),
        (2, None, "en", "a", 0),
    ]
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(sf, "documents.parquet"))
    out = str(tmp_path / "corpus")
    stats = build_training_corpus(spark, sf, out, domain_cap=50, n_shards=2)
    dropped = {(r["stage"], r["reason"]): r["n_dropped"] for r in stats.collect()}
    n_kept = spark.read.parquet(out).count()
    assert n_kept + sum(dropped.values()) == 2
    assert dropped.get(("filter", "malformed")) == 1


def test_gopher_rules_without_gate_raises(spark, tmp_path):
    """Regression: gopher_rules with gopher_gate=False was silently
    ignored — the corpus shipped ungated while the caller believed the
    rules applied."""
    import pytest

    with pytest.raises(ValueError, match="gopher_gate"):
        build_training_corpus(
            spark, SF, str(tmp_path / "c"), gopher_rules=("word_count",)
        )
