"""Scaling-curve pin: the dedup/ingest/ANN family must grow ~linearly.

Plan pins (tests/test_plans.py, test_corpus_ingest.py) prove probes are
index-shaped; this suite MEASURES the growth curve on a self-generated
1x-vs-10x corpus and fails on any superlinear blowup — the failure mode
plan structure can't catch (candidate-pair explosion when dup clusters
chain, a driver collect that grows with the corpus, a stage re-scanning
its input per partition)."""

from __future__ import annotations

from pyspark.sql import functions as F

from consensource_sds_spark.scaling import measure_scaling, scaled_shuffle_partitions
from consensource_sds_spark.sources.synth import generate_documents, generate_embeddings

FACTOR = 10
#: one-sided bound: fixed per-job overhead keeps honest ratios well UNDER
#: the data ratio at test scale; 1.5x headroom absorbs host CPU steal.
#: A quadratic stage would land at ~FACTOR^2 x overhead-damping — far over.
RATIO_BOUND = FACTOR * 1.5
#: the deep-scale point for the steepest stages (x76/x77 substring,
#: x07 SimHash banding, x65 SemDeDup pairs, batched BPE training): same
#: 1.5x headroom at 30x. A quadratic term that hid inside the 10x
#: ratio's overhead damping lands near 900x here — unmissable (the r9
#: x07 point measured 45.2 under the old 8-bit bands; 2.8 after the
#: Manku-key rework).
DEEP_FACTOR = 30
DEEP_RATIO_BOUND = DEEP_FACTOR * 1.5


def test_scaled_shuffle_partitions_derivation(spark, monkeypatch):
    """The scaling harness's reduce parallelism derives from input rows
    (guide §2.2), clamped [session default, 4x parallelism] and
    env-parameterized for cluster row widths — never a constant tuned to
    one scale. The test session runs local[4]/partitions=4, so the clamp
    arithmetic is exact here."""
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    hi = 4 * spark.sparkContext.defaultParallelism
    monkeypatch.delenv("SPARK_GRAFT_ROWS_PER_SHUFFLE_PARTITION", raising=False)
    # toy floor: small corpora keep the session's latency-tuned default
    assert scaled_shuffle_partitions(spark, 5_000) == sess
    # scaled corpora: one partition per 5k generator rows
    assert scaled_shuffle_partitions(spark, 5_000 * 30) == max(sess, min(30, hi))
    # ceiling: the derivation never shatters a stage past 4x the cores
    assert scaled_shuffle_partitions(spark, 10_000_000) == hi
    # cluster parameterization: bigger rows-per-partition, fewer partitions
    monkeypatch.setenv("SPARK_GRAFT_ROWS_PER_SHUFFLE_PARTITION", "75000")
    assert scaled_shuffle_partitions(spark, 150_000) == max(sess, 2)


def test_generator_structure(spark):
    """The generator's planted structure holds at any n — RATES constant,
    so cross-scale comparisons measure the engine, not drifting data."""
    n = 4000
    d = generate_documents(spark, n).cache()
    assert d.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert d.count() == n
    n_distinct = d.select("text").distinct().count()
    # ~10% exact dups + ~2% near-dups (near texts differ, so distinct
    # drops by the exact-dup fraction only)
    assert 0.85 * n <= n_distinct <= 0.95 * n
    hot = d.filter("source = 'src0'").count() / n
    assert 0.2 <= hot <= 0.4
    en = d.filter("lang = 'en'").count() / n
    assert 0.8 <= en <= 0.97
    # EVERY planted dup is byte-identical to some earlier unique doc —
    # including dups whose hash-chosen target is itself a near-dup (those
    # must reproduce the target's shifted seed AND its marker suffix)
    n_uniq = int(n * 0.9)
    dup_texts = d.filter(F.col("doc_id") >= n_uniq).select("text")
    uniq_texts = d.filter(F.col("doc_id") < n_uniq).select("text").distinct()
    assert dup_texts.join(uniq_texts, "text", "left_anti").count() == 0
    # deterministic: same n regenerates identical content
    d2 = generate_documents(spark, n)
    assert d.exceptAll(d2).count() == 0 and d2.exceptAll(d).count() == 0

    e = generate_embeddings(spark, 2000).cache()
    assert e.columns == ["vec_id", "embedding", "label"]
    assert e.select(F.size("embedding")).distinct().collect()[0][0] == 64
    # fixed ~200-row cluster size: label count scales with n
    assert e.select("label").distinct().count() == 10
    e10 = generate_embeddings(spark, 20000)
    assert e10.select("label").distinct().count() == 100
    d.unpersist()
    e.unpersist()


def test_scaling_ratios_stay_sub_linear(spark):
    """Every stage's 10x/1x wall-clock ratio must stay under
    ``RATIO_BOUND`` — the one-sided superlinearity alarm. Runs the full
    stage set (x-family queries, corpus build, streaming ingest with
    standing indexes, ANN build+probe) at a reduced base size; the ratio
    bound, not the absolute times, is the contract."""
    result = measure_scaling(
        spark,
        base_docs=2_000,
        base_vectors=1_000,
        factor=FACTOR,
        deep_factor=DEEP_FACTOR,
    )
    assert result["factor"] == FACTOR
    bad = {
        name: st
        for name, st in result["stages"].items()
        if st["ratio"] is None or st["ratio"] > RATIO_BOUND
    }
    assert not bad, f"superlinear stages (bound {RATIO_BOUND}): {bad}"
    # sanity: the harness really ran every declared stage at both scales
    assert len(result["stages"]) >= 12
    for st in result["stages"].values():
        assert st["t1_sec"] > 0 and st[f"t{FACTOR}_sec"] > 0
    # the 30x deep-scale sub-block: one more decade of evidence for the
    # steepest measured stages (substring family, SimHash banding — whose
    # r9 30x point caught the 32-bit band saturation — SemDeDup's pair
    # join, and the incremental BPE trainer riding along as a custom stage)
    sub = result[f"factor{DEEP_FACTOR}"]
    assert sub["factor"] == DEEP_FACTOR
    assert set(sub["stages"]) == {
        "x76_exact_substring_matches",
        "x77_exact_substring_scrub",
        "x07_simhash_neardup",
        "x65_semantic_dedup",
        "bpe_train",
        "ann_probe",
        "ann_probe_adc",
    }
    # the ADC size gate OBSERVED flipping at the deep scale: the small
    # probe broadcast fused per-pair tables, the wide probe (2400 pairs x
    # 256-codeword tables ~ 39 MB) crossed the 32 MB gate into the
    # decomposed three-broadcast shape
    assert sub["stages"]["ann_probe_adc"]["shape_small"] == "fused"
    assert sub["stages"]["ann_probe_adc"]["shape_wide"] == "decomposed"
    bad30 = {
        name: st
        for name, st in sub["stages"].items()
        if st["ratio"] is None or st["ratio"] > DEEP_RATIO_BOUND
    }
    assert not bad30, f"superlinear deep-scale stages (bound {DEEP_RATIO_BOUND}): {bad30}"
    for st in sub["stages"].values():
        assert st["t1_sec"] > 0 and st[f"t{DEEP_FACTOR}_sec"] > 0


def test_narrowed_query_set_skips_deep_sub_block(spark):
    """A caller narrowing ``queries`` past every deep-eligible query must
    not lose the whole measurement to a KeyError in the deep-scale
    sub-block — the sub-block (including its BPE rider) only runs for
    deep queries actually measured."""
    result = measure_scaling(
        spark,
        base_docs=400,
        base_vectors=300,
        factor=2,
        queries=("x01_dedup_exact",),
        runs=1,
        stream_batches=2,
        deep_factor=30,
    )
    assert "x01_dedup_exact" in result["stages"]
    assert "factor30" not in result
