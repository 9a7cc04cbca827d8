"""ANN quality envelope: the approximate near-dup paths (IVF x13,
multi-probe x14, SRP x47) are graded against the exact brute-force pairs
(x12) — precision is 1.0 by construction (every candidate is exactly
cosine-verified), so the quality axis is recall, pinned here with floors.
"""

from __future__ import annotations

import pytest

from consensource_sds_spark.queries.extensions import (
    x12_embedding_neardup,
    x13_ivf_neardup,
    x14_multiprobe_ivf,
    x47_srp_neardup,
)

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["vec_a"], r["vec_b"]) for r in df.select("vec_a", "vec_b").collect()}


def _bipartite(pairs):
    """x12's exact baseline scores the (id < 250) x (id >= 250) bipartite
    universe; restrict any all-pairs candidate set to it before comparing."""
    return {(a, b) for a, b in pairs if a < 250 <= b}


@pytest.fixture(scope="module")
def exact(spark):
    got = _pairs(x12_embedding_neardup(spark, SF))
    assert got, "exact baseline found no pairs; recall floors are vacuous"
    return got


def test_ivf_recall(spark, exact):
    found = _bipartite(_pairs(x13_ivf_neardup(spark, SF)))
    assert found <= exact  # same threshold + exact verify => no false positives
    recall = len(found & exact) / len(exact)
    # mid-band pairs (cosine just over the 0.4 threshold) frequently
    # straddle a coarse cell boundary, so single-probe recall is modest by
    # design — the floor pins it from collapsing, and
    # test_multiprobe_beats_single_probe pins the recovery path
    assert recall >= 0.2, f"single-probe IVF recall {recall:.2f} below floor"


def test_multiprobe_beats_single_probe(spark, exact):
    single = _bipartite(_pairs(x13_ivf_neardup(spark, SF))) & exact
    multi = _bipartite(_pairs(x14_multiprobe_ivf(spark, SF))) & exact
    assert len(multi) >= len(single), "multi-probe must not lose recall"
    assert len(multi) / len(exact) >= 0.7, "multi-probe recall below floor"


def test_srp_finds_top_similarity_band(spark, exact):
    """SRP's collision probability rises with cosine, so the HIGHEST-
    similarity exact pairs are the ones it must not miss: every exact pair
    with cosine > 0.6 collides on all 8 sign bits with high probability."""
    strong = {
        (r["vec_a"], r["vec_b"])
        for r in x12_embedding_neardup(spark, SF).filter("cosine > 0.6").collect()
    }
    if not strong:
        pytest.skip("no strong pairs at this scale")
    found = _bipartite(_pairs(x47_srp_neardup(spark, SF)))
    recall = len(found & strong) / len(strong)
    assert recall >= 0.5, f"SRP recall on strong pairs {recall:.2f} below floor"


def test_pq_adc_recall(spark):
    """x84's ADC ranking is approximate (database vectors are seen only
    through 8 codeword ids), so its quality axis is recall of the EXACT
    L2 top-5 over the same (query, database) split; the floor pins the
    codebook/encode/ADC plumbing from degenerating into noise (a broken
    encode step scores ~k/n by chance, far under it)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from consensource_sds_spark.queries import load
    from consensource_sds_spark.queries.extensions import _PQ_K, x84_pq_adc_topk

    e = load(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    db = e.filter(F.col("vec_id") >= _PQ_K).select(F.col("vec_id").alias("did"), F.col("embedding").alias("de"))
    d2 = F.aggregate(
        F.zip_with("qe", "de", lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("did"))
    exact = {
        (r["qid"], r["did"])
        for r in db.crossJoin(F.broadcast(q))
        .select("qid", "did", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .collect()
    }
    got = {(r["qid"], r["did"]) for r in x84_pq_adc_topk(spark, SF).collect()}
    recall = len(got & exact) / len(exact)
    # the registry entry uses deterministic SEED codewords, not a k-means-
    # trained codebook (the production variant, per its docstring) — so
    # recall is modest by design; chance recall is ~5/480 ≈ 0.01, and the
    # 0.2 floor (the single-probe IVF convention) pins the encode/ADC
    # plumbing from degenerating while tolerating the untrained codebook
    assert recall >= 0.2, f"PQ ADC recall@5 {recall:.2f} below floor"


def test_ivfadc_recall(spark):
    """x85 composes cell pruning with ADC ranking; same floor discipline
    as x84 (chance ~0.01). Cell pruning can only narrow the candidate
    set, but it also removes far distractors PQ mis-ranks — so IVFADC
    recall is not ordered w.r.t. x84's and gets its own envelope."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from consensource_sds_spark.queries import load
    from consensource_sds_spark.queries.extensions import _PQ_K, x85_ivfadc_topk

    e = load(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    db = e.filter(F.col("vec_id") >= _PQ_K).select(F.col("vec_id").alias("did"), F.col("embedding").alias("de"))
    d2 = F.aggregate(
        F.zip_with("qe", "de", lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("did"))
    exact = {
        (r["qid"], r["did"])
        for r in db.crossJoin(F.broadcast(q))
        .select("qid", "did", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .collect()
    }
    got = {(r["qid"], r["did"]) for r in x85_ivfadc_topk(spark, SF).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.2, f"IVFADC recall@5 {recall:.2f} below floor"


def test_standing_residual_codebook_beats_plain(spark, tmp_path):
    """The standing PQ lane's by_residual variant (train_pq_codebook with
    centroids + init_pq(by_residual=True) — the FAISS IndexIVFPQ default)
    must BUY recall at the deployed operating point: same data, same
    coarse centroids, same m/k/nprobe, the only difference being whether
    the codebook describes raw vectors or residuals. Residuals
    concentrate near zero, so the codeword budget spends on fine
    structure instead of re-describing cell position. Everything in both
    builds is deterministic (md5 seeds, fixed-order folds), so the
    measured recalls (0.28 plain / 0.31 residual on this data) are
    stable, and the pin is the INEQUALITY plus a floor — not the exact
    values."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from consensource_sds_spark.queries import load
    from consensource_sds_spark.streaming.ann_ingest import (
        ann_probe_adc,
        ingest_embedding_batch,
        init_ann_index,
        init_pq,
        load_centroids,
        train_centroids,
        train_pq_codebook,
    )

    e = load(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(F.col("vec_id").alias("qid"), "embedding")
    db = e.select(F.col("vec_id").alias("did"), F.col("embedding").alias("de"))
    d2 = F.aggregate(
        F.zip_with("qe", "de", lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("did"))
    exact = {
        (r["qid"], r["did"])
        for r in db.crossJoin(F.broadcast(q.select("qid", F.col("embedding").alias("qe"))))
        .select("qid", "did", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .collect()
    }
    recall = {}
    for mode in ("plain", "residual"):
        d = os.path.join(str(tmp_path), mode)
        init_ann_index(spark, d, train_centroids(spark, e, k=8, iters=2))
        cb = train_pq_codebook(
            spark, e, m=8, k=16, iters=2,
            centroids=load_centroids(spark, d) if mode == "residual" else None,
        )
        init_pq(spark, d, cb, by_residual=(mode == "residual"))
        ingest_embedding_batch(spark, e.select("vec_id", "embedding", "label"), 0, d)
        got = {
            (r["qid"], r["vec_id"])
            for r in ann_probe_adc(spark, d, q, k=10, nprobe=2).collect()
        }
        recall[mode] = len(got & exact) / len(exact)
    assert recall["residual"] > recall["plain"], f"residual must improve recall: {recall}"
    assert recall["residual"] >= 0.3, f"residual recall below floor: {recall}"


def test_residual_ivfpq_above_chance(spark):
    """x86's seed codebook is deliberately untrained (see its docstring:
    the oracle pins the residual-ADC pipeline, not accuracy — residual
    fine structure is what untrained codewords destroy), so the envelope
    here is only that the ranking retains signal: recall well above the
    ~0.01 chance level. Everything is deterministic, so the measured 0.08
    is stable; the floor sits at half of it."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from consensource_sds_spark.queries import load
    from consensource_sds_spark.queries.extensions import _PQ_K, x86_ivfpq_residual_topk

    e = load(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    db = e.filter(F.col("vec_id") >= _PQ_K).select(F.col("vec_id").alias("did"), F.col("embedding").alias("de"))
    d2 = F.aggregate(
        F.zip_with("qe", "de", lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("did"))
    exact = {
        (r["qid"], r["did"])
        for r in db.crossJoin(F.broadcast(q))
        .select("qid", "did", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .collect()
    }
    got = {(r["qid"], r["did"]) for r in x86_ivfpq_residual_topk(spark, SF).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.04, f"residual IVFPQ recall@5 {recall:.2f} at chance level"


def test_zero_norm_embeddings_never_abort_and_engines_agree(spark, tmp_path):
    """Crafted-corpus differential pin for the zero-norm guards: an
    all-zero embedding (an empty document is common in production) used
    to abort x65/x47 with ANSI DIVIDE_BY_ZERO on the Spark side while
    DuckDB yielded NaN — and NaN >= t is TRUE there, so the engines also
    disagreed on the pair set. Both guards now say zero-norm is never
    near, on both engines."""
    import duckdb
    from pyspark.sql import functions as F  # noqa: F401

    from consensource_sds_spark.queries import REGISTRY, all_queries
    from consensource_sds_spark.queries.extensions import x47_srp_neardup, x65_semantic_dedup

    all_queries()
    # dim 64 like the real embeddings table: the SRP weight expressions
    # project exactly 64 dimensions, so a shorter crafted vector would
    # diverge between engines for reasons unrelated to this pin
    zero = [0.0] * 64
    e0 = [1.0] + [0.0] * 63
    near = [0.9, 0.1] + [0.0] * 62
    rows = [
        (1, e0, 0),
        (2, near, 0),  # near vec 1, same label
        (3, zero, 0),  # zero-norm, same label as 1/2
        (4, zero, 1),  # two zero vectors share any SRP bucket
        (5, zero, 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.write.parquet(str(tmp_path / "embeddings.parquet"))

    keep = {r["vec_id"]: r["keep"] for r in x65_semantic_dedup(spark, str(tmp_path)).collect()}
    # vec 2 drops (near vec 1); the zero vectors are never near anything
    assert keep == {1: True, 2: False, 3: True, 4: True, 5: True}
    srp = x47_srp_neardup(spark, str(tmp_path)).collect()
    assert all(r["vec_a"] not in (3, 4, 5) and r["vec_b"] not in (3, 4, 5) for r in srp)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path / 'embeddings.parquet'}/*.parquet'"
    )
    want_keep = dict(
        (vid, k) for vid, _lbl, k in con.execute(REGISTRY["x65_semantic_dedup"].oracle).fetchall()
    )
    assert want_keep == keep
    want_srp = {(a, b) for a, b, _c in con.execute(REGISTRY["x47_srp_neardup"].oracle).fetchall()}
    assert want_srp == {(r["vec_a"], r["vec_b"]) for r in srp}

    # x82: zero-norm vectors get NULL centroid_cos and rank FIRST (most
    # outlier) identically on both engines (Spark nulls-first asc is the
    # default; the oracle pins NULLS FIRST explicitly — DuckDB's default
    # is nulls-last)
    from consensource_sds_spark.queries.extensions import x82_centroid_outlier_prune

    got82 = {
        r["vec_id"]: (r["centroid_cos"], r["pruned"])
        for r in x82_centroid_outlier_prune(spark, str(tmp_path)).collect()
    }
    assert got82[3][0] is None and got82[3][1] is True  # zero vector = top outlier
    want82 = {
        vid: (c, p)
        for vid, _lbl, c, p in con.execute(
            REGISTRY["x82_centroid_outlier_prune"].oracle
        ).fetchall()
    }
    assert {k: (v[0], v[1]) for k, v in want82.items()} == got82
    con.close()
