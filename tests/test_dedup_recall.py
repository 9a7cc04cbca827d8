"""Text-dedup quality envelope: MinHash-LSH banding (x03) graded against
exact shingle-Jaccard over all pairs at sf0.001 — the s-curve promise
(high-similarity pairs must be candidates) pinned as a recall floor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from consensource_sds_spark.functions.text import shingles
from consensource_sds_spark.queries import load
from consensource_sds_spark.queries.extensions import x03_minhash_lsh_pairs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exact_sim_pairs(spark):
    """All doc pairs with true bigram-shingle Jaccard >= 0.5, via the
    inverted-index join (pairs sharing >= 1 shingle), so no doc x doc
    cross join even in the test harness."""
    d = load(spark, SF, "documents")
    sh = d.select(
        "doc_id", F.explode(F.array_distinct(shingles(F.col("text")))).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.selectExpr("doc_id AS da", "sh")
    b = sh.selectExpr("doc_id AS db", "sh AS shb")
    inter = (
        a.join(b, (F.col("sh") == F.col("shb")) & (F.col("da") < F.col("db")))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.selectExpr("doc_id AS da", "n AS na")
    nb = sizes.selectExpr("doc_id AS db", "n AS nb")
    jac = (
        inter.join(na, "da")
        .join(nb, "db")
        .withColumn("j", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
    )
    return {
        (r["da"], r["db"]): r["j"] for r in jac.filter(F.col("j") >= 0.5).collect()
    }


def test_lsh_recall_on_high_jaccard_pairs(spark, exact_sim_pairs):
    if not exact_sim_pairs:
        pytest.skip("no high-jaccard pairs at this scale")
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in x03_minhash_lsh_pairs(spark, SF).collect()
    }
    hit = sum(1 for p in exact_sim_pairs if p in cand)
    recall = hit / len(exact_sim_pairs)
    # 4 bands x 2 rows: P(candidate) = 1-(1-j^2)^4 = 0.78 at j=0.5, ~1 at
    # j>=0.8 — the duplicate band the pipeline exists for; floor below the
    # j=0.5 expectation to keep the pin insensitive to the mix
    assert recall >= 0.6, f"LSH recall {recall:.2f} on {len(exact_sim_pairs)} pairs"


def test_lsh_candidates_not_explosive(spark, exact_sim_pairs):
    """The other side of the s-curve: the candidate set must stay near the
    true-pair scale, not degenerate toward doc x doc."""
    d_count = load(spark, SF, "documents").count()
    cand_count = x03_minhash_lsh_pairs(spark, SF).count()
    assert cand_count <= d_count * 5, (
        f"{cand_count} candidates for {d_count} docs — banding too loose"
    )


def test_cluster_resolution_star_contraction(spark):
    """x06's large-star/small-star loop: converges well under the 25-round
    cap (O(log n) rounds, Kiveris et al.), labels equal the transitive
    closure of the candidate graph (each node -> min doc_id reachable),
    and exactly one keep per cluster."""
    from consensource_sds_spark.queries.extensions import (
        x03_minhash_lsh_pairs,
        x06_dedup_clusters,
    )

    out = x06_dedup_clusters(spark, SF).collect()
    assert 0 < x06_dedup_clusters.last_rounds <= 10

    # oracle: NetworkX-free transitive closure in plain Python
    pairs = [(r["doc_a"], r["doc_b"]) for r in x03_minhash_lsh_pairs(spark, SF).collect()]
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for a, b in pairs:
        for n in (a, b):
            expect[n] = find(n)

    got = {r["doc_id"]: r["cluster_id"] for r in out}
    for node, root in expect.items():
        assert got[node] == root, (node, got[node], root)
    keeps = [r for r in out if r["keep"]]
    clusters = {r["cluster_id"] for r in out}
    assert len(keeps) == len(clusters)
    assert all(r["doc_id"] == r["cluster_id"] for r in keeps)


def test_incremental_probe_consistent_with_full_pairing(spark):
    """x66 (batch-vs-corpus band probe) must emit exactly x03's candidate
    pairs restricted to cross-snapshot pairs — the incremental path may
    never invent or lose a candidate relative to the full re-pairing."""
    from pyspark.sql import functions as F

    from consensource_sds_spark.queries.extensions import (
        x03_minhash_lsh_pairs,
        x66_incremental_neardup_probe,
    )

    sf = "/root/testdata/sf0.001"
    snap = "conv(substring(md5(CAST({c} AS string)), 1, 4), 16, 10) % 2"
    full = (
        x03_minhash_lsh_pairs(spark, sf)
        .withColumn("sa", F.expr(snap.format(c="doc_a")))
        .withColumn("sb", F.expr(snap.format(c="doc_b")))
        .filter(F.col("sa") != F.col("sb"))
        .select(
            F.when(F.col("sa") == 1, F.col("doc_a")).otherwise(F.col("doc_b")).alias("new_doc_id"),
            F.when(F.col("sa") == 0, F.col("doc_a")).otherwise(F.col("doc_b")).alias("corpus_doc_id"),
        )
    )
    expect = {(r["new_doc_id"], r["corpus_doc_id"]) for r in full.collect()}
    got = {
        (r["new_doc_id"], r["corpus_doc_id"])
        for r in x66_incremental_neardup_probe(spark, sf).collect()
    }
    assert got == expect and len(got) > 0


def test_x07_single_emission_per_pair(spark, tmp_path):
    """x07's pair dedup is a min-intact-cid filter (r12), not distinct():
    identical docs share all 20 banding keys, so the join mints 20
    candidate rows per pair — exactly one may survive."""
    from consensource_sds_spark.queries.extensions import x07_simhash_neardup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en", "s", 22),
            (2, "alpha beta gamma delta", "en", "s", 22),  # hamming 0 vs 1
            (3, "alpha beta gamma delta", "en", "s", 22),  # hamming 0 vs 1,2
            (4, "totally different words here", "en", "s", 28),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = x07_simhash_neardup(spark, str(tmp_path)).collect()
    pairs = [(r["doc_a"], r["doc_b"]) for r in out]
    # each identical pair appears EXACTLY once, with hamming 0
    assert sorted(pairs) == [(1, 2), (1, 3), (2, 3)], pairs
    assert all(r["hamming"] == 0 for r in out)
