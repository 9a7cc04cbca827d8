"""Edge-case oracle parity for the text/document operators.

The driver gate runs on generated sf0.01 data, whose documents are all
mid-sized normal prose — it can never catch a divergence on boundary
shapes. This test rebuilds the same Spark-vs-DuckDB hash comparison (same
canonicalization as scripts/verify_gate.py) over a tiny hand-built corpus
of edge documents: empty text, single token, exact duplicates, all-repeat
text, and passage/chunk boundary lengths.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent

_spec = importlib.util.spec_from_file_location("verify_gate", REPO / "scripts" / "verify_gate.py")
_vg = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_vg)
canon_hash = _vg.canon_hash

#: (doc_id, text, lang, source) — n_chars derived. Shapes: single token,
#: empty string, exact dup pair, pure repetition, 16/17-token passage
#: boundary, a long doc spanning >1 training chunk, punctuation-free PII
#: bait, and a query-term doc so FTS/BM25 rank something.
_DOCS = [
    (0, "hello", "en", "edge"),
    (1, "", "en", "edge"),
    (2, "the quick brown fox jumps over the lazy dog", "en", "edge"),
    (3, "the quick brown fox jumps over the lazy dog", "en", "edge"),
    (4, "spam spam spam spam spam spam spam spam", "en", "edge"),
    (5, " ".join(f"w{i}" for i in range(16)), "en", "edge"),
    (6, " ".join(f"w{i}" for i in range(17)), "en", "edge"),
    (7, " ".join(f"tok{i % 7}" for i in range(200)), "en", "edge"),
    (8, "hash join window hash join scan merge window", "en", "edge"),
    (9, "le la les et un une petite histoire", "fr", "edge2"),
]

#: documents-only queries whose behavior an edge corpus can change
_QUERIES = [
    "x01_dedup_exact",
    "x02_minhash_signatures",
    "x03_minhash_lsh_pairs",
    "x20_token_stats",
    "x21_quality_score",
    "x22_lang_id",
    "x23_fingerprint",
    "x24_source_lang_profile",
    "x25_dataset_split",
    "x26_stratified_sample",
    "x27_sequence_packing",
    "x28_top_bigrams",
    "x31_length_percentiles",
    "x32_pii_redaction",
    "x33_repetition_signals",
    "x34_benchmark_contamination",
    "x35_mixture_weights",
    "x36_shard_assignment",
    "x38_passage_dedup",
    "x41_subword_chunking",
    "x42_vocab_oov",
    "x43_filter_pipeline",
    "q47_fulltext_search",
    "q52_bm25_rank",
    "x45_tfidf_top_term",
    "x46_unigram_lm_score",
    "x48_winnowing",
    "x49_fingerprint_matches",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    rows = [(i, t, lang, src, len(t)) for i, t, lang, src in _DOCS]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _QUERIES)
def test_edge_corpus_matches_oracle(spark, edge_dir, name, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CACHE", "0")  # tiny corpus; skip the pool
    from consensource_sds_spark.queries import REGISTRY, all_queries

    fn = all_queries()[name]  # side effect: populates REGISTRY
    qd = REGISTRY[name]
    spark_df = fn(spark, edge_dir).toPandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_dir}/documents.parquet/*.parquet'"
    )
    oracle_df = con.execute(qd.oracle).fetchdf()

    sh, sn, ss = canon_hash(spark_df)
    oh, on, os_ = canon_hash(oracle_df)
    assert sn == on, f"{name}: rows {sn} != {on}"
    assert ss == os_, f"{name}: schema {ss} != {os_}"
    assert sh == oh, f"{name}: value hash mismatch on edge corpus"


def test_x92_continuation_pairs_nonvacuous(spark, tmp_path):
    """The driver testdata has no continuation structure (x92 returns 0
    rows there), so the operator's behavior is pinned here on a crafted
    corpus: split docs chain tail->head, unrelated docs don't, and the
    Spark result matches the DuckDB oracle on the same table."""
    import duckdb

    from consensource_sds_spark.queries import REGISTRY, all_queries
    from consensource_sds_spark.queries.extensions import x92_continuation_pairs

    all_queries()
    w = 6
    boundary = " ".join(f"b{i}" for i in range(w))
    rows = [
        # doc 1's tail == doc 2's head: a continuation pair
        (1, "alpha beta gamma " + boundary, "en", "s", 0),
        (2, boundary + " delta epsilon zeta", "en", "s", 0),
        # doc 3: contains the boundary MID-TEXT only -> no pair
        (3, "pre " + boundary + " post tail words here now", "en", "s", 0),
        # doc 4: unrelated
        (4, "entirely different words with no shared boundary window", "en", "s", 0),
        # doc 5: too short to have a window
        (5, "short doc", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["tail_doc"], r["head_doc"])
        for r in x92_continuation_pairs(spark, str(tmp_path)).collect()
    }
    assert got == {(1, 2)}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path / 'documents.parquet'}/*.parquet'"
    )
    want = {(a, b) for a, b, _h in con.execute(REGISTRY["x92_continuation_pairs"].oracle).fetchall()}
    con.close()
    assert want == {(1, 2)}


def test_lang_id_null_text_is_null(spark):
    """Regression: NULL text made every stopword comparison NULL, so the
    CASE chain fell through to the otherwise branch and deterministically
    labeled malformed rows 'de'; NULL text must yield NULL."""
    from pyspark.sql import functions as F

    from consensource_sds_spark.functions.text import lang_id

    df = spark.createDataFrame(
        [(1, "the cat and the hat is back"), (2, None), (3, "der hund und die katze zu haus")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang"] for r in df.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: None, 3: "de"}


def test_simhash_long_document_no_overflow(spark, tmp_path):
    """Regression: the previous 4x16-bit SWAR packing's lane-3 partial sum
    crossed 2^63 at 32,768 worst-case tokens — an ANSI ARITHMETIC_OVERFLOW
    job abort on one long document. The 32-bit-lane packing must survive a
    40k-token doc AND still match the per-bit oracle definition."""
    import duckdb

    from consensource_sds_spark.queries import REGISTRY
    from consensource_sds_spark.queries.extensions import x05_simhash

    # one token repeated 40k times: every set bit of its md5 prefix drives
    # its lane to 40_000 (the old packing overflowed at 32_768)
    rows = [
        (1, " ".join(["spark"] * 40_000), "en", "s", 0),
        (2, "a small control document", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["simhash_lo"], r["simhash_hi"])
        for r in x05_simhash(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path / 'documents.parquet'}/*.parquet'"
    )
    want = {d: (lo, hi) for d, lo, hi in con.execute(REGISTRY["x05_simhash"].oracle).fetchall()}
    con.close()
    assert got == want
    # both halves must be real 32-bit values (a degenerate all-zero hi
    # would silently halve the signature the banding relies on)
    assert all(0 <= v < 2**32 for pair in got.values() for v in pair)


def test_degenerate_regression_sources_yield_null_not_abort(spark, tmp_path):
    """Crafted-corpus pin for the x79/x90 slope guards: a source with one
    distinct token (pure template spam) and a source with one document (a
    stuck crawler) zero the least-squares denominator — previously an ANSI
    DIVIDE_BY_ZERO abort of the whole query on Spark and a NaN on DuckDB
    (engines disagreeing); both now yield NULL on both engines."""
    import math

    import duckdb

    from consensource_sds_spark.queries import REGISTRY, all_queries
    from consensource_sds_spark.queries.extensions import x79_zipf_fit, x90_heaps_vocab_growth

    all_queries()
    rows = [
        # 'spam': every doc repeats ONE token -> 1 distinct term, x79 denom 0
        (1, "buy buy buy buy", "en", "spam", 0),
        (2, "buy buy", "en", "spam", 0),
        # 'stuck': a single document -> 1 regression point, x90 denom 0
        (3, "only one page was ever crawled here", "en", "stuck", 0),
        # 'ok': healthy control source
        (4, "alpha beta gamma delta epsilon zeta", "en", "ok", 0),
        (5, "alpha beta alpha gamma alpha delta", "en", "ok", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path / 'documents.parquet'}/*.parquet'"
    )

    def canon(v):
        return None if v is None or (isinstance(v, float) and math.isnan(v)) else round(v, 4)

    got79 = {r["source"]: canon(r["zipf_slope"]) for r in x79_zipf_fit(spark, str(tmp_path)).collect()}
    want79 = {s: canon(v) for s, _n, v in con.execute(REGISTRY["x79_zipf_fit"].oracle).fetchall()}
    assert got79["spam"] is None and got79["ok"] is not None
    assert got79 == want79
    got90 = {
        r["source"]: canon(r["heaps_beta"]) for r in x90_heaps_vocab_growth(spark, str(tmp_path)).collect()
    }
    want90 = {s: canon(v) for s, _n, v in con.execute(REGISTRY["x90_heaps_vocab_growth"].oracle).fetchall()}
    con.close()
    assert got90["stuck"] is None and got90["ok"] is not None
    assert got90 == want90
