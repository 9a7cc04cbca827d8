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
