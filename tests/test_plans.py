"""Plan-shape regression gate: the scale posture of every registered query,
asserted on the physical plan (VERDICT r1 graded these by hand; this pins
them in CI).

- no CartesianProduct anywhere;
- BroadcastNestedLoopJoin only where a bounded broadcast side makes the
  cross join the intended exact plan (the ANN brute-force baselines);
- with the buffer pool disabled, selective filters reach the parquet scan
  (PushedFilters non-empty) — i.e. nothing in the query layer breaks
  source pushdown.
"""

from __future__ import annotations

import pytest

from consensource_sds_spark.queries import all_queries

SF = "/root/testdata/sf0.001"

#: max BroadcastNestedLoopJoin occurrences per query — the bounded
#: broadcast cross joins by design (docstring-documented): the exact-kNN
#: baselines broadcast a fixed query/centroid set; x13 contains x11's
#: centroid-assignment subtree once per pair-join side (its own pair join
#: must be a hash/merge join on the cell key, which the cap enforces)
_BNLJ_ALLOWED = {
    "x10_cosine_topk": 1,
    "x11_ivf_assign": 1,
    "x12_embedding_neardup": 1,
    "x13_ivf_neardup": 2,
    "x14_multiprobe_ivf": 2,  # assignment subtree on both pair-join sides, like x13
    "q52_bm25_rank": 1,  # 1-row corpus-stats (avgdl, N) scalar broadcast
    "x45_tfidf_top_term": 1,  # 1-row doc-count scalar broadcast
    "x46_unigram_lm_score": 1,  # 1-row corpus-totals (T, V) scalar broadcast
    "x89_bigram_lm_score": 1,  # 1-row vocab-size scalar broadcast (x46's shape)
    "x91_term_burstiness": 1,  # 1-row doc-count scalar broadcast
    "x57_distribution_drift": 1,  # 1-row snapshot-totals scalar broadcast
    "q78_dormant_accounts": 1,  # 1-row average-balance scalar broadcast
    "q99_dormant_rich_by_nation": 1,  # 1-row average-balance scalar broadcast (Q22 shape)
    "x78_histogram_quantile_rollup": 1,  # 1-row global (min, max) scalar broadcast
    "q86_value_concentration": 1,  # 1-row global-total scalar broadcast
    "x40_kmeans_update": 1,  # the 8-centroid assignment cross join
    "q62_gap_fill": 1,  # day-spine x event-type grid (both sides tiny, generated)
    # |sources| sketch rows per side — the pair grid over per-slice sketches
    # is the POINT of the operator (data itself is never re-joined)
    "x63_source_vocab_overlap": 1,
    # ~10-row recursion product banded against orders by range condition
    "q80_recursive_bands": 1,
    # the 8-centroid assignment cross join on both the db and query sides
    # (x11's shape, twice); all PQ-stage joins are equi-joins
    "x85_ivfadc_topk": 2,
}


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_unbounded_join_shapes(spark, name):
    df = all_queries()[name](spark, SF)
    plan = _physical(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    assert n_bnlj <= _BNLJ_ALLOWED.get(name, 0), (
        f"{name} plans {n_bnlj} nested-loop join(s); allowed {_BNLJ_ALLOWED.get(name, 0)}"
    )


def test_filters_reach_parquet_scan(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CACHE", "0")  # bypass the buffer pool
    from consensource_sds_spark.queries.relational import q02_filter_pushdown

    # sf0.01, not SF: the parametrized tests above pooled sf0.001 tables,
    # and Spark's CacheManager substitutes a cached relation into any
    # matching later scan — a different path guarantees a real FileScan
    df = q02_filter_pushdown(spark, "/root/testdata/sf0.01")
    # full formatted explain (executedPlan().toString() truncates scan attrs)
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "PushedFilters: []" not in plan
    assert "PushedFilters: [" in plan


def test_x61_under_cap_rows_skip_the_sort(spark):
    """x61's mega-domain guard: only over-cap sources route through the
    rank window; under-cap rows take the anti-join pass-through branch.
    Pinned shape: exactly ONE Window (fed by the semi-join branch), and a
    union whose other branch is the anti join with NO window/sort above
    the scan."""
    from consensource_sds_spark.queries.extensions import x61_domain_doc_cap

    plan = x61_domain_doc_cap(spark, SF)._jdf.queryExecution().executedPlan().toString()
    # exactly one Window node ("Window [" excludes the WindowGroupLimit
    # pushdowns, which are the bonus: the sort is bounded to top-K per key)
    assert plan.count("Window [") == 1, plan
    assert "LeftAnti" in plan and "LeftSemi" in plan, plan
    assert "Union" in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_x62_threshold_set_far_below_item_budget(spark):
    """x62's threshold selection is only deterministic while the qualifying
    set stays inside the tracked-item budget; pin two orders of headroom so
    the rank cap cannot silently truncate (the ADVICE r4 finding)."""
    from consensource_sds_spark.queries.extensions import _X62_K, x62_vocab_heavy_hitters

    n = x62_vocab_heavy_hitters(spark, "/root/testdata/sf0.01").count()
    assert 0 < n < _X62_K / 100, n


def test_q91_single_events_scan(spark):
    """q91's v/c stage frames feed two consumers each; localCheckpoint
    pins them so the FINAL plan scans events exactly once (the purchase
    stage) and reads v/c back as pinned partitions — without it events is
    type-prune-scanned per consumer (~6x/run; at 100 TB each is the
    corpus)."""
    from consensource_sds_spark.queries.relational import q91_funnel_conversion

    plan = (
        q91_funnel_conversion(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    # one events scan subtree: the source path appears once whether the
    # scan is a raw FileScan or an InMemoryTableScan over the pooled table
    assert plan.count("events.parquet") == 1, plan
    # and the three checkpointed stage reads (v count, c count, c in p)
    assert plan.count("ExistingRDD") == 3, plan


def test_registry_integrity():
    """Refactor guard (a mis-placed decorator once re-registered a helper
    under a query's name): every gate-priority name resolves, the
    registry never silently shrinks, every entry is callable with
    (spark, sf_dir), and oracle SQL — where declared — is a non-empty
    string mentioning a known table."""
    import inspect

    from consensource_sds_spark.queries import REGISTRY, _GATE_PRIORITY, all_queries

    all_queries()
    assert len(REGISTRY) >= 146
    missing = [n for n in _GATE_PRIORITY if n not in REGISTRY]
    assert missing == [], missing
    # and the reverse: an entry absent from the tuple is silently appended
    # LAST by _ordered_registry — outside the driver's 50-slot window
    # forever (the x92 near-miss); every registry entry must be ordered
    unordered = [n for n in REGISTRY if n not in _GATE_PRIORITY]
    assert unordered == [], unordered
    tables = ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings")
    for name, qd in REGISTRY.items():
        params = list(inspect.signature(qd.fn).parameters)
        assert params[:2] == ["spark", "sf_dir"], (name, params)
        if qd.oracle is not None:
            assert isinstance(qd.oracle, str) and any(t in qd.oracle for t in tables), name
