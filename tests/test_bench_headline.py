"""Pin bench.py's stdout contract: the LAST line the driver tail-captures.

Round 7's official bench record was lost because the single stdout JSON
line grew past the driver's bounded tail-capture window (``parsed:
null``). The contract since: the full detail goes to an earlier line +
the BENCH_DETAIL.json sidecar, and the LAST line is a compact headline
that must stay under ``_HEADLINE_MAX_BYTES`` no matter how the detail
blocks grow. These tests exercise ``_headline_line`` pure — no Spark.
"""

from __future__ import annotations

import json

from bench import _HEADLINE_MAX_BYTES, _deep_scale_query_entries, _headline_line

#: a realistic detail fixture — the shape main() builds (values shrunk)
DETAIL = {
    "ingest": {"blocks": 10, "state_changes": 100, "sec": 0.1, "changes_per_sec": 1000.0},
    "corpus": {"sec": 1.0, "n_docs": 100, "n_kept": 5, "docs_per_sec": 100.0,
               "sec_with_substring_scrub": 1.2, "dropped": {}},
    "corpus_stream": {
        "exact": {"sec": 1.0, "n_batches": 2, "input_docs": 80, "docs_per_sec": 80.0},
        "near_dedup": {"sec": 2.0, "n_batches": 2, "input_docs": 80, "docs_per_sec": 40.0},
    },
    "ann": {"n_vectors": 100, "build_sec": 0.5, "probe_sec": 0.2, "queries_per_sec": 50.0,
            "pq_build_sec": 0.7, "adc_probe_sec": 0.3, "adc_queries_per_sec": 40.0},
    "bpe": {"n_merges": 16, "batch_m": 4, "rounds": 4, "merges_per_job": 4.0, "sec": 0.5},
    "media": {"png": {"n_bytes": 100, "mb_per_sec": 1.0, "backend": "pure"}},
    "scaling": {
        "factor": 10, "base_docs": 100, "base_vectors": 50,
        "stages": {"x01_dedup_exact": {"t1_sec": 0.1, "t10_sec": 0.2, "ratio": 2.0},
                   "x07_simhash_neardup": {"t1_sec": 0.2, "t10_sec": 1.4, "ratio": 7.0}},
        "factor30": {"factor": 30, "stages": {
            "x76_exact_substring_matches": {"t1_sec": 0.3, "t30_sec": 5.1, "ratio": 17.0}}},
    },
}

TIMINGS = {f"q{i:02d}_some_query_name_of_typical_length": 0.123 for i in range(31)}
COLD = {k: 0.456 for k in TIMINGS}


def test_headline_fits_tail_capture_with_full_query_set():
    """31 realistically-named queries + every scalar stays under the cap
    with margin — the normal-operation pin."""
    line = _headline_line(DETAIL, TIMINGS, COLD, 0.1, 3.813)
    assert len(line) < _HEADLINE_MAX_BYTES
    d = json.loads(line)
    assert d["metric"] == "total_wallclock_sec" and d["value"] == 3.813
    assert d["queries"] == TIMINGS
    assert d["scaling_max_ratio"] == 7.0
    assert d["deep_scale_factor"] == 30
    assert d["deep_scale_max_ratio"] == 17.0


def test_headline_key_follows_configured_deep_factor():
    """A non-default SPARK_GRAFT_SCALING_DEEP run must still land
    its deep-scale ratio — the key is matched dynamically, not hardcoded
    to factor30."""
    detail = json.loads(json.dumps(DETAIL))
    detail["scaling"]["factor20"] = detail["scaling"].pop("factor30")
    detail["scaling"]["factor20"]["factor"] = 20
    d = json.loads(_headline_line(detail, TIMINGS, COLD, 0.1, 1.0))
    assert d["deep_scale_factor"] == 20
    assert d["deep_scale_max_ratio"] == 17.0


def test_headline_scaling_disabled():
    """SPARK_GRAFT_SCALING=0 (scaling block None) degrades to null
    scalars, never a crash."""
    detail = dict(DETAIL, scaling=None)
    d = json.loads(_headline_line(detail, TIMINGS, COLD, 0.01, 1.0))
    assert d["scaling_max_ratio"] is None
    assert d["deep_scale_factor"] is None and d["deep_scale_max_ratio"] is None


def test_deep_scale_query_entries_surface_factor30_stages():
    """r11 verdict item #6: the deep-scale stage wall-clocks ride into
    the `queries` dict as d30_* ADDED entries (headline set + `value`
    untouched), so the driver's low-vs-high-core comparison sees stages
    with enough work to parallelize. Keys follow the configured factor;
    disabled scaling degrades to no additions."""
    extra = _deep_scale_query_entries(DETAIL)
    assert extra == {"d30_x76_exact_substring_matches": 5.1}
    # the merged line stays under the tail-capture cap with the full set
    merged = dict(TIMINGS, **extra)
    line = _headline_line(DETAIL, merged, COLD, 0.1, 3.813)
    assert len(line) < _HEADLINE_MAX_BYTES
    d = json.loads(line)
    assert d["value"] == 3.813  # still the headline-set total
    assert d["queries"]["d30_x76_exact_substring_matches"] == 5.1
    assert all(k in d["queries"] for k in TIMINGS)
    # no scaling block -> no entries, never a crash
    assert _deep_scale_query_entries(dict(DETAIL, scaling=None)) == {}
    # a non-default deep factor names its entries to match
    detail = json.loads(json.dumps(DETAIL))
    detail["scaling"]["factor20"] = detail["scaling"].pop("factor30")
    detail["scaling"]["factor20"]["factor"] = 20
    detail["scaling"]["factor20"]["stages"]["x76_exact_substring_matches"] = {
        "t1_sec": 0.3, "t20_sec": 4.0, "ratio": 13.3}
    assert _deep_scale_query_entries(detail) == {"d20_x76_exact_substring_matches": 4.0}


def test_oversized_headline_sheds_queries_not_the_contract():
    """If the query set ever balloons, the headline drops the per-query
    dict (sidecar keeps it) and STAYS a single valid under-cap JSON line
    — it must never error after the detail line printed, which would
    reproduce the r7 overflow."""
    big = {f"q{i:03d}_{'very_long_query_name' * 3}": 0.111 for i in range(200)}
    line = _headline_line(DETAIL, big, big, 0.1, 9.9)
    assert len(line) < _HEADLINE_MAX_BYTES
    d = json.loads(line)
    assert "queries" not in d
    assert "queries_dropped" in d
    assert d["value"] == 9.9 and d["deep_scale_max_ratio"] == 17.0
