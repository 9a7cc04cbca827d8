"""Focused pins for the r11 ExactSubstr window-identity rework (x76/x77):
the shared double-xxhash64 window hash and x76's MAP-SIDE in-doc window
dedup (array_distinct inside the per-doc array, replacing the former
relation-wide distinct exchange).

The hand-crafted corpus here is the one shape the synthetic testdata never
produces (verified: sf0.01 has ZERO in-doc repeated windows, the hostile
fixture has ~12k): a document that contains the SAME W-token run twice.
x76's set semantics ("count of shared windows", each window once per doc
pair) only differs from bag semantics on exactly this shape, so these
expectations are computed by hand and would catch a dedup regression the
clean testdata cannot see. The full-registry hostile gate covers the same
path engine-vs-engine; this test keeps the semantics pinned with readable
expectations and no oracle in the loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from consensource_sds_spark.queries.extensions import (
    _X76_W,
    _x76_window_hashes,
    exact_substring_matches,
    exact_substring_scrub,
)


def _docs(spark):
    # R = 12 distinct tokens -> 12 - W + 1 = 5 stride-1 windows.
    r = " ".join(f"t{i}" for i in range(12))
    q = " ".join(f"u{i}" for i in range(12))
    return spark.createDataFrame(
        [
            (1, f"{r} {r}"),  # R twice: every R-window appears at i and i+12
            (2, r),  # shares ALL 5 R-windows with doc 1
            (3, q),  # shares nothing
            (4, None),  # null text: must vanish from x77's output
            (5, "short text"),  # < W tokens: no windows at all
        ],
        "doc_id long, text string",
    )


def _x76_pairs(d):
    """x76's ACTUAL frame-level body (`exact_substring_matches`) — shared
    with the registry entry so this suite can never pin a stale copy of
    the shape (the r11 pair-generation rework made the previous inlined
    copy a silent fork)."""
    return exact_substring_matches(d.select("doc_id", "text"))


def test_x76_in_doc_repeat_counts_each_window_once(spark):
    """Doc 1 holds run R twice; doc 2 holds R once. The 5 R-windows are
    shared — each counted ONCE for the (1,2) pair even though doc 1
    contains each twice (bag semantics would report 10). The 7 windows
    crossing doc 1's R|R seam exist only there and never pair."""
    rows = {(r.doc_a, r.doc_b): r.shared for r in _x76_pairs(_docs(spark)).collect()}
    assert rows == {(1, 2): 5}


def test_x76_pair_generation_triangle_and_cap(spark):
    """Pin for the r11 pair-generation internals (per-hash sorted doc
    lists -> i<j pairs, replacing the self-join): a run shared by FOUR
    docs must mint every unordered pair exactly once — C(4,2) = 6 pairs,
    each with shared = 5 windows, doc_a < doc_b — and the posting cap
    must still drop the hash BEFORE pair generation: with max_posting=3
    the 4-doc posting exceeds the cap and no pair survives."""
    r = " ".join(f"t{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(i, r) for i in (1, 2, 3, 4)], "doc_id long, text string"
    )
    rows = {
        (x.doc_a, x.doc_b): x.shared
        for x in exact_substring_matches(docs).collect()
    }
    assert rows == {(a, b): 5 for a in (1, 2, 3) for b in range(a + 1, 5)}
    assert exact_substring_matches(docs, max_posting=3).count() == 0


def test_x77_scrub_on_in_doc_repeats(spark):
    """Same corpus through the scrub: doc 1 (min doc_id) owns every
    shared window and keeps BOTH copies of R; doc 2's single copy is
    fully covered and scrubs to ''; doc 3 untouched; the NULL-text doc
    emits no row (posexplode semantics, pinned since r10); the short doc
    has no windows and survives verbatim."""
    out = {r.doc_id: r for r in exact_substring_scrub(_docs(spark).select("doc_id", "text")).collect()}
    assert set(out) == {1, 2, 3, 5}
    r1, r2, r3, r5 = out[1], out[2], out[3], out[5]
    r = " ".join(f"t{i}" for i in range(12))
    assert (r1.n_tokens, r1.n_removed) == (24, 0)
    assert r1.text_scrubbed == f"{r} {r}"
    assert (r2.n_tokens, r2.n_removed, r2.text_scrubbed) == (12, 12, "")
    assert (r3.n_tokens, r3.n_removed) == (12, 0)
    assert (r5.n_tokens, r5.n_removed, r5.text_scrubbed) == (2, 0, "short text")


def test_window_hash_identity_is_token_sequence_equality(spark):
    """The shared helper (one source for BOTH x76 and x77, so the match
    and scrub halves cannot drift): equal token sequences produce equal
    (h1, h2) structs wherever they occur; adjacent windows differ; and
    the two salted chains are not copies of each other."""
    r = " ".join(f"t{i}" for i in range(12))
    d = spark.createDataFrame([(1, f"{r} {r}"), (2, r)], "doc_id long, text string")
    win = (
        d.select("doc_id", F.split("text", " ").alias("ts"))
        .select("doc_id", F.posexplode(_x76_window_hashes(_X76_W)).alias("i0", "h"))
        .collect()
    )
    by_doc = {}
    for row in win:
        by_doc.setdefault(row.doc_id, []).append((row.i0, row.h))
    d1 = [h for _, h in sorted(by_doc[1])]
    d2 = [h for _, h in sorted(by_doc[2])]
    assert len(d1) == 17 and len(d2) == 5
    # doc 1's two R copies hash identically window-for-window...
    assert d1[0:5] == d1[12:17] == d2
    # ...adjacent (distinct) windows differ...
    assert len({(h.h1, h.h2) for h in d2}) == 5
    # ...and the second chain is independently salted, not h1 again
    assert all(h.h1 != h.h2 for h in d2)

def test_x76_duplicate_docid_rows_no_self_pairs(spark):
    """Frame-level contract (r12, from ADVICE): duplicate doc_id rows must
    not yield doc_a == doc_b pairs — the strict doc_a < doc_b filter
    restores the old self-join's exclusion."""
    run = " ".join(f"t{i}" for i in range(_X76_W + 2))
    docs = spark.createDataFrame(
        [(1, run), (1, run), (2, run)], "doc_id long, text string"
    )
    out = exact_substring_matches(docs).collect()
    assert all(r["doc_a"] < r["doc_b"] for r in out), out
    assert {(r["doc_a"], r["doc_b"]) for r in out} == {(1, 2)}
