"""BPE training property test: x74's distributed merge loop must agree
with an independent pure-Python reference implementation on arbitrary
corpora — greedy left-to-right apply, frequency-weighted pair counts, and
the (count DESC, pair ASC) tie-break are exactly where tokenizer
implementations subtly diverge, and the single-testdata DuckDB oracle
only pins one input. Hypothesis generates many."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from consensource_sds_spark.queries.extensions import _BPE_PSEP, _bpe_train_merges


def _reference_bpe(texts: list[str], n_merges: int):
    """Sennrich et al. 2016 reference: word-frequency table, symbol
    sequences, argmax pair by (count desc, pair-key asc with the same
    \\x02 separator the operator uses), greedy non-overlapping
    left-to-right merge."""
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if len(w) >= 2:
                vocab[w] += 1
    segs = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in segs.items():
            wc = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + _BPE_PSEP + kv[0][1]))
        (lhs, rhs), cnt = best
        merges.append((rank, lhs, rhs, cnt))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges


token = st.text(alphabet="abcde", min_size=1, max_size=6)
doc = st.lists(token, min_size=1, max_size=12).map(" ".join)


@pytest.mark.usefixtures("spark")
@given(texts=st.lists(doc, min_size=1, max_size=10), n_merges=st.integers(1, 5))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_matches_reference(spark, texts, n_merges):
    d = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = _bpe_train_merges(spark, d, n_merges)
    assert got == _reference_bpe(texts, n_merges)


def test_bpe_oracles_survive_merge_exhaustion(spark, tmp_path):
    """When the pair supply dries up before n_merges, the Spark loop breaks
    early; both unrolled DuckDB oracles must agree rather than annihilate.
    x74's empty b{k} branches contribute zero UNION rows (matching the
    break); x75's m{k} CTEs degrade to identity replaces via the scalar-
    subquery COALESCE — this pins the regression where an empty b{k} made
    the aseg x m0 x ... cross join return an empty apply result."""
    import duckdb

    from consensource_sds_spark.queries.extensions import (
        _bpe_apply_oracle,
        _bpe_oracle,
        x74_bpe_train,
        x75_bpe_tokenize,
    )

    # 'ab ab' exhausts after ONE merge (a+b -> ab, then no pairs remain)
    spark.createDataFrame([(1, "ab ab")], "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path / 'documents.parquet'}/*.parquet'"
    )
    n = 4
    got_train = [tuple(r) for r in x74_bpe_train(spark, str(tmp_path), n_merges=n).collect()]
    want_train = [tuple(r) for r in con.execute(_bpe_oracle(n)).fetchall()]
    assert got_train == want_train == [(1, "a", "b", 2)]
    got_apply = [tuple(r) for r in x75_bpe_tokenize(spark, str(tmp_path), n_merges=n).collect()]
    want_apply = [tuple(r) for r in con.execute(_bpe_apply_oracle(n)).fetchall()]
    con.close()
    assert got_apply == want_apply == [(1, 2, 2)]


# ---------------------------------------------------------------------------
# Batched BPE training (the scale path: top-M symbol-disjoint merges per
# pair-count job instead of top-1). Two pins: batch_m=1 degenerates to
# EXACT greedy on arbitrary corpora, and the batched selection semantics
# (snapshot top-8M candidates -> (cnt DESC, pk ASC) compatibility prefix)
# match an independent pure-Python mirror — so the only greedy divergence
# is the documented created-pair-ordering concession, never a counting or
# application bug.
# ---------------------------------------------------------------------------


def _reference_bpe_batched(texts: list[str], n_merges: int, batch_m: int):
    """Pure-Python mirror of _bpe_train_merges_batched: per round, rank
    the FULL pair snapshot by (count desc, pair-key asc), truncate to the
    top 8*batch_m (the Spark side's bounded driver collect), keep the
    pairwise symbol-disjoint prefix, apply all kept merges greedily
    left-to-right (disjoint merges commute), one round at a time."""
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if len(w) >= 2:
                vocab[w] += 1
    segs = {w: list(w) for w in vocab}
    merges = []
    rounds = 0
    while len(merges) < n_merges:
        pairs: Counter = Counter()
        for w, syms in segs.items():
            wc = vocab[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc
        rounds += 1
        if not pairs:
            break
        ranked = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + _BPE_PSEP + kv[0][1])
        )[: 8 * batch_m]
        sel, used = [], set()
        for (lhs, rhs), cnt in ranked:
            syms3 = {lhs, rhs, lhs + rhs}
            if used & syms3:
                continue
            sel.append((lhs, rhs, cnt))
            used |= syms3
            if len(sel) >= min(batch_m, n_merges - len(merges)):
                break
        for lhs, rhs, cnt in sel:
            merges.append((len(merges) + 1, lhs, rhs, cnt))
        for lhs, rhs, _cnt in sel:
            for w, syms in segs.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                segs[w] = out
    return merges, rounds


@pytest.mark.usefixtures("spark")
@given(texts=st.lists(doc, min_size=1, max_size=10), n_merges=st.integers(1, 5))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_batched_m1_equals_greedy(spark, texts, n_merges):
    """batch_m=1 IS exact greedy: each round's snapshot argmax is the
    greedy argmax, so the batched machinery must reproduce the reference
    merge-for-merge (counts included)."""
    from consensource_sds_spark.queries.extensions import _bpe_train_merges_batched

    d = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got, rounds = _bpe_train_merges_batched(spark, d, n_merges, batch_m=1)
    assert got == _reference_bpe(texts, n_merges)
    assert rounds >= len(got)


@pytest.mark.usefixtures("spark")
@given(
    texts=st.lists(doc, min_size=1, max_size=10),
    n_merges=st.integers(1, 8),
    batch_m=st.integers(2, 4),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_batched_matches_python_mirror(spark, texts, n_merges, batch_m):
    from consensource_sds_spark.queries.extensions import _bpe_train_merges_batched

    d = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got, got_rounds = _bpe_train_merges_batched(spark, d, n_merges, batch_m=batch_m)
    want, want_rounds = _reference_bpe_batched(texts, n_merges, batch_m)
    assert got == want
    assert got_rounds == want_rounds


def test_bpe_batched_rounds_scale_as_n_over_m(spark):
    """The point of batching: driver rounds (pair-count jobs) ≈ N/M, not
    N — on a corpus rich enough to fill every batch with compatible
    merges, 12 merges at batch_m=4 take ≤ 4 rounds, vs 12 for greedy."""
    from consensource_sds_spark.queries.extensions import _bpe_train_merges_batched

    texts = [" ".join(f"{a}{b}{a}{b}" for a in "abcdef" for b in "uvwxyz")] * 3
    d = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges, rounds = _bpe_train_merges_batched(spark, d, 12, batch_m=4)
    assert len(merges) == 12
    assert rounds <= 4


# ---------------------------------------------------------------------------
# x77 exact-substring scrub vs a pure-Python reference — ownership (min
# doc_id per cross-doc window), W-token coverage union, and in-order
# reconstruction are the subtle parts; the DuckDB oracle pins one input,
# hypothesis pins many (including overlap chains and all-covered docs).
# ---------------------------------------------------------------------------


def _reference_scrub(texts: dict[int, str], w: int):
    toks = {d: t.split(" ") for d, t in texts.items()}
    owner: dict[tuple, set] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - w + 1):
            owner.setdefault(tuple(ts[i : i + w]), set()).add(d)
    out = {}
    for d, ts in toks.items():
        cover = set()
        for i in range(len(ts) - w + 1):
            win = tuple(ts[i : i + w])
            docs = owner[win]
            if len(docs) >= 2 and d != min(docs):
                cover.update(range(i, i + w))
        kept = [t for i, t in enumerate(ts) if i not in cover]
        out[d] = (len(ts), len(cover), " ".join(kept))
    return out


@pytest.mark.usefixtures("spark")
@given(
    texts=st.lists(st.lists(token, min_size=1, max_size=14).map(" ".join), min_size=1, max_size=8),
    w=st.integers(2, 4),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_substring_scrub_matches_reference(spark, texts, w):
    from consensource_sds_spark.queries.extensions import exact_substring_scrub

    d = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_scrubbed"])
        for r in exact_substring_scrub(d, w=w).collect()
    }
    assert got == _reference_scrub(dict(enumerate(texts)), w)


@pytest.mark.usefixtures("spark")
@given(
    texts=st.lists(doc, min_size=1, max_size=10),
    n_merges=st.integers(1, 8),
    batch_m=st.integers(1, 4),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_incremental_trainer_matches_batched(spark, texts, n_merges, batch_m):
    """The incremental-pair-count trainer (r10 verdict #5) must produce
    the EXACT merge table of the full-recount batched trainer on
    arbitrary corpora — the standing counts table sees bit-identical
    integer counts, so selection order, snapshot counts, and round
    structure all agree; only the per-round job shape differs."""
    from consensource_sds_spark.queries.extensions import (
        _bpe_train_merges_batched,
        _bpe_train_merges_incremental,
    )

    d = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got, rounds_inc = _bpe_train_merges_incremental(spark, d, n_merges, batch_m=batch_m)
    want, rounds_bat = _bpe_train_merges_batched(spark, d, n_merges, batch_m=batch_m)
    assert got == want
    assert rounds_inc == rounds_bat


@pytest.mark.usefixtures("spark")
@given(texts=st.lists(doc, min_size=1, max_size=8), n_merges=st.integers(1, 8))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scalable_apply_matches_replace_chain(spark, texts, n_merges):
    """The production BPE apply (rank-priority loop in an Arrow UDF,
    merge table of ANY size) must segment every distinct word exactly
    like the chained-replace form x75 uses at oracle N — full
    segmentations compared, not just counts. Trained tables carry the
    creation-order property that makes the two algorithms equivalent
    (_bpe_validate_freshness)."""
    from pyspark.sql import functions as F

    from consensource_sds_spark.queries.extensions import (
        _BPE_SEP,
        _bpe_seg_expr,
        _bpe_segment_words_scalable,
        _bpe_train_merges,
    )

    d = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = _bpe_train_merges(spark, d, n_merges)
    words = d.select(F.explode(F.split("text", " ")).alias("w")).filter(F.length("w") >= 1)

    # chain form: the same nested-replace construction as x75/x81
    seg = _bpe_seg_expr("w")
    for _rank, lhs, rhs, _cnt in merges:
        seg = F.replace(
            seg,
            F.lit("\x01" + lhs + _BPE_SEP + rhs + "\x01"),
            F.lit("\x01" + lhs + rhs + "\x01"),
        )
    chain = {
        r["w"]: [s for s in r["segstr"].split(_BPE_SEP) if s]
        for r in words.distinct().select("w", seg.alias("segstr")).collect()
    }
    fast = {
        r["w"]: list(r["seg"])
        for r in _bpe_segment_words_scalable(words, merges).collect()
    }
    assert fast == chain


def test_freshness_violating_table_rejected():
    """A merge table where an earlier merge references a later merge's
    output diverges between the chain and priority algorithms — it must
    be rejected loudly, not silently tokenized differently."""
    from consensource_sds_spark.queries.extensions import _bpe_validate_freshness

    with pytest.raises(ValueError, match="creation order"):
        _bpe_validate_freshness([(1, "a", "bc", 5), (2, "b", "c", 4)])
    # a well-ordered table passes
    _bpe_validate_freshness([(1, "b", "c", 5), (2, "a", "bc", 4)])


def test_scalable_apply_survives_tokenizer_scale_merge_table(spark):
    """At tokenizer-realistic N the chained-replace form dies outright
    (java.lang.StackOverflowError converting the 1024-deep Column tree —
    measured on this Spark build), so the production path must carry it:
    a 2048-merge creation-ordered table applied over words, checked
    against a pure-python sequential full-replace reference (the chain's
    exact semantics, word-local so no expression tree)."""
    import string

    from consensource_sds_spark.queries.extensions import (
        _bpe_segment_words_scalable,
        _bpe_validate_freshness,
    )

    def synth_merges(n: int):
        letters = string.ascii_letters
        merges, rank = [], 1
        for i in range(len(letters) - 1):
            if rank > n:
                break
            merges.append((rank, letters[i], letters[i + 1], 100))
            rank += 1
        base = [lhs + rhs for _, lhs, rhs, _ in merges]
        while rank <= n and base:
            nxt = []
            for s in base:
                if rank > n:
                    break
                merges.append((rank, s, s[-1], 50))
                rank += 1
                nxt.append(s + s[-1])
            base = nxt
        return merges[:n]

    def reference_apply(word: str, merges) -> list[str]:
        # sequential full replaces in rank order — the chain's semantics
        syms = list(word)
        for _rank, lhs, rhs, _cnt in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    merges = synth_merges(2048)
    assert len(merges) == 2048
    _bpe_validate_freshness(merges)
    texts = ["abcd", "aabbccdd", "abab", "zzz", "a", "xyz", "abcdefgh", "ba"]
    words = spark.createDataFrame([(w,) for w in texts], "w string")
    got = {
        r["w"]: list(r["seg"])
        for r in _bpe_segment_words_scalable(words, merges).collect()
    }
    assert got == {w: reference_apply(w, merges) for w in texts}


def _live_checkpoint_rdds(spark) -> int:
    """Count of RDDs currently holding storage blocks (localCheckpoints
    included) — the footprint the eager-free hygiene bounds."""
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_free_local_checkpoint_releases_blocks_now(spark):
    """The eager free must actually release storage on THIS Spark build —
    if the internal plan-RDD accessor drifts, _free_local_checkpoint
    degrades to a silent no-op and the trainers quietly regain their
    GC-lag footprint; this pin turns that drift into a test failure. Also
    pins the safety property the callers rely on: a freed checkpoint
    fails LOUDLY on read (blocks are gone, lineage was truncated), it
    never silently recomputes wrong data."""
    from consensource_sds_spark.queries.extensions import _free_local_checkpoint

    df = spark.range(100_000).localCheckpoint()
    n0 = _live_checkpoint_rdds(spark)
    _free_local_checkpoint(df)
    assert _live_checkpoint_rdds(spark) == n0 - 1
    with pytest.raises(Exception, match="CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND"):
        df.count()


def test_trainer_checkpoint_hygiene_bounds_live_storage(spark):
    """A long training must not accumulate one live checkpoint per round:
    superseded vocab/counts checkpoints are freed as soon as their
    successor materializes, and the trainer-owned finals are freed on
    return (only the plain-python merge list leaves the function).
    Measured WITHOUT the eager free, a 128-round training's live set
    oscillated up to 59 checkpointed RDDs (355 MB) on ContextCleaner
    lag; with it the delta after a multi-round training is ~0."""
    from consensource_sds_spark.queries.extensions import (
        _bpe_train_merges_batched,
        _bpe_train_merges_incremental,
    )

    texts = [" ".join("abcab abcb ccab bcab cabc".split()) for _ in range(20)]
    d = spark.createDataFrame([(t,) for t in texts], "text string")
    before = _live_checkpoint_rdds(spark)
    merges, rounds = _bpe_train_merges_incremental(spark, d, 12, batch_m=2)
    assert rounds >= 3 and merges  # superseded several checkpoint pairs
    after = _live_checkpoint_rdds(spark)
    assert after <= before, f"live checkpoints grew {before} -> {after}"
    # the batched recount trainer gets the same hygiene
    before = _live_checkpoint_rdds(spark)
    merges_b, rounds_b = _bpe_train_merges_batched(spark, d, 12, batch_m=2)
    assert rounds_b >= 3 and merges_b == merges  # same table, same data
    assert _live_checkpoint_rdds(spark) <= before
