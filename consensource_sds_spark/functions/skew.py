"""Skew-mitigation primitives: salted aggregation and salted joins.

AQE's skew-join splitting (SCALE.md) handles most hot keys at runtime, but
two cases still need explicit salting on a 1000-executor cluster:

- aggregation skew: one groupBy key holding a double-digit percent of the
  rows serializes its partial merge onto one reducer; AQE cannot split an
  aggregation key;
- join skew where the skewed side must shuffle (both sides large) and the
  hot key exceeds what AQE's split threshold can amortize.

Salts here are DETERMINISTIC (content hash % buckets, not rand()): task
retries and speculative execution re-produce identical salted rows, so the
helpers stay exactly-once-safe and results are stable under any
re-partitioning (the repo-wide determinism rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def _row_salt(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt: xxhash64 over all columns, spread across
    ``buckets``. Identical rows share a salt — fine: salting only needs to
    split a KEY's rows across reducers, and duplicate full rows are exactly
    the payload partial aggregation collapses anyway."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(keys + salt) then
    groupBy(keys), for the re-aggregable functions ``count``/``sum``/
    ``min``/``max``. A hot key's rows fan out over ``buckets`` reducers in
    phase 1; phase 2 merges ``buckets`` partials per key — O(buckets), not
    O(rows).

    ``aggs`` maps output column -> "fn(col)", e.g. {"n": "count(*)",
    "qty": "sum(l_quantity)"}."""
    import re

    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    phase1 = df.withColumn(SALT_COL, _row_salt(df, buckets)).groupBy(
        *keys, SALT_COL
    )
    p1_cols, p2_cols = [], []
    for out, expr in aggs.items():
        # the spec must be EXACTLY fn(args) — arithmetic wrapping like
        # "sum(x)+1" parses its fn prefix fine but is NOT re-aggregable
        # (phase 2 would merge the +1 once per occupied salt bucket:
        # silent inflation, the corruption class these guards reject)
        m = re.fullmatch(r"\s*(\w+)\s*\((.*)\)\s*", expr, re.S)
        fn = m.group(1).lower() if m else None
        if m is not None:
            # the greedy capture accepts "min(x) + max(y" + the trailing
            # ')' — require the argument text itself to be paren-balanced
            # so compound expressions cannot masquerade as one call
            depth = 0
            for ch in m.group(2):
                depth += ch == "("
                depth -= ch == ")"
                if depth < 0:
                    fn = None
                    break
            if depth != 0:
                fn = None
        if fn not in merge_fn:
            raise ValueError(
                f"{expr!r} is not a re-aggregable fn(col) spec "
                f"(supported: {sorted(merge_fn)}); salting would change its value"
            )
        if "distinct" in expr.lower():
            # count(distinct x) per salt bucket then summed counts a value
            # once PER BUCKET it lands in — silently inflated, the exact
            # class of corruption this guard exists to reject
            raise ValueError(
                f"{expr!r}: DISTINCT aggregates are not re-aggregable across salt buckets"
            )
        p1_cols.append(F.expr(f"{expr} AS {out}"))
        p2_cols.append(F.expr(f"{merge_fn[fn]}({out}) AS {out}"))
    return phase1.agg(*p1_cols).groupBy(*keys).agg(*p2_cols)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the skewed side gets a deterministic row salt;
    the other side is replicated ``buckets`` times (explode over the salt
    range) so every (key, salt) bucket finds its match. Join key becomes
    (key, salt) — the hot key spreads over ``buckets`` reducers.

    Use when BOTH sides are too big to broadcast and AQE's split threshold
    can't absorb the hot key; the replicated side costs buckets x its size,
    so keep it the smaller one.

    Only ``inner``/``left`` (skewed-side-preserving) joins are supported:
    with ``right``/``full``, an unmatched replicated-side row would surface
    once per salt bucket (buckets-fold duplication of null-extended rows).

    LIMITATION: the salt is a content hash, so FULL-ROW DUPLICATES on the
    skewed side all land in one bucket — _row_salt's duplicate-rows-share-
    a-salt rationale holds for aggregation (map-side combine collapses
    them) but not for joins. If the hot key's rows are mostly identical
    (e.g. the frame was projected down to the key plus low-cardinality
    columns), keep a high-cardinality column (an id, an offset) in the
    frame so the hash can spread them; a nondeterministic rand() salt
    would spread anything but breaks the repo's retry/replay determinism
    rule."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: outer "
            "joins would emit unmatched replicated rows once per salt bucket"
        )
    salted = skewed.withColumn(SALT_COL, _row_salt(skewed, buckets))
    replicated = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return salted.join(replicated, [key, SALT_COL], how).drop(SALT_COL)
