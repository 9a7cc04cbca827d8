"""Differential tests: every registered query vs its DuckDB oracle.

Local replica of the driver's t2 gate (row count + schema-compatible dtypes
+ order-insensitive value equality), run at sf0.001 for speed; the driver
re-runs the same pairs at sf0.01.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from consensource_sds_spark.queries import REGISTRY, all_queries
from consensource_sds_spark.sql import INPUT_TABLES as TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

all_queries()  # populate REGISTRY


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif dt == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


ORACLE_CASES = sorted((n, q) for n, q in REGISTRY.items() if q.oracle is not None)
NO_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name,qd", ORACLE_CASES, ids=[n for n, _ in ORACLE_CASES])
def test_query_matches_oracle(spark, ddb, name, qd):
    got = _normalize(qd.fn(spark, SF_DIR).toPandas())
    want = _normalize(ddb.execute(qd.oracle).df())
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    for c in got.columns:  # schema-kind parity (driver compares schemas too)
        assert got[c].dtype.kind == want[c].dtype.kind, (
            f"{name}.{c}: dtype kind {got[c].dtype} != {want[c].dtype}"
        )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g.dtype):
            assert np.allclose(g.fillna(-1e308), w.fillna(-1e308), rtol=0, atol=1e-9), f"{name}.{c}"
        else:
            pd.testing.assert_series_equal(g, w, check_names=False, check_dtype=False, obj=f"{name}.{c}")


@pytest.mark.parametrize("name", NO_ORACLE)
def test_no_oracle_queries_run(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.count() >= 0


def test_epoch_day_floor_division_pre_1970(spark, ddb):
    """The day-number expression used by q62/q90/q93 —
    ``(ts_us - pmod(ts_us, day)) div day`` — must FLOOR like Python's
    ``//``, not truncate toward zero: both a bare Spark ``div`` AND
    DuckDB's integer ``//`` land every pre-1970 timestamp (negative
    ts_us) one day late, so the oracles spell the same pmod-style floor
    (pinned here against DuckDB's own evaluation of it). Crafted values
    straddle day boundaries on both sides of the epoch."""
    day = 86_400_000_000
    vals = [-2 * day, -day - 1, -day, -1, 0, 1, day - 1, day, 2 * day + 5]
    got = (
        spark.createDataFrame([(v,) for v in vals], "ts_us long")
        .selectExpr("ts_us", f"(ts_us - pmod(ts_us, {day})) div {day} AS d")
        .orderBy("ts_us")
        .collect()
    )
    want = {v: v // day for v in vals}
    duck = dict(
        ddb.execute(
            "SELECT ts_us, (ts_us - ((ts_us % 86400000000 + 86400000000) % 86400000000))"
            " // 86400000000 FROM (VALUES "
            + ",".join(f"({v}::BIGINT)" for v in vals)
            + ") t(ts_us)"
        ).fetchall()
    )
    for r in got:
        assert r["d"] == want[r["ts_us"]] == duck[r["ts_us"]], r


def _events_view(spark, tmp_path, rows):
    """Write a crafted events.parquet (testdata schema) and a DuckDB view
    over it; returns the duckdb connection (caller closes)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path / 'events.parquet'}/*.parquet'"
    )
    return con


def test_asof_tied_clicks_deterministic_on_both_engines(spark, tmp_path):
    """Crafted-events pin for q48's tie rule: two clicks by one user at the
    IDENTICAL timestamp before a purchase. DuckDB's bare ASOF JOIN picks an
    arbitrary equal-ts row, so the oracle collapses ties to MAX(event_id)
    — which is exactly what the Spark plan's ascending last() carries; the
    testdata has no tied (user_id, ts) pairs, so only a crafted corpus
    exercises this."""
    from datetime import datetime, timezone

    from consensource_sds_spark.queries.relational import q48_asof_join

    def t(s):
        return datetime.fromtimestamp(1700000000 + s, tz=timezone.utc).replace(tzinfo=None)

    rows = [
        (1, t(10), 7, "click", 1.0, None),
        (2, t(10), 7, "click", 1.0, None),  # tied with event 1
        (3, t(20), 7, "purchase", 5.0, None),
        (4, t(5), 8, "click", 1.0, None),   # control user
        (5, t(6), 8, "purchase", 2.0, None),
    ]
    con = _events_view(spark, tmp_path, rows)
    got = {
        r["purchase_id"]: r["click_id"] for r in q48_asof_join(spark, str(tmp_path)).collect()
    }
    assert got == {3: 2, 5: 4}  # the tied pair resolves to MAX event_id
    want = {a: b for a, _u, _pt, b, _ct in con.execute(REGISTRY["q48_asof_join"].oracle).fetchall()}
    con.close()
    assert want == got


def test_session_ties_split_identically_on_both_engines(spark, tmp_path):
    """Crafted-events pin for q51/q77's running-sum tiebreak: a user with
    two events at one timestamp where the FIRST tied row opens a new
    session. Without the event_id tiebreak the tied rows could land in
    different sessions depending on engine/run order."""
    from datetime import datetime, timezone

    from consensource_sds_spark.queries.relational import q51_sessionize_batch

    def t(s):
        return datetime.fromtimestamp(1700000000 + s, tz=timezone.utc).replace(tzinfo=None)

    rows = [
        (1, t(0), 7, "click", 1.0, None),
        # 40 min gap -> new session opens at the TIED pair
        (2, t(2400), 7, "click", 1.0, None),
        (3, t(2400), 7, "view", 2.0, None),
        (4, t(2500), 7, "click", 1.0, None),
    ]
    con = _events_view(spark, tmp_path, rows)
    got = sorted(
        (r["session_idx"], r["n_events"]) for r in q51_sessionize_batch(spark, str(tmp_path)).collect()
    )
    assert got == [(0, 1), (1, 3)]  # both tied rows in the SAME new session
    want = sorted(
        (idx, n)
        for _u, idx, _s, _e, n, _v in con.execute(REGISTRY["q51_sessionize_batch"].oracle).fetchall()
    )
    con.close()
    assert want == got


def test_hopping_windows_pre_1970_align_identically(spark, tmp_path):
    """Crafted-events pin for q61: ``F.window`` floor-aligns slide indexes,
    so a pre-1970 (negative-µs) event belongs to windows starting at
    floor multiples of the slide. The oracle's old truncating ``//``
    assigned such events one slide HIGH (and could even drop one of the
    two covering windows); the floor-division rewrite must agree
    exactly. The shipped fixture is all-2024, so only a crafted corpus
    exercises this (r9 review)."""
    from datetime import datetime, timezone

    from consensource_sds_spark.queries.relational import q61_hopping_windows

    def t(s):
        return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)

    rows = [
        (1, t(-601), 7, "click", 1.0, None),  # < -2 slides
        (2, t(-300), 7, "click", 1.0, None),  # exactly -1 slide boundary
        (3, t(-1), 7, "click", 1.0, None),    # just before the epoch
        (4, t(0), 7, "click", 1.0, None),     # the epoch itself
        (5, t(299), 7, "view", 1.0, None),    # first positive slide
    ]
    con = _events_view(spark, tmp_path, rows)
    got = _normalize(q61_hopping_windows(spark, str(tmp_path)).toPandas())
    want = _normalize(con.execute(REGISTRY["q61_hopping_windows"].oracle).df())
    con.close()
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every event covered by exactly width/slide = 2 windows on both sides
    assert int(got["n_events"].sum()) == 2 * len(rows)
