"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

Session windows (close a user's session after ``gap`` seconds of
inactivity) cannot be expressed as a tumbling/sliding window aggregate —
the window boundary depends on the data itself — so this is the designated
escape hatch: Arrow-batched per-key stateful processing
(``applyInPandasWithState``), the Spark-idiomatic replacement for a
hand-rolled per-key state store.

Semantics:

- state per user: the user's OPEN session intervals (parallel arrays of
  start/end/n/cents) — plural, because an interval separated from its
  neighbor by more than ``gap`` is still not FINAL until the watermark
  proves no admissible event can bridge or extend it;
- a session is emitted exactly once, when the watermark passes
  ``session_end + gap`` — never merely because a later same-batch event
  crossed the gap (an above-watermark event in a LATER batch may legally
  land between two in-batch events and merge them; eager emission would
  then produce overlapping sessions in the append sink);
- idle sessions close via event-time timeout once the watermark passes
  the earliest pending ``end + gap`` horizon — state is bounded by the
  number of ACTIVE users times their not-yet-final intervals inside the
  watermark horizon, the streaming equivalent of the SCD2 store's
  O(live) working set.

Scale: state lives in the executor state store keyed by user_id — one
shuffle on the grouping key; Arrow moves each group's batch to Python
vectorized, not row-at-a-time. Money is accumulated in integer cents
(exact), HALF_UP like SQL ``round`` — the q51 batch twin
(``queries/relational.py``) and :mod:`streaming.windows` use
``cast(round(value * 100) AS bigint)``, and stream/batch parity holds on
exact-half cents only if this module rounds the same way (Python's
builtin ``round`` is banker's HALF_EVEN: 12.5 -> 12, where SQL gives 13).
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        # nullable: a NULL user_id is a valid group on both engines (the
        # q51 batch twin groups NULL users together), so the stream must
        # carry the key through instead of failing the Arrow conversion
        StructField("user_id", LongType(), True),
        StructField("session_start_us", LongType(), False),
        StructField("session_end_us", LongType(), False),
        StructField("n_events", LongType(), False),
        # nullable: an all-NULL-value session's total is NULL (SQL SUM)
        StructField("total_value", DoubleType(), True),
    ]
)

#: NOTE (r10): the state struct gained ``n_valued`` — a checkpoint
#: written by the 4-array schema will not restore against this one
#: (Spark's state-schema compatibility check rejects it). Restart such a
#: stream with a fresh checkpoint and re-deliver from the source; the
#: append sink's emitted sessions are unaffected.
_STATE_SCHEMA = StructType(
    [
        StructField("starts_us", ArrayType(LongType()), False),
        StructField("ends_us", ArrayType(LongType()), False),
        StructField("n_events", ArrayType(LongType()), False),
        StructField("value_cents", ArrayType(LongType()), False),
        # count of NON-NULL-valued events per interval: SQL SUM over an
        # all-NULL group is NULL, not 0 — the q51 batch twin emits NULL
        # total_value for such a session and the stream must too
        StructField("n_valued", ArrayType(LongType()), False),
    ]
)


def _cents(value: float) -> int:
    """SQL-``round`` (HALF_UP on the double's shortest decimal repr, the
    BigDecimal.valueOf path Spark's round takes) — NOT Python ``round``
    (HALF_EVEN), so the stream's cents match the q51 batch twin's.

    A NULL value (NaN after the Arrow transfer) contributes 0 cents —
    SQL SUM skips NULLs while the event still counts in n_events; fed to
    Decimal it instead raised and ABORTED the whole stream on the first
    NULL-value event (hostile-delivery finding)."""
    if value is None or value != value:  # NaN/None: SQL SUM skips
        return 0
    return int(Decimal(repr(value * 100)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def sessionize(events: DataFrame, gap_sec: int = 30, watermark: str = "30 seconds") -> DataFrame:
    """events(user_id, ts: timestamp, value: double) -> closed sessions.

    Works only under Structured Streaming (state requires a stream); for
    batch backfill the equivalent is the classic lag()-gap-cumsum window
    plan (see tests for the parity check).

    NULL-timestamp events are filtered like the q51 batch twin's
    ``ts IS NOT NULL``: they have no position on the time axis, and left
    in they arrive as NaT whose ``.value`` is int64-min — a silent
    bogus pre-epoch session that emits immediately (hostile-delivery
    finding)."""
    events = events.filter(events["ts"].isNotNull())
    gap_us = gap_sec * 1_000_000

    def horizon_ms(end_us: int) -> int:
        # first watermark (ms) at which NO admissible event (ts >= wm) can
        # still merge with an interval ending at end_us: merge needs
        # ts_us <= end_us + gap_us, so final iff wm_ms > (end+gap)//1000
        return (end_us + gap_us) // 1_000 + 1

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        wm_ms = state.getCurrentWatermarkMs()
        # fold the stored intervals and the batch's events into gap-merged
        # intervals, in interval order: a late-but-in-watermark event older
        # than a stored start must extend that session's start downward (or
        # form its own earlier session when separated by more than gap)
        items: list[list[int]] = []  # [start_us, end_us, n, cents, n_valued]
        if state.exists:
            items += [list(t) for t in zip(*state.get)]
        if not state.hasTimedOut:
            dfs = list(pdfs)  # the iterator object itself is always truthy
            rows = pd.concat(dfs) if dfs else pd.DataFrame()
            if len(rows):
                for ts, value in zip(rows["ts"], rows["value"]):
                    ts_us = int(ts.value // 1_000)  # pandas ns -> us
                    valued = 0 if (value is None or value != value) else 1
                    items.append([ts_us, ts_us, 1, _cents(value), valued])
        merged: list[list[int]] = []
        for it in sorted(items, key=lambda it: (it[0], it[1])):
            if merged and it[0] - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], it[1])
                merged[-1][2] += it[2]
                merged[-1][3] += it[3]
                merged[-1][4] += it[4]
            else:
                merged.append(it)
        # emit ONLY watermark-final intervals; gap-separated-but-reachable
        # ones stay in state (a later batch's above-watermark event may
        # still bridge them)
        final = [iv for iv in merged if horizon_ms(iv[1]) <= wm_ms]
        pending = [iv for iv in merged if horizon_ms(iv[1]) > wm_ms]
        if pending:
            state.update(tuple([iv[i] for iv in pending] for i in range(5)))
            # wake at the earliest pending horizon (strictly after the
            # current watermark, as the state API requires)
            state.setTimeoutTimestamp(max(min(horizon_ms(iv[1]) for iv in pending), wm_ms + 1))
        elif state.exists:
            state.remove()
        if final:
            yield pd.DataFrame(
                [
                    # all-NULL-value session: SUM over no non-NULL values
                    # is NULL, matching the batch twin's SQL semantics
                    (user_id, s, e, n, (c / 100.0) if nv else None)
                    for s, e, n, c, nv in final
                ],
                columns=["user_id", "session_start_us", "session_end_us", "n_events", "total_value"],
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_session_stream(spark, source_dir: str, out_dir: str, checkpoint_dir: str, schema, gap_sec: int = 30):
    """File-source shell -> closed sessions into an append parquet sink."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        sessionize(stream, gap_sec=gap_sec)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
