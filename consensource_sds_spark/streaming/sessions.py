"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

Session windows (close a user's session after ``gap`` seconds of
inactivity) cannot be expressed as a tumbling/sliding window aggregate —
the window boundary depends on the data itself — so this is the designated
escape hatch: Arrow-batched per-key stateful processing
(``applyInPandasWithState``), the Spark-idiomatic replacement for a
hand-rolled per-key state store.

Semantics:

- state per user: (session_start, last_ts, n_events, value_cents);
- an incoming event whose gap from ``last_ts`` exceeds ``gap_sec`` CLOSES
  the running session (emit) and starts a new one;
- an idle session closes via event-time timeout once the watermark passes
  ``last_ts + gap_sec`` — so state is bounded by the number of ACTIVE
  users, the streaming equivalent of the SCD2 store's O(live) working set;
- output rows are final (append semantics): a session is emitted exactly
  once, when it closes.

Scale: state lives in the executor state store keyed by user_id — one
shuffle on the grouping key; Arrow moves each group's batch to Python
vectorized, not row-at-a-time. Money is accumulated in integer cents
(exact), mirroring the engine's decimal discipline.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start_us", LongType(), False),
        StructField("session_end_us", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType(), False),
        StructField("last_ts_us", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("value_cents", LongType(), False),
    ]
)


def sessionize(events: DataFrame, gap_sec: int = 30, watermark: str = "30 seconds") -> DataFrame:
    """events(user_id, ts: timestamp, value: double) -> closed sessions.

    Works only under Structured Streaming (state requires a stream); for
    batch backfill the equivalent is the classic lag()-gap-cumsum window
    plan (see tests for the parity check)."""
    gap_us = gap_sec * 1_000_000

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, int, float]] = []
        if state.hasTimedOut:
            # idle session: watermark passed last_ts + gap
            start_us, last_us, n, cents = state.get
            closed.append((user_id, start_us, last_us, n, cents / 100.0))
            state.remove()
        else:
            dfs = list(pdfs)  # the iterator object itself is always truthy
            rows = pd.concat(dfs) if dfs else pd.DataFrame()
            # fold the stored session INTERVAL and the batch's events into
            # gap-merged sessions, in interval order: a late-but-in-watermark
            # event older than the stored start must extend the session's
            # start downward (or form its own earlier session when separated
            # by more than gap) — folding events only against last_ts would
            # silently absorb it with session_start_us left too high
            items: list[tuple[int, int, int, int]] = []  # (start, end, n, cents)
            if state.exists:
                items.append(tuple(state.get))
            if len(rows):
                rows = rows.sort_values("ts")
                for ts, value in zip(rows["ts"], rows["value"]):
                    ts_us = int(ts.value // 1_000)  # pandas ns -> us
                    items.append((ts_us, ts_us, 1, int(round(value * 100))))
            if items:
                items.sort(key=lambda it: (it[0], it[1]))
                cur = list(items[0])
                for s, e, n, c in items[1:]:
                    if s - cur[1] > gap_us:
                        closed.append((user_id, cur[0], cur[1], cur[2], cur[3] / 100.0))
                        cur = [s, e, n, c]
                    else:
                        cur[1] = max(cur[1], e)
                        cur[2] += n
                        cur[3] += c
                state.update(tuple(cur))
                # close when the watermark passes the inactivity horizon
                state.setTimeoutTimestamp(cur[1] // 1_000 + gap_sec * 1_000)
        if closed:
            yield pd.DataFrame(
                closed,
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
