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
from pathlib import Path
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

#: State layout versions (stored in ``meta[0]``):
#:   1 — 4 parallel arrays (r9)
#:   2 — + ``n_valued`` (r10; struct change, checkpoint-breaking vs v1)
#:   3 — + ``meta`` reserved array (r11; struct change, checkpoint-breaking
#:       vs v1/v2 — the LAST breaking one by design: future evolutions
#:       change ``meta``'s CONTENTS (data, not schema) or claim one of its
#:       spare slots, which Spark's state-schema compatibility check does
#:       not reject)
_STATE_VERSION = 3
#: ``meta`` is a fixed-length reserved array: slot 0 carries the layout
#: version, slots 1..7 are zero spares for future per-user scalars.
_META_SLOTS = 8
#: Sidecar written into the checkpoint dir so an incompatible restore is
#: caught at stream START with an actionable message instead of Spark's
#: state-schema error surfacing mid-batch from an executor.
_VERSION_SIDECAR = "_sds_session_state_version"

#: NOTE: checkpoints written by the v1 (4-array, r9) or v2 (5-array, r10)
#: layout will NOT restore against this struct — Spark's state-schema
#: compatibility check rejects the added column. Recovery runbook
#: (SCALE.md "Session state schema migration"): drain the old binary
#: (stop after a trigger with no pending state, i.e. the sink has emitted
#: every open session), then restart the new binary with a FRESH
#: checkpoint and re-deliver from the source; the append sink is keyed by
#: emitted-once semantics so replayed already-final sessions are the only
#: dedup concern. From v3 on, evolutions use the ``meta`` spare slots and
#: are restore-compatible.
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
        # [version, 0, 0, 0, 0, 0, 0, 0] — see _STATE_VERSION/_META_SLOTS
        StructField("meta", ArrayType(LongType()), False),
    ]
)


class SessionStateVersionError(RuntimeError):
    """Raised at stream start when the checkpoint was written by an
    incompatible session-state layout. Carries the remedy in the message."""


def check_state_compat(checkpoint_dir: str) -> None:
    """Guard an existing checkpoint against an incompatible state layout.

    Spark's own state-schema compatibility check catches struct changes,
    but only once a batch runs, as an opaque executor error. This sidecar
    check runs at stream START: a checkpoint stamped with a different
    layout version (or a pre-v3 checkpoint with state files but no stamp)
    fails fast with the drain-and-restart remedy. New checkpoints are
    stamped with the current version."""
    import os

    ckpt = Path(checkpoint_dir)
    sidecar = ckpt / _VERSION_SIDECAR
    remedy = (
        "session state layout v%d cannot restore a checkpoint written by "
        "layout v%s. Remedy: drain the old job (let every open session "
        "emit), then restart with a FRESH checkpoint directory and "
        "re-deliver from the source (see SCALE.md 'Session state schema "
        "migration')."
    )
    if sidecar.exists():
        stamped = int(sidecar.read_text().strip() or 0)
        if stamped != _STATE_VERSION:
            raise SessionStateVersionError(remedy % (_STATE_VERSION, stamped))
        return
    # no stamp: a pre-v3 checkpoint with committed state is v1/v2
    if (ckpt / "state").exists() and any(os.scandir(ckpt / "state")):
        raise SessionStateVersionError(remedy % (_STATE_VERSION, "<=2 (unstamped)"))
    ckpt.mkdir(parents=True, exist_ok=True)
    sidecar.write_text(str(_STATE_VERSION))


def _cents(value: float) -> int:
    """SQL-``round`` (HALF_UP on the double's shortest decimal repr, the
    BigDecimal.valueOf path Spark's round takes) — NOT Python ``round``
    (HALF_EVEN), so the stream's cents match the q51 batch twin's.

    A NULL value (NaN after the Arrow transfer) contributes 0 cents —
    SQL SUM skips NULLs while the event still counts in n_events; fed to
    Decimal it instead raised and ABORTED the whole stream on the first
    NULL-value event (hostile-delivery finding).

    ENGINE-INHERENT CONFLATION: Arrow maps SQL NULL to NaN in a float64
    batch, so a GENUINE NaN value is indistinguishable from NULL here and
    is likewise skipped — whereas the q51 batch twin's SQL SUM would
    propagate NaN (or abort under ANSI). Producers that can emit real NaN
    must filter/normalize it upstream on BOTH engines (same contract as
    the NULL-timestamp filter in :func:`sessionize`)."""
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
            stored = state.get
            meta = list(stored[5])
            # defensive: a same-struct layout evolution (meta slot claimed)
            # passes Spark's schema check — the version stamp is the guard
            if not meta or meta[0] != _STATE_VERSION:
                raise SessionStateVersionError(
                    f"restored session state carries layout v{meta[0] if meta else '?'}, "
                    f"this binary is v{_STATE_VERSION}; drain + fresh checkpoint "
                    "(SCALE.md 'Session state schema migration')"
                )
            items += [list(t) for t in zip(*stored[:5])]
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
            meta_out = [_STATE_VERSION] + [0] * (_META_SLOTS - 1)
            state.update(tuple([iv[i] for iv in pending] for i in range(5)) + (meta_out,))
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
    """File-source shell -> closed sessions into an append parquet sink.

    Fails fast (``SessionStateVersionError``) when ``checkpoint_dir`` was
    written by an incompatible state layout — see :func:`check_state_compat`."""
    check_state_compat(checkpoint_dir)
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
