"""Arbitrary stateful processing on the Spark 4 ``transformWithState`` API.

``streaming/sessions.py`` uses ``applyInPandasWithState`` (the Spark 3.4+
stateful operator); this module is the same capability on its successor —
``StatefulProcessor`` + ``transformWithStateInPandas`` — which adds typed
composite state (value/list/map), state TTL, and timers as first-class
handles. Running per-key totals is the reference shape: the state schema,
batch accumulation, and update-mode emission carry over to any
register-style aggregate a pipeline keeps per entity (rate counters,
last-seen markers, per-user quotas).

State is checkpoint-backed (RocksDB/HDFS state store on a cluster), so the
totals survive restarts exactly-once per batch; at 100 TB state shards by
the grouping key — the per-key footprint here is two scalars.

Environment note: the transformWithState protocol serializes its control
messages with protobuf; this container has no ``google.protobuf``, so the
operator can only be smoke-tested where that wheel exists.
:func:`api_available` reports it, the test suite skips accordingly, and
``streaming/sessions.py`` (applyInPandasWithState, no protobuf dependency)
remains the tested stateful path here.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"


def api_available() -> bool:
    """True when the runtime can actually execute transformWithState
    (its state-server protocol needs the protobuf python package)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return False
    return True

_STATE_SCHEMA = "n BIGINT, cents BIGINT"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user event count + value sum, emitted after every batch that
    touches the key (update mode). Money accumulates in integer cents in
    the checkpointed state (the package's decimal discipline, as in
    streaming/sessions.py) — a DOUBLE accumulator would compound binary
    rounding drift across thousands of batches."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        from consensource_sds_spark.streaming.sessions import _cents

        n, cents = 0, 0
        if self._totals.exists():
            prev = self._totals.get()
            n, cents = int(prev[0]), int(prev[1])
        for pdf in rows:
            n += len(pdf)
            # per-value SQL-round (HALF_UP) via the sessions helper — the
            # pandas .round() this replaced was banker's (0.125 -> 12, SQL:
            # 13), and its astype('int64') CRASHED the whole microbatch on
            # one NULL/NaN value (IntCastingNaNError); non-finite values
            # count the event but contribute 0 cents instead (r9 review)
            cents += sum(
                _cents(float(v))
                for v in pdf["value"]
                if pd.notna(v) and math.isfinite(float(v))
            )
        self._totals.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    def close(self) -> None:
        pass


def running_totals(events: DataFrame) -> DataFrame:
    """events(user_id, value, ...) -> cumulative (user_id, n_events,
    total_value), one row per updated key per microbatch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
