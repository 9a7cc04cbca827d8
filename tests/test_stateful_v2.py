"""transformWithState (Spark 4 stateful API): state accumulates across
microbatches and emits per-key updates."""

from __future__ import annotations

import pytest
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from consensource_sds_spark.streaming.stateful_v2 import api_available, running_totals

SCHEMA = StructType(
    [StructField("user_id", LongType(), False), StructField("value", DoubleType(), False)]
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


@pytest.mark.skipif(
    not api_available(),
    reason="transformWithState needs google.protobuf (absent in this container); "
    "sessions.py covers stateful streaming here",
)
def test_running_totals_accumulate_across_batches(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write(spark, src, [(1, 10.0), (1, 5.0), (2, 1.0)])   # batch 1
    _write(spark, src, [(1, 2.5), (3, 7.0)])              # batch 2
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        running_totals(stream)
        .writeStream.outputMode("update")
        # parquet sinks are append-only; update-mode emissions land via
        # foreachBatch (each batch's updated keys appended, latest wins)
        .foreachBatch(lambda df, _bid: df.write.mode("append").parquet(out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(out).collect()
    # final (latest) emission per user: user 1 saw both batches
    latest = {}
    for r in rows:
        latest[r["user_id"]] = max(
            (r["n_events"], r["total_value"]), latest.get(r["user_id"], (0, 0.0))
        )
    assert latest[1] == (3, 17.5), latest
    assert latest[2] == (1, 1.0)
    assert latest[3] == (1, 7.0)


def test_processor_logic_with_fake_state_handle():
    """The processor's accumulation contract, unit-tested without the
    state-server protocol: resumes from existing state and folds every
    batch chunk."""
    import pandas as pd

    class _FakeValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class _FakeHandle:
        def __init__(self):
            self.state = _FakeValueState()

        def getValueState(self, name, schema):
            return self.state

    from consensource_sds_spark.streaming.stateful_v2 import RunningTotalsProcessor

    proc = RunningTotalsProcessor()
    handle = _FakeHandle()
    proc.init(handle)
    out1 = list(
        proc.handleInputRows((1,), iter([pd.DataFrame({"value": [10.0, 5.0]})]), None)
    )
    assert out1[0].iloc[0].tolist() == [1, 2, 15.0]
    out2 = list(proc.handleInputRows((1,), iter([pd.DataFrame({"value": [2.5]})]), None))
    assert out2[0].iloc[0].tolist() == [1, 3, 17.5]
    # checkpointed state holds integer cents (decimal discipline)
    assert handle.state.get() == (3, 1750)


def test_processor_survives_nulls_and_rounds_half_up():
    """Regression (r9 review): one NULL/NaN value previously crashed the
    whole microbatch (IntCastingNaNError from astype), and pandas
    .round() was banker's (0.125 -> 12 cents where SQL and the sessions
    twin give 13). Non-finite values count the event, contribute 0."""
    import math

    import pandas as pd

    class _FakeValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class _FakeHandle:
        def __init__(self):
            self.state = _FakeValueState()

        def getValueState(self, name, schema):
            return self.state

    from consensource_sds_spark.streaming.stateful_v2 import RunningTotalsProcessor

    proc = RunningTotalsProcessor()
    proc.init(_FakeHandle())
    out = list(
        proc.handleInputRows(
            (1,),
            iter([pd.DataFrame({"value": [0.125, None, math.inf, 1.0]})]),
            None,
        )
    )
    # 4 events; cents = 13 (HALF_UP, not banker's 12) + 0 + 0 + 100
    assert out[0].iloc[0].tolist() == [1, 4, 1.13]
