"""Hypothesis stateful property: ANY interleaving of apply / compact /
fork-rewind / crash-then-replay converges the store to a pure-Python SCD2
oracle over a small block/key alphabet (VERDICT r2 hardening item).

The oracle replays the surviving chain (fork at b discards blocks >= b)
in block order, closing the open version of a key at each emission and
inserting [b, MAX) for SETs — same-block double-SETs produce zero-width
versions, DELETEs insert nothing. The store must match that version
multiset exactly after every sequence, regardless of how batches were
grouped, crashed, replayed, or compacted in between.

Example budget: each rule drives real Spark jobs, so the CI default is
deliberately small; set SPARK_GRAFT_HYPOTHESIS_EXAMPLES to scale the same
machine up (validated at 200 examples when introduced).
"""

from __future__ import annotations

import os

import pytest
from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import RuleBasedStateMachine, initialize, invariant, precondition, rule

from consensource_sds_spark.operators.scd2 import ScdParquetStore
from consensource_sds_spark.pipeline import transform_events
from consensource_sds_spark.schemas import MAX_BLOCK_NUM
from consensource_sds_spark.sources import fixtures as fx

# the assertion group models BOTH SETs and DELETE tombstones (the reference
# only emits DELETEs for assertions, event_handler.rs:185-191), so the op
# alphabet runs on assertion state addresses
KEYS = [fx.make_address("assertion", f"a{i}") for i in range(3)]
MAX_EXAMPLES = int(os.environ.get("SPARK_GRAFT_HYPOTHESIS_EXAMPLES", "12"))

# op alphabet: (key_idx, delete?)
_ops = st.lists(
    st.tuples(st.integers(0, len(KEYS) - 1), st.booleans()), min_size=1, max_size=3
)


class Model:
    """Pure-Python chain + SCD2 oracle."""

    def __init__(self):
        self.chain: dict[int, tuple[str, list[tuple[str, bool]]]] = {}

    def deliver(self, block_num: int, block_id: str, ops: list[tuple[str, bool]]):
        known = self.chain.get(block_num)
        if known is not None and known[0] != block_id:
            for b in [b for b in self.chain if b >= block_num]:
                del self.chain[b]
        self.chain[block_num] = (block_id, ops)

    def versions(self) -> list[tuple[str, int, int]]:
        out: list[list] = []  # [key, start, end] with end mutable
        open_idx: dict[str, int] = {}
        for bn in sorted(self.chain):
            for key, is_delete in self.chain[bn][1]:
                prev = open_idx.pop(key, None)
                if prev is not None:
                    out[prev][2] = bn
                if not is_delete:
                    out.append([key, bn, MAX_BLOCK_NUM])
                    open_idx[key] = len(out) - 1
        return sorted((k, s, e) for k, s, e in out)


class ScdConvergence(RuleBasedStateMachine):
    spark = None  # injected by the test wrapper
    tmp_root = None

    def __init__(self):
        super().__init__()
        self.model = Model()
        self.next_block = 1
        self.batch_id = 0
        self.dirty = False  # becomes True once any delivery happened

    @initialize()
    def make_store(self):
        import tempfile

        path = tempfile.mkdtemp(prefix="scd2_prop_", dir=self.tmp_root)
        # small bucket count so multi-bucket interactions actually occur
        self.store = ScdParquetStore(self.spark, path, n_buckets=4)

    # -- helpers ----------------------------------------------------------
    def _deliveries(self, specs):
        """specs: list of (block_num, block_id, ops)."""
        out = []
        for bn, bid, ops in specs:
            changes = []
            for addr, is_delete in ops:
                if is_delete:
                    changes.append(
                        fx.state_change("assertion", "x", None, change_type="DELETE", address=addr)
                    )
                else:
                    ent = dict(fx.make_assertion(), address=addr, assertion_id=f"id-{bn}")
                    changes.append(fx.state_change("assertion", "x", [ent], address=addr))
            out.append(fx.delivery(bn, bid, changes))
        return out

    def _apply(self, specs, crash=False):
        # materialize=True is the foreachBatch body's configuration (one
        # decode pass + absent-group pruning) — both faster and the more
        # production-representative path
        batch = transform_events(fx.events_df(self.spark, self._deliveries(specs)), materialize=True)
        if crash:
            real = self.store._commit
            self.store._commit = lambda man, **kw: (_ for _ in ()).throw(OSError("crash"))
            try:
                with pytest.raises(OSError):
                    self.store.apply(batch, batch_id=self.batch_id)
            finally:
                self.store._commit = real
            # nothing became visible; replay the same batch (foreachBatch
            # restart) — rebuild the batch because the crashed attempt's
            # staging dirs were superseded
            batch = transform_events(
                fx.events_df(self.spark, self._deliveries(specs)), materialize=True
            )
        self.store.apply(batch, batch_id=self.batch_id)
        self.batch_id += 1
        for bn, bid, ops in specs:
            self.model.deliver(bn, bid, ops)
        self.dirty = True

    # -- rules ------------------------------------------------------------
    @rule(ops=_ops, crash=st.booleans(), two_blocks=st.booleans())
    def advance(self, ops, crash, two_blocks):
        """Deliver 1-2 fresh blocks in one microbatch, optionally crashing
        before the commit and replaying."""
        keyed = [(KEYS[i], d) for i, d in ops]
        specs = [(self.next_block, f"b{self.next_block}", keyed)]
        if two_blocks:
            specs.append((self.next_block + 1, f"b{self.next_block + 1}", keyed[:1]))
        self.next_block += len(specs)
        self._apply(specs, crash=crash)

    @precondition(lambda self: self.next_block > 2)
    @rule(back=st.integers(1, 4), ops=_ops)
    def fork(self, back, ops):
        """Re-deliver an already-seen block number with a different id —
        the store must rewind and replay (W4)."""
        bn = max(1, self.next_block - 1 - back)
        bid = f"b{bn}-fork{self.batch_id}"
        self.next_block = bn + 1
        self._apply([(bn, bid, [(KEYS[i], d) for i, d in ops])])

    @precondition(lambda self: self.dirty)
    @rule()
    def compact(self):
        self.store.compact()

    # -- convergence ------------------------------------------------------
    def _check(self):
        got = sorted(
            (r["address"], r["start_block_num"], r["end_block_num"])
            for r in self.store.read("assertions").collect()
        )
        assert got == self.model.versions()
        blocks = {r["block_num"]: r["block_id"] for r in self.store.blocks().collect()}
        expect_blocks = {bn: bid for bn, (bid, _) in self.model.chain.items()}
        assert blocks == expect_blocks

    # The stated property is end-state convergence of the INTERLEAVING, so
    # the oracle comparison runs once per example (teardown) by default —
    # ~6x more interleavings per wall-clock budget than per-step checking.
    # Set SPARK_GRAFT_HYPOTHESIS_STEPWISE=1 to also compare after every
    # rule (strictly stronger on a given sequence, much slower).
    @invariant()
    def store_matches_oracle_stepwise(self):
        if self.dirty and os.environ.get("SPARK_GRAFT_HYPOTHESIS_STEPWISE") == "1":
            self._check()

    def teardown(self):
        if self.dirty:
            self._check()


def test_scd2_interleaving_converges(spark, tmp_path_factory):
    ScdConvergence.spark = spark
    ScdConvergence.tmp_root = str(tmp_path_factory.mktemp("scd2_prop"))
    run = ScdConvergence.TestCase
    run.settings = settings(
        max_examples=MAX_EXAMPLES, stateful_step_count=6, deadline=None, print_blob=True
    )
    state = run()
    state.runTest()
