"""SCD2 sink behavior (FIXTURES.md §4 scenarios 2,3,5,7,8 + multi-block
batches, time travel, catch-up cursor, idempotent batch replay)."""

from __future__ import annotations

import pytest

from consensource_sds_spark.operators.scd2 import ScdParquetStore
from consensource_sds_spark.pipeline import transform_events
from consensource_sds_spark.schemas import MAX_BLOCK_NUM
from consensource_sds_spark.sources import fixtures as fx

MAX = MAX_BLOCK_NUM


@pytest.fixture()
def store(spark, tmp_path):
    return ScdParquetStore(spark, str(tmp_path / "reporting"))


def _apply(spark, store, deliveries, batch_id=None):
    store.apply(transform_events(fx.events_df(spark, deliveries)), batch_id=batch_id)


def _agent_versions(store):
    return sorted(
        (r["public_key"], r["name"], r["start_block_num"], r["end_block_num"])
        for r in store.read("agents").collect()
    )


def test_scd2_reset_two_batches(spark, store):
    """Same agent key SET at block 1 then block 5 (separate batches) ->
    v1 closed at 5, v2 current."""
    a1 = fx.make_agent()
    a2 = dict(fx.make_agent(), name="renamed")
    _apply(spark, store, [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [a1])])])
    _apply(spark, store, [fx.delivery(5, "b5", [fx.state_change("agent", fx.PUBLIC_KEY, [a2])])])
    assert _agent_versions(store) == [
        ("test_public_key", "renamed", 5, MAX),
        ("test_public_key", "test", 1, 5),
    ]
    cur = store.current("agents").collect()
    assert len(cur) == 1 and cur[0]["name"] == "renamed"


def test_scd2_reset_single_multiblock_batch(spark, store):
    """Two blocks in ONE microbatch (two deliveries) -> same final state as
    sequential application."""
    a1, a2 = fx.make_agent(), dict(fx.make_agent(), name="renamed")
    _apply(
        spark,
        store,
        [
            fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [a1])]),
            fx.delivery(5, "b5", [fx.state_change("agent", fx.PUBLIC_KEY, [a2])]),
        ],
    )
    assert _agent_versions(store) == [
        ("test_public_key", "renamed", 5, MAX),
        ("test_public_key", "test", 1, 5),
    ]
    assert sorted(r["block_num"] for r in store.blocks().collect()) == [1, 5]


def test_delete_tombstone(spark, store):
    """Assertion SET at 1, DELETE at 3 -> version closed [1,3), nothing
    current (event_handler.rs:185-191)."""
    addr = fx.make_address("assertion", fx.ASSERTION_ID)
    a = dict(fx.make_assertion(), address=addr)  # proto address == state cell
    _apply(spark, store, [fx.delivery(1, "b1", [fx.state_change("assertion", fx.ASSERTION_ID, [a])])])
    _apply(
        spark,
        store,
        [fx.delivery(3, "b3", [fx.state_change("assertion", fx.ASSERTION_ID, None, change_type="DELETE")])],
    )
    rows = store.read("assertions").collect()
    assert [(r["assertion_id"], r["start_block_num"], r["end_block_num"]) for r in rows] == [
        ("test_assertion", 1, 3)
    ]
    assert store.current("assertions").count() == 0


def test_child_group_reemission(spark, store):
    """FIXTURES §4.8/U3: an org re-emitted as FACTORY closes its old
    accreditations even though the new emission carries none."""
    cert_body = dict(fx.make_certifying_body(), id="orgX")
    factory = dict(fx.make_factory(), id="orgX")
    _apply(spark, store, [fx.delivery(1, "b1", [fx.state_change("organization", "orgX", [cert_body])])])
    assert store.current("accreditations").count() == 1
    _apply(spark, store, [fx.delivery(2, "b2", [fx.state_change("organization", "orgX", [factory])])])
    acc = store.read("accreditations").collect()
    assert [(r["start_block_num"], r["end_block_num"]) for r in acc] == [(1, 2)]
    assert store.current("accreditations").count() == 0
    addr = store.current("addresses").collect()
    assert [(r["organization_id"], r["start_block_num"]) for r in addr] == [("orgX", 2)]
    orgs = sorted(
        (r["organization_type"], r["start_block_num"], r["end_block_num"])
        for r in store.read("organizations").collect()
    )
    assert orgs == [("CERTIFYING_BODY", 1, 2), ("FACTORY", 2, MAX)]


def test_fork_repair(spark, store):
    """FIXTURES §4.7: blocks 1-3 applied; block 2 re-delivered with a
    different block_id -> rows with start >= 2 rewound, closed-at->=2
    re-opened, then the replayed block applies."""
    mk = lambda name: [fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name=name)])]
    _apply(spark, store, [fx.delivery(1, "b1", mk("v1"))])
    _apply(spark, store, [fx.delivery(2, "b2", mk("v2"))])
    _apply(spark, store, [fx.delivery(3, "b3", mk("v3"))])
    assert len(_agent_versions(store)) == 3
    # fork: block 2 arrives again with a different id and different content
    _apply(spark, store, [fx.delivery(2, "b2-fork", mk("v2f"))])
    assert _agent_versions(store) == [
        ("test_public_key", "v1", 1, 2),
        ("test_public_key", "v2f", 2, MAX),
    ]
    blocks = {r["block_num"]: r["block_id"] for r in store.blocks().collect()}
    assert blocks == {1: "b1", 2: "b2-fork"}


def test_time_travel_as_of(spark, store):
    a1, a2 = fx.make_agent(), dict(fx.make_agent(), name="renamed")
    _apply(spark, store, [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [a1])])])
    _apply(spark, store, [fx.delivery(5, "b5", [fx.state_change("agent", fx.PUBLIC_KEY, [a2])])])
    assert store.as_of("agents", 3).first()["name"] == "test"
    assert store.as_of("agents", 5).first()["name"] == "renamed"
    assert store.as_of("agents", 0).count() == 0


def test_heartbeat_noop(spark, store):
    _apply(spark, store, [[]])
    assert store.blocks().count() == 0
    assert store.read("agents").count() == 0


def test_idempotent_batch_replay(spark, store):
    d = [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])])]
    _apply(spark, store, d, batch_id=0)
    _apply(spark, store, d, batch_id=0)  # foreachBatch replay after restart
    assert store.read("agents").count() == 1


def test_catch_up_cursor(spark, store):
    for b in range(1, 5):
        _apply(spark, store, [fx.delivery(b, f"b{b}", [])])
    assert store.known_block_ids(2) == ["b4", "b3"]


def test_two_sets_same_block(spark, store):
    """Two SETs of one key in one block -> zero-width first version, second
    current (reference UPDATE-then-INSERT sequencing)."""
    changes = [
        fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name="first")]),
        fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name="second")]),
    ]
    _apply(spark, store, [fx.delivery(4, "b4", changes)])
    assert _agent_versions(store) == [
        ("test_public_key", "first", 4, 4),
        ("test_public_key", "second", 4, MAX),
    ]


def test_crash_mid_apply_is_invisible_then_replay_converges(spark, store, monkeypatch):
    """W1 atomicity: a crash after table writes but BEFORE the manifest
    commit leaves the store exactly as it was; replaying the same batch
    then applies once (no duplicate/zero-width rows in closed history)."""
    d1 = [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])])]
    d2 = [fx.delivery(2, "b2", [fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name="v2")])])]
    _apply(spark, store, d1, batch_id=0)

    real_commit = store._commit
    monkeypatch.setattr(store, "_commit", lambda man, **kw: (_ for _ in ()).throw(OSError("crash")))
    with pytest.raises(OSError):
        _apply(spark, store, d2, batch_id=1)
    # nothing of batch 1 is visible
    assert _agent_versions(store) == [("test_public_key", "test", 1, MAX)]
    assert store.last_applied_batch() == 0
    # replay converges
    monkeypatch.setattr(store, "_commit", real_commit)
    _apply(spark, store, d2, batch_id=1)
    assert _agent_versions(store) == [
        ("test_public_key", "test", 1, 2),
        ("test_public_key", "v2", 2, MAX),
    ]
    assert store.last_applied_batch() == 1


def test_long_chain_fork_and_cursor_limit(spark, store):
    """Fork detection looks up only the incoming block numbers (no O(chain)
    collect) and the catch-up cursor pushes its limit into the plan."""
    deliveries = [
        fx.delivery(b, f"b{b}", [fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name=f"v{b}")])])
        for b in range(1, 21)
    ]
    _apply(spark, store, deliveries)  # one 20-block microbatch
    assert store.known_block_ids(3) == ["b20", "b19", "b18"]
    _apply(
        spark,
        store,
        [fx.delivery(15, "b15-fork", [fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name="f15")])])],
    )
    cur = store.current("agents").collect()
    assert [(r["name"], r["start_block_num"]) for r in cur] == [("f15", 15)]
    blocks = {r["block_num"]: r["block_id"] for r in store.blocks().collect()}
    assert blocks[14] == "b14" and blocks[15] == "b15-fork" and 16 not in blocks


def test_partial_batch_without_member_table(spark, store):
    """Public apply() contract: emissions for a group whose member tables
    carry no new-rows DataFrame must merge (close) without crashing."""
    from pyspark.sql import functions as F

    from consensource_sds_spark.operators.scd2 import PipelineBatch

    _apply(spark, store, [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])])])
    emis = spark.createDataFrame(
        [(fx.PUBLIC_KEY, 2, 0, 0, 0, True)],
        "vkey string, block_num long, batch_ord long, change_idx long, entry_idx long, is_delete boolean",
    )
    store.apply(PipelineBatch(block=None, tables={}, emissions={"agent": emis}))
    assert _agent_versions(store) == [("test_public_key", "test", 1, 2)]


def test_version_chain_invariants_at_scale(spark, store):
    """SCD2 structural invariants over a wider keyspace (500 agents x 3
    re-emissions in multi-block batches): per key, intervals are
    well-formed ([s,e) with s<=e), non-overlapping, contiguous across
    versions, and at most one is open — the properties a 100 TB store
    must keep under any partitioning."""
    from pyspark.sql import functions as F

    def batch(block, n=500):
        return fx.delivery(
            block,
            f"b{block}",
            [
                fx.state_change(
                    "agent", f"k{i}", [dict(fx.make_agent(), public_key=f"k{i}", name=f"v{block}")]
                )
                # every key re-emitted each block; a third of keys also get a
                # same-block double-SET (zero-width version stress)
                for i in range(n)
            ]
            + [
                fx.state_change(
                    "agent", f"k{i}", [dict(fx.make_agent(), public_key=f"k{i}", name=f"v{block}x")]
                )
                for i in range(0, n, 3)
            ],
        )

    _apply(spark, store, [batch(1), batch(5)])  # multi-block microbatch
    _apply(spark, store, [batch(9)])

    agents = store.read("agents")
    assert agents.count() == 500 * 3 + 167 * 3  # one row per emission
    # interval sanity: s <= e everywhere
    assert agents.filter(F.col("start_block_num") > F.col("end_block_num")).count() == 0
    # exactly one open version per key
    open_counts = (
        agents.filter(F.col("end_block_num") == MAX)
        .groupBy("public_key")
        .count()
        .filter(F.col("count") != 1)
    )
    assert open_counts.count() == 0
    # chain contiguity: ordering each key's versions by (start, end), every
    # version's end equals the next version's start (no gaps, no overlaps)
    from pyspark.sql import Window

    w = Window.partitionBy("public_key").orderBy("start_block_num", "end_block_num")
    gaps = (
        agents.withColumn("next_start", F.lead("start_block_num").over(w))
        .filter(F.col("next_start").isNotNull() & (F.col("end_block_num") != F.col("next_start")))
    )
    assert gaps.count() == 0
    # current() equals the open slice of read()
    assert store.current("agents").count() == 500


def test_streaming_file_source(spark, store, tmp_path):
    """End-to-end Structured Streaming: envelope parquet -> foreachBatch ->
    store, with checkpointed exactly-once resume."""
    from consensource_sds_spark.streaming.runner import run_file_stream

    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    fx.events_df(
        spark, [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])])]
    ).write.parquet(src)
    q = run_file_stream(spark, src, store, ckpt, trigger_once=True)
    q.awaitTermination(120)
    assert _agent_versions(store) == [("test_public_key", "test", 1, MAX)]
    # second file arrives; resume from checkpoint picks up only the new one
    fx.events_df(
        spark,
        [fx.delivery(2, "b2", [fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name="v2")])])],
    ).write.mode("append").parquet(src)
    q2 = run_file_stream(spark, src, store, ckpt, trigger_once=True)
    q2.awaitTermination(120)
    assert _agent_versions(store) == [
        ("test_public_key", "test", 1, 2),
        ("test_public_key", "v2", 2, MAX),
    ]


def test_compact_preserves_reads_and_prunes_segments(spark, store):
    """Closed segments accumulate one per closing batch; compact() merges
    them behind one atomic manifest swap with identical read results."""
    for b in range(1, 6):
        a = dict(fx.make_agent(), name=f"v{b}")
        _apply(
            spark, store, [fx.delivery(b, f"b{b}", [fx.state_change("agent", fx.PUBLIC_KEY, [a])])]
        )
    before_versions = _agent_versions(store)
    before_asof = sorted(tuple(r) for r in store.as_of("agents", 3).collect())
    man = store._manifest()
    assert len(man["tables"]["agents"]["closed"]) == 4  # one per closing batch
    assert len(man["blocks"]) == 5

    assert store.compact() is True

    man2 = store._manifest()
    assert len(man2["tables"]["agents"]["closed"]) == 1
    assert len(man2["blocks"]) == 1
    assert _agent_versions(store) == before_versions
    assert sorted(tuple(r) for r in store.as_of("agents", 3).collect()) == before_asof
    assert sorted(r["block_num"] for r in store.blocks().collect()) == [1, 2, 3, 4, 5]
    # idempotent: nothing left to merge
    assert store.compact() is False

    # the store still applies new batches on top of the compacted layout
    a6 = dict(fx.make_agent(), name="v6")
    _apply(spark, store, [fx.delivery(6, "b6", [fx.state_change("agent", fx.PUBLIC_KEY, [a6])])])
    cur = store.current("agents").collect()
    assert len(cur) == 1 and cur[0]["name"] == "v6"
    assert len(store.read("agents").collect()) == 6


def test_legacy_manifest_layout_refused(spark, store, tmp_path):
    """A store written by the pre-bucketing format (tables carry an 'open'
    pointer) must refuse to open rather than silently read empty open state
    (whose next commit would vacuum the legacy directories — data loss)."""
    import json

    from consensource_sds_spark.operators.scd2 import UnsupportedStoreLayout

    a1 = fx.make_agent()
    _apply(spark, store, [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [a1])])])
    man = store._manifest()
    man["tables"]["agents"] = {"open": "agents/merged-g1/_open=true", "closed": []}
    with open(store._manifest_path(), "w") as f:
        json.dump(man, f)
    with pytest.raises(UnsupportedStoreLayout, match="pre-bucketing"):
        store.read("agents")
    with pytest.raises(UnsupportedStoreLayout):
        _apply(spark, store, [fx.delivery(2, "b2", [fx.state_change("agent", fx.PUBLIC_KEY, [a1])])])


def test_materialized_batch_apply(spark, store):
    """The foreachBatch-path batch (materialize=True: checkpointed entries,
    observation-carried group pruning, no sink-side re-materialization)
    produces byte-identical SCD2 state to the pure-plan path."""
    a1 = fx.make_agent()
    a2 = dict(fx.make_agent(), name="renamed")
    store.apply(
        transform_events(
            fx.events_df(
                spark,
                [
                    fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [a1])]),
                    fx.delivery(5, "b5", [fx.state_change("agent", fx.PUBLIC_KEY, [a2])]),
                ],
            ),
            materialize=True,
        )
    )
    assert _agent_versions(store) == [
        ("test_public_key", "renamed", 5, MAX),
        ("test_public_key", "test", 1, 5),
    ]


def test_concurrent_commit_conflict_raises(spark, tmp_path):
    """Optimistic concurrency: a writer whose manifest read predates another
    writer's commit must fail LOUDLY at commit time (never a silent lost
    update), and the store keeps the winner's state."""
    import json

    import pytest

    from consensource_sds_spark.operators.scd2 import ConcurrentWriteError, ScdParquetStore

    store = ScdParquetStore(spark, str(tmp_path / "reporting"))
    _apply(
        spark,
        store,
        [fx.delivery(1, "b1", [fx.state_change("agent", "a", [dict(fx.make_agent(), public_key="pk", name="n1")])])],
    )
    # stale writer: snapshot the manifest generation, then let another
    # commit land (the "winner"), then try to commit on the stale base
    stale_gen = store._manifest()["gen"]
    _apply(
        spark,
        store,
        [fx.delivery(2, "b2", [fx.state_change("agent", "a", [dict(fx.make_agent(), public_key="pk", name="n2")])])],
    )
    stale_man = json.loads(json.dumps(store._manifest()))
    stale_man["gen"] = stale_gen + 1
    with pytest.raises(ConcurrentWriteError):
        store._commit(stale_man, expected_gen=stale_gen)
    # winner's state intact: two versions, current is n2
    assert [r["name"] for r in store.current("agents").collect()] == ["n2"]
    assert store.read("agents").count() == 2


def test_describe_profiles_store_from_footers(spark, store):
    """describe() reports per-table rows/files/segments without a Spark job
    — and its counts agree with actual reads."""
    for b in (1, 2, 3):
        _apply(
            spark,
            store,
            [fx.delivery(b, f"b{b}", [fx.state_change("agent", "a", [dict(fx.make_agent(), public_key="pk", name=f"n{b}")])])],
        )
    prof = {p["table"]: p for p in store.describe()}
    agents = prof["agents"]
    assert agents["n_open_rows"] == store.current("agents").count() == 1
    assert agents["n_open_rows"] + agents["n_closed_rows"] == store.read("agents").count() == 3
    assert agents["n_closed_segments"] == 2  # blocks 2 and 3 each closed one
    assert agents["bytes"] > 0 and agents["n_open_files"] >= 1
    # compaction folds the closed segments; describe reflects it
    assert store.compact()
    prof2 = {p["table"]: p for p in store.describe()}
    assert prof2["agents"]["n_closed_segments"] == 1
    assert prof2["agents"]["n_closed_rows"] == 2


def test_maybe_compact_policy(spark, store):
    """The threshold policy connecting describe()/manifest counts to
    compact(): under threshold it is a single manifest read and a no-op;
    over it, one call folds the segments and reads are unchanged."""
    for b in range(1, 6):
        a = dict(fx.make_agent(), name=f"v{b}")
        _apply(
            spark, store, [fx.delivery(b, f"b{b}", [fx.state_change("agent", fx.PUBLIC_KEY, [a])])]
        )
    before = _agent_versions(store)
    # 4 closed segments / 5 block segments: under both thresholds -> no-op
    assert store.maybe_compact(max_closed_segments=8, max_block_segments=32) is False
    assert len(store._manifest()["tables"]["agents"]["closed"]) == 4
    # over the closed-segment threshold -> compacts
    assert store.maybe_compact(max_closed_segments=3) is True
    man = store._manifest()
    assert len(man["tables"]["agents"]["closed"]) == 1
    assert len(man["blocks"]) == 1
    assert _agent_versions(store) == before
    # and now idle again
    assert store.maybe_compact(max_closed_segments=3) is False


def test_stale_writer_staging_never_clobbers_committed_data(spark, store, monkeypatch):
    """Two writers basing on the SAME generation stage into salted paths:
    the optimistic-concurrency loser's mode('overwrite') staging writes
    must not delete or replace directories the winner's committed manifest
    references (unsalted staging paths collide and the loser clobbers the
    winner's data BEFORE the expected_gen check fires)."""
    import inspect
    import json

    import pytest

    from consensource_sds_spark.operators.scd2 import ConcurrentWriteError

    _apply(
        spark,
        store,
        [fx.delivery(1, "b1", [fx.state_change("agent", "a", [dict(fx.make_agent(), public_key="pk", name="n1")])])],
    )
    stale_man = json.loads(json.dumps(store._manifest()))  # the shared base
    _apply(  # the winner commits the next generation
        spark,
        store,
        [fx.delivery(2, "b2", [fx.state_change("agent", "a", [dict(fx.make_agent(), public_key="pk", name="n2")])])],
    )
    committed = _agent_versions(store)

    # the stale writer: plans (and stages) against the shared base, but the
    # commit-time flock'd re-read sees the winner's newer generation
    real_manifest = ScdParquetStore._manifest

    def stale_view(self):
        if any(f.function == "_commit" for f in inspect.stack()[1:4]):
            return real_manifest(self)
        return json.loads(json.dumps(stale_man))

    monkeypatch.setattr(ScdParquetStore, "_manifest", stale_view)
    with pytest.raises(ConcurrentWriteError):
        _apply(
            spark,
            store,
            [fx.delivery(3, "b3", [fx.state_change("agent", "a", [dict(fx.make_agent(), public_key="pk", name="LOSER")])])],
        )
    monkeypatch.undo()

    # the winner's committed state is byte-for-byte readable: the loser's
    # staged directories were salted, so nothing the manifest references
    # was overwritten, and the loser's value never appears
    assert _agent_versions(store) == committed
    assert [r["name"] for r in store.current("agents").collect()] == ["n2"]


def test_corrupt_manifest_raises_instead_of_emptying_store(spark, store):
    """A populated store whose manifest is unreadable must fail LOUDLY:
    reading it as empty would let the next commit's vacuum delete every
    committed generation (total silent data loss)."""
    from consensource_sds_spark.operators.scd2 import CorruptManifestError

    _apply(spark, store, [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])])])
    with open(store._manifest_path(), "w") as f:
        f.write('{"gen": 3, "tables"')  # truncated mid-write
    with pytest.raises(CorruptManifestError):
        store.read("agents")
    with pytest.raises(CorruptManifestError):
        _apply(spark, store, [fx.delivery(2, "b2", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])])])


def test_stored_same_id_redelivery_is_skipped(spark, store):
    """A rebuilt checkpoint (new query id) re-delivers an already-stored
    block: its emissions must NOT re-merge (that would revert current
    state to the stale version with an inverted interval) and its block
    row must not duplicate — blocks() disjointness is an invariant."""
    a1, a2 = fx.make_agent(), dict(fx.make_agent(), name="renamed")
    _apply(spark, store, [fx.delivery(5, "b5", [fx.state_change("agent", fx.PUBLIC_KEY, [a1])])])
    _apply(spark, store, [fx.delivery(7, "b7", [fx.state_change("agent", fx.PUBLIC_KEY, [a2])])])
    # the re-delivery arrives without a batch guard (new stream identity)
    _apply(spark, store, [fx.delivery(5, "b5", [fx.state_change("agent", fx.PUBLIC_KEY, [a1])])])
    assert _agent_versions(store) == [
        ("test_public_key", "renamed", 7, MAX),
        ("test_public_key", "test", 5, 7),
    ]
    blocks = sorted((r["block_num"], r["block_id"]) for r in store.blocks().collect())
    assert blocks == [(5, "b5"), (7, "b7")]


def test_intra_batch_fork_keeps_only_winning_chain(spark, store):
    """One microbatch carrying both a block and its same-height fork
    replacement (two deliveries): serial semantics — the later delivery
    wins, the superseded delivery's state changes are rewound out, and
    the blocks segment holds ONE row at that height."""
    a_lose = dict(fx.make_agent(), name="losing_chain")
    a_win = dict(fx.make_agent(), name="winning_chain")
    _apply(
        spark,
        store,
        [
            fx.delivery(6, "b6a", [fx.state_change("agent", fx.PUBLIC_KEY, [a_lose])]),
            fx.delivery(6, "b6b", [fx.state_change("agent", fx.PUBLIC_KEY, [a_win])]),
        ],
    )
    assert _agent_versions(store) == [("test_public_key", "winning_chain", 6, MAX)]
    assert [(r["block_num"], r["block_id"]) for r in store.blocks().collect()] == [(6, "b6b")]


def test_intra_batch_fork_supersedes_higher_blocks_of_old_chain(spark, store):
    """A fork at height h also rewinds in-batch deliveries ABOVE h from
    the old chain: [ (6,a), (7,a) then fork (6,b) ] must keep only the
    new chain's 6 — the old chain's 7 never happened."""
    a6 = dict(fx.make_agent(), name="old6")
    a7 = dict(fx.make_agent(), name="old7")
    b6 = dict(fx.make_agent(), name="new6")
    _apply(
        spark,
        store,
        [
            fx.delivery(6, "b6a", [fx.state_change("agent", fx.PUBLIC_KEY, [a6])]),
            fx.delivery(7, "b7a", [fx.state_change("agent", fx.PUBLIC_KEY, [a7])]),
            fx.delivery(6, "b6b", [fx.state_change("agent", fx.PUBLIC_KEY, [b6])]),
        ],
    )
    assert _agent_versions(store) == [("test_public_key", "new6", 6, MAX)]
    assert [(r["block_num"], r["block_id"]) for r in store.blocks().collect()] == [(6, "b6b")]


def test_known_block_ids_count_zero_is_empty(spark, store):
    _apply(spark, store, [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])])])
    assert store.known_block_ids(count=0) == []
    assert store.known_block_ids(count=1) == ["b1"]


def test_tables_without_emissions_raise(spark, store):
    """A hand-built batch supplying tables= rows but no emissions frame
    for their group must fail loudly — those rows would otherwise be
    silently dropped (the group loop skips emission-less groups)."""
    from consensource_sds_spark.operators.scd2 import PipelineBatch
    from consensource_sds_spark.schemas import SINK_TABLES

    rows = spark.createDataFrame([], SINK_TABLES["agents"])
    with pytest.raises(ValueError, match="emissions"):
        store.apply(PipelineBatch(tables={"agents": rows}))


def test_intra_batch_fork_below_unconflicted_higher_block(spark, store):
    """Regression (r9 review, repro-confirmed): the fork delivery's height
    need not itself recur in the batch for supersession — an old-chain
    delivery at a HIGHER height earlier in the same batch is abandoned
    the moment a delivery at or below it arrives, else the store mixes
    two chains (blocks 5B and 6A coexisting)."""
    _apply(
        spark, store,
        [fx.delivery(5, "b5a", [fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name="chainA5")])])],
    )
    _apply(
        spark, store,
        [
            fx.delivery(6, "b6a", [fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name="chainA6")])]),
            fx.delivery(5, "b5b", [fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name="chainB5")])]),
        ],
    )
    assert _agent_versions(store) == [("test_public_key", "chainB5", 5, MAX)]
    assert {(r["block_num"], r["block_id"]) for r in store.blocks().collect()} == {(5, "b5b")}


def test_idless_duplicated_delivery_yields_single_open_version(spark, store):
    """Regression (r9 review, repro-confirmed): an id-less batch carrying
    the same delivery TWICE (duplicated block/emission/new-row frames,
    byte-identical) must not double-insert — the emission<->new-row
    insert join is many-to-many on identical order keys, so 2x2 copies
    previously produced TWO open [5, MAX) versions of one entity."""
    from consensource_sds_spark.operators.scd2 import PipelineBatch

    b = transform_events(
        fx.events_df(
            spark,
            [fx.delivery(5, "b5", [fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name="v5")])])],
        ),
        materialize=False,
    )

    def strip_dup(df):
        d = df.drop("delivery_id") if "delivery_id" in df.columns else df
        return d.unionAll(d)

    dup = PipelineBatch(
        block=strip_dup(b.block),
        tables={t: strip_dup(df) for t, df in b.tables.items()},
        emissions={g: strip_dup(df) for g, df in b.emissions.items()},
    )
    store.apply(dup)
    assert _agent_versions(store) == [("test_public_key", "v5", 5, MAX)]


def test_quarantine_frames_are_persisted(spark, store):
    """Regression (r9 review): W5 dead letters routed into
    PipelineBatch.quarantine must actually LAND — apply() previously
    ignored the field, so the production path silently dropped them."""
    q_rows = spark.createDataFrame([("badaddr", "unknown_infix")], "address string, reason string")
    b = transform_events(
        fx.events_df(
            spark,
            [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])])],
        )
    )
    b.quarantine = q_rows
    store.apply(b, batch_id=0, txn_app_id="app")
    got = store.quarantine()
    assert got is not None
    assert [(r["address"], r["reason"]) for r in got.collect()] == [("badaddr", "unknown_infix")]
    # replayed batch id: the guard returns early, nothing duplicates
    b2 = transform_events(
        fx.events_df(
            spark,
            [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])])],
        )
    )
    b2.quarantine = q_rows
    store.apply(b2, batch_id=0, txn_app_id="app")
    assert store.quarantine().count() == 1


def test_missing_referenced_directory_fails_loudly(spark, store):
    """Regression (r9 review): a manifest-referenced directory missing on
    disk (partial restore, out-of-band delete) must raise — silently
    skipping it returned partial data that the next apply() would merge
    against and commit, making the loss permanent."""
    import os
    import shutil

    from consensource_sds_spark.operators.scd2 import CorruptManifestError

    _apply(spark, store, [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])])])
    man = store._manifest()
    rel = next(iter(man["tables"]["agents"]["open_buckets"].values()))
    shutil.rmtree(os.path.join(store.path, rel))
    with pytest.raises(CorruptManifestError, match="missing"):
        store.read("agents")


def test_streaming_quarantine_lands_end_to_end(spark, store, tmp_path):
    """W5 through the PRODUCTION path: an unknown-infix change streamed via
    run_file_stream must land in the store's persisted quarantine lane
    alongside the good row's normal merge — previously the runner's
    apply() dropped the dead letters with no record (r9 review)."""
    from consensource_sds_spark.addressing import NAMESPACE
    from consensource_sds_spark.streaming.runner import run_file_stream

    src = str(tmp_path / "events_src_q")
    ckpt = str(tmp_path / "ckpt_q")
    good = fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])
    unknown = fx.state_change("agent", "k", [fx.make_agent()], address=NAMESPACE + "99" + "a" * 62)
    fx.events_df(spark, [fx.delivery(1, "b1", [good, unknown])]).write.parquet(src)
    q = run_file_stream(spark, src, store, ckpt, trigger_once=True)
    q.awaitTermination(120)
    assert _agent_versions(store) == [("test_public_key", "test", 1, MAX)]
    dead = store.quarantine()
    assert dead is not None
    rows = dead.collect()
    assert len(rows) == 1 and rows[0]["address"] == unknown["address"]
