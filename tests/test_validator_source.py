"""Custom streaming DataSource (S1): spool-backed validator deliveries,
block-number offsets, catch-up skip, and checkpointed resume."""

from __future__ import annotations

from consensource_sds_spark.codec import encode_message
from consensource_sds_spark.sources import fixtures as fx
from consensource_sds_spark.sources import validator_source as vs


def _spool_block(spool: str, block_num: int) -> None:
    events = fx.delivery(
        block_num,
        f"block{block_num}",
        [
            fx.state_change(
                "agent",
                f"agent{block_num}",
                [dict(fx.make_agent(), public_key=f"pk{block_num}")],
            )
        ],
    )
    payload = encode_message("EventList", {"events": events})
    vs.write_envelope(spool, block_num, payload)


def _drain(spark, spool: str, out: str, ckpt: str, start_block: int = -1) -> None:
    vs.register(spark)
    stream = (
        spark.readStream.format(vs.FORMAT_NAME)
        .option("path", spool)
        .option("start_block", str(start_block))
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_delivers_envelopes_and_resumes(spark, tmp_path):
    spool, out, ckpt = str(tmp_path / "spool"), str(tmp_path / "out"), str(tmp_path / "ck")
    for b in (1, 2, 3):
        _spool_block(spool, b)
    _drain(spark, spool, out, ckpt)
    df = spark.read.parquet(out)
    # 2 events per delivery (block-commit + state-delta), EVENT envelope shape
    assert df.count() == 6
    assert df.schema == vs.STREAM_SCHEMA
    # delivery_id = spool SEQ (arrival order), not block_num: seqs 0..2
    assert sorted(r["delivery_id"] for r in df.select("delivery_id").distinct().collect()) == [0, 1, 2]

    # the normal pipeline transforms run on the stream output unchanged
    from consensource_sds_spark.operators import transforms as T

    blocks = {r["block_num"]: r["block_id"] for r in T.parse_blocks(df).collect()}
    assert blocks == {1: "block1", 2: "block2", 3: "block3"}

    # resume from the checkpoint: only the new block is read
    _spool_block(spool, 4)
    _drain(spark, spool, out, ckpt)
    df2 = spark.read.parquet(out)
    assert df2.count() == 8
    assert df2.filter("delivery_id = 3").count() == 2  # block 4 arrived as seq 3


def test_start_block_catch_up_skip(spark, tmp_path):
    """start_block (fed by ScdParquetStore.known_block_ids, S3) skips
    already-ingested history."""
    spool, out, ckpt = str(tmp_path / "spool"), str(tmp_path / "out"), str(tmp_path / "ck")
    for b in (1, 2, 3):
        _spool_block(spool, b)
    _drain(spark, spool, out, ckpt, start_block=2)
    df = spark.read.parquet(out)
    assert sorted(r["delivery_id"] for r in df.select("delivery_id").distinct().collect()) == [2]  # blocks 1,2 (seqs 0,1) skipped; block 3 = seq 2


def test_validator_stream_to_scd2_store(spark, tmp_path):
    """Full S1->W1 path on the custom source: spooled wire envelopes ->
    decode -> transforms -> SCD2 store, then catch-up on restart."""
    from pyspark.sql import functions as F

    from consensource_sds_spark.operators.scd2 import ScdParquetStore
    from consensource_sds_spark.streaming.runner import run_validator_stream

    spool = str(tmp_path / "spool")
    store = ScdParquetStore(spark, str(tmp_path / "reporting"))
    ckpt = str(tmp_path / "ck")

    for b in (1, 2):
        _spool_block(spool, b)
    q = run_validator_stream(spark, spool, store, ckpt)
    q.awaitTermination(180)

    cur = {r["public_key"]: r["start_block_num"] for r in store.current("agents").collect()}
    assert cur == {"pk1": 1, "pk2": 2}
    assert sorted(r["block_num"] for r in store.blocks().collect()) == [1, 2]

    # restart with a FRESH checkpoint: the store head seeds start_block, so
    # history is not re-ingested (S3 catch-up), only the new block applies
    _spool_block(spool, 3)
    q2 = run_validator_stream(spark, spool, store, str(tmp_path / "ck2"))
    q2.awaitTermination(180)
    assert sorted(r["block_num"] for r in store.blocks().collect()) == [1, 2, 3]
    assert {r["public_key"] for r in store.current("agents").collect()} == {"pk1", "pk2", "pk3"}


def test_fork_replay_flows_through_appendonly_spool(spark, tmp_path):
    """A fork's replacement delivery for an already-ingested height must
    reach the store: the append-only spool gives it a FRESH seq (the old
    block-keyed spool overwrote the committed file past the cursor, so
    the replacement was never re-read and W4 repair silently never ran).
    The store rewinds the orphaned chain and applies the winner."""
    from consensource_sds_spark.operators.scd2 import ScdParquetStore
    from consensource_sds_spark.streaming.runner import run_validator_stream

    spool = str(tmp_path / "spool")
    store = ScdParquetStore(spark, str(tmp_path / "reporting"))

    for b in (1, 2):
        _spool_block(spool, b)
    q = run_validator_stream(spark, spool, store, str(tmp_path / "ck"))
    q.awaitTermination(180)
    assert {(r["block_num"], r["block_id"]) for r in store.blocks().collect()} == {
        (1, "block1"),
        (2, "block2"),
    }

    # the validator switches to a fork: block 2 is re-delivered with a
    # different id and different state — a NEW delivery (fresh seq)
    events = fx.delivery(
        2,
        "block2_fork",
        [fx.state_change("agent", "agentF", [dict(fx.make_agent(), public_key="pk_fork")])],
    )
    vs.write_envelope(spool, 2, encode_message("EventList", {"events": events}))

    # same checkpoint resumes past seq 1 and picks up the replacement
    q2 = run_validator_stream(spark, spool, store, str(tmp_path / "ck"))
    q2.awaitTermination(180)
    assert {(r["block_num"], r["block_id"]) for r in store.blocks().collect()} == {
        (1, "block1"),
        (2, "block2_fork"),
    }
    cur = {r["public_key"] for r in store.current("agents").collect()}
    assert cur == {"pk1", "pk_fork"}  # pk2 (orphaned chain) rewound out


def test_initial_offset_stops_at_fork_replacement(tmp_path):
    """Regression (r9 review): a spooled-but-unprocessed fork REPLACEMENT
    has height <= the store head that seeds start_block, so a height-only
    prefix skip would drop it on a fresh-checkpoint start and W4 repair
    would never run. The skip must stop at the first non-increasing
    height."""
    from consensource_sds_spark.sources.validator_source import (
        _SpoolStreamReader,
        write_envelope,
    )

    d = str(tmp_path / "spool")
    for seq, block in ((0, 1), (1, 2), (2, 2)):  # seq2 = replacement for height 2
        write_envelope(d, block, b"evl", seq=seq)
    r = _SpoolStreamReader({"path": d, "start_block": "2"})
    # the processed strictly-increasing prefix (b1, b2) is skipped; the
    # same-height replacement at seq 2 still flows
    assert r.initialOffset() == {"last_seq": 1}
    # plain catch-up is unchanged: heights beyond start_block stop the skip
    d2 = str(tmp_path / "spool2")
    for seq, block in ((0, 1), (1, 2), (2, 3)):
        write_envelope(d2, block, b"evl", seq=seq)
    r2 = _SpoolStreamReader({"path": d2, "start_block": "2"})
    assert r2.initialOffset() == {"last_seq": 1}


def test_foreign_evl_files_are_skipped_not_fatal(tmp_path):
    """Regression (r9 review): a stray *.evl file whose name is not a
    spool entry (backup.evl, '1-2-3.evl') must be ignored — raising from
    the name parser failed every microbatch until someone hand-deleted
    the file."""
    from consensource_sds_spark.sources.validator_source import (
        _parse_name,
        _spooled_entries,
        write_envelope,
    )

    d = str(tmp_path / "spool")
    write_envelope(d, 5, b"evl", seq=0)
    open(f"{d}/backup.evl", "wb").write(b"junk")
    open(f"{d}/1-2-3.evl", "wb").write(b"junk")
    assert _parse_name("backup.evl") is None
    assert _parse_name("1-2-3.evl") is None
    assert _spooled_entries(d) == [(0, 5)]
