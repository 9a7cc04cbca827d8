"""Full S1->W1 integration over a REAL socket: fake validator (TCP/ZMTP)
-> ZmtpSpoolBridge -> validator spool -> custom DataSource stream ->
transform -> bucketed SCD2 store. The same deliveries the wire carried end
up as versioned rows, exactly-once."""

from __future__ import annotations

import threading
import time

from consensource_sds_spark.codec import encode_message
from consensource_sds_spark.operators.scd2 import ScdParquetStore
from consensource_sds_spark.schemas import MAX_BLOCK_NUM
from consensource_sds_spark.sources import fixtures as fx
from consensource_sds_spark.streaming.bridge import ZmtpSpoolBridge, block_num_of
from consensource_sds_spark.streaming.runner import run_validator_stream
from tests.test_zmtp import FakeValidator


def _event_list(block_num: int, name: str, block_id: str | None = None) -> bytes:
    events = fx.delivery(
        block_num,
        block_id or f"b{block_num}",
        [fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name=name)])],
    )
    wire_events = [
        {k: ev[k] for k in ("event_type", "attributes", "data")} for ev in events
    ]
    return encode_message("EventList", {"events": wire_events})


def test_block_num_extraction():
    assert block_num_of(_event_list(7, "x")) == 7
    heartbeat = encode_message("EventList", {"events": []})
    assert block_num_of(heartbeat) is None


def test_zmtp_bridge_to_store(spark, tmp_path):
    deliveries = [_event_list(1, "v1"), _event_list(2, "v2")]
    heartbeat = encode_message("EventList", {"events": []})
    srv = FakeValidator(known_block="k2", events=[deliveries[0], heartbeat, deliveries[1]])
    srv.start()

    spool = str(tmp_path / "spool")
    bridge = ZmtpSpoolBridge("127.0.0.1", srv.port, spool)
    t = threading.Thread(target=bridge.run, args=([f"k{i}" for i in range(14, -1, -1)],), daemon=True)
    t.start()
    deadline = time.monotonic() + 10
    while len(bridge.spooled) < 2 and time.monotonic() < deadline:
        time.sleep(0.05)
    bridge.request_stop()
    t.join(timeout=10)
    assert list(bridge.spooled) == [1, 2]  # heartbeat dropped, blocks spooled in order

    store = ScdParquetStore(spark, str(tmp_path / "reporting"))
    q = run_validator_stream(spark, spool, store, str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(120)

    versions = sorted(
        (r["public_key"], r["name"], r["start_block_num"], r["end_block_num"])
        for r in store.read("agents").collect()
    )
    assert versions == [
        ("test_public_key", "v1", 1, 2),
        ("test_public_key", "v2", 2, MAX_BLOCK_NUM),
    ]
    blocks = {r["block_num"]: r["block_id"] for r in store.blocks().collect()}
    assert blocks == {1: "b1", 2: "b2"}


def test_zmtp_bridge_fork_repair_converges_to_canonical_chain(spark, tmp_path):
    """W4 driven through the FULL live path: the validator serves chain A
    (b1 b2 b3), then — as a real validator does after switching to the
    canonical fork — replays from the common ancestor with new ids at the
    same heights (b2x b3x; subscriber.rs:97-100's catch-up replay). Those
    deliveries cross a real TCP/ZMTP socket, land in the spool with fresh
    delivery seqs, stream through the DataSource in ONE microbatch, and
    the store's rewind (event_handler.rs:9 MAX_BLOCK_NUM close/rewind +
    the serial-delivery intra-batch fork semantics) must leave the final
    state EQUAL to the canonical chain's."""
    chain_a = [_event_list(1, "v1"), _event_list(2, "v2"), _event_list(3, "v3")]
    fork = [
        _event_list(2, "v2x", block_id="b2x"),
        _event_list(3, "v3x", block_id="b3x"),
    ]
    srv = FakeValidator(known_block="k2", events=chain_a + fork)
    srv.start()

    spool = str(tmp_path / "spool")
    bridge = ZmtpSpoolBridge("127.0.0.1", srv.port, spool)
    t = threading.Thread(
        target=bridge.run, args=([f"k{i}" for i in range(14, -1, -1)],), daemon=True
    )
    t.start()
    deadline = time.monotonic() + 10
    while bridge.n_spooled < 5 and time.monotonic() < deadline:
        time.sleep(0.05)
    bridge.request_stop()
    t.join(timeout=10)
    # both chains spooled in delivery order, same heights twice
    assert list(bridge.spooled) == [1, 2, 3, 2, 3]

    store = ScdParquetStore(spark, str(tmp_path / "reporting"))
    q = run_validator_stream(spark, spool, store, str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(120)

    versions = sorted(
        (r["public_key"], r["name"], r["start_block_num"], r["end_block_num"])
        for r in store.read("agents").collect()
    )
    # exactly the canonical chain's history: v2/v3 (the orphaned fork) are
    # gone, v1 closes at the fork point, v2x/v3x carry forward
    assert versions == [
        ("test_public_key", "v1", 1, 2),
        ("test_public_key", "v2x", 2, 3),
        ("test_public_key", "v3x", 3, MAX_BLOCK_NUM),
    ]
    blocks = {r["block_num"]: r["block_id"] for r in store.blocks().collect()}
    assert blocks == {1: "b1", 2: "b2x", 3: "b3x"}
