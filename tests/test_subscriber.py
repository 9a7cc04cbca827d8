"""S3 resubscription walk-back + S4 shutdown (subscriber.rs semantics,
driven against a fake validator transport)."""

from __future__ import annotations

import pytest

from consensource_sds_spark.streaming.subscriber import (
    KNOWN_COUNT,
    NULL_BLOCK_ID,
    EventSubscription,
    SubscriptionError,
    build_subscription_request,
    build_unsubscribe_request,
    last_known_block_ids,
    negotiate_subscription,
    parse_subscribe_response,
    parse_unsubscribe_response,
)


class FakeValidator:
    """Accepts a subscription iff the offered window contains a block id it
    knows (the common-ancestor rule); records every offer."""

    def __init__(self, known: set[str], accept_genesis: bool = True):
        self.known = known
        self.accept_genesis = accept_genesis
        self.offers: list[list[str]] = []
        self.unsubscribed = False

    def subscribe(self, block_ids: list[str]) -> str:
        self.offers.append(list(block_ids))
        if block_ids == [NULL_BLOCK_ID]:
            return "OK" if self.accept_genesis else "UNKNOWN_BLOCK"
        return "OK" if any(b in self.known for b in block_ids) else "UNKNOWN_BLOCK"

    def unsubscribe(self) -> str:
        self.unsubscribed = True
        return "OK"

    def recv(self, timeout_sec: float):
        return None


def test_window_function_mirrors_reference():
    ids = [f"b{i}" for i in range(25)]
    assert last_known_block_ids(ids, 0) == ids[:10]
    assert last_known_block_ids(ids, 20) == ids[20:]  # short tail window
    assert last_known_block_ids(ids, 25) == [NULL_BLOCK_ID]
    assert last_known_block_ids([], 0) == [NULL_BLOCK_ID]


def test_walkback_slides_by_known_count_until_common_ancestor():
    ids = [f"b{i}" for i in range(25)]  # newest first
    v = FakeValidator(known={"b23"})  # deep fork: only an old block is shared
    window = negotiate_subscription(v.subscribe, ids)
    assert [len(o) for o in v.offers] == [KNOWN_COUNT, KNOWN_COUNT, 5]
    assert window == ids[20:]


def test_walkback_reaches_genesis_sentinel():
    ids = [f"b{i}" for i in range(12)]
    v = FakeValidator(known=set())  # validator on a different chain entirely
    window = negotiate_subscription(v.subscribe, ids)
    assert v.offers == [ids[:10], ids[10:], [NULL_BLOCK_ID]]
    assert window == [NULL_BLOCK_ID]


def test_genesis_rejection_errors_instead_of_looping():
    v = FakeValidator(known=set(), accept_genesis=False)
    with pytest.raises(SubscriptionError):
        negotiate_subscription(v.subscribe, ["b1"])


def test_invalid_status_errors():
    with pytest.raises(SubscriptionError):
        negotiate_subscription(lambda w: "INTERNAL_ERROR", ["b1"])


def test_subscription_request_wire_roundtrip():
    """The encoded ClientEventsSubscribeRequest carries exactly what the
    reference sends (subscriber.rs:180-223): two subscriptions, the
    server-side namespace regex filter, and the offered block cursor."""
    from consensource_sds_spark.addressing import NAMESPACE
    from consensource_sds_spark.codec.messages import decode_message

    buf = build_subscription_request(["b2", "b1"])
    req = decode_message("ClientEventsSubscribeRequest", buf)
    assert [s["event_type"] for s in req["subscriptions"]] == [
        "sawtooth/block-commit",
        "sawtooth/state-delta",
    ]
    assert req["subscriptions"][0]["filters"] == []
    (f,) = req["subscriptions"][1]["filters"]
    assert f == {"key": "address", "match_string": f"^{NAMESPACE}", "filter_type": "REGEX_ANY"}
    assert req["last_known_block_ids"] == ["b2", "b1"]


def test_response_parsing():
    from consensource_sds_spark.codec.messages import encode_message

    ok = encode_message("ClientEventsSubscribeResponse", {"status": "OK"})
    unk = encode_message("ClientEventsSubscribeResponse", {"status": "UNKNOWN_BLOCK"})
    assert parse_subscribe_response(ok) == "OK"
    assert parse_subscribe_response(unk) == "UNKNOWN_BLOCK"
    assert build_unsubscribe_request() == b""  # empty message, like the reference
    assert parse_unsubscribe_response(
        encode_message("ClientEventsUnsubscribeResponse", {"status": "OK"})
    ) == "OK"


def test_poll_loop_stops_and_unsubscribes():
    v = FakeValidator(known={"b1"})
    messages = [b"m1", b"m2"]
    v.recv = lambda timeout_sec: messages.pop(0) if messages else None
    got: list[bytes] = []
    sub = EventSubscription(v, handler=lambda m: got.append(m))

    def handler(m):
        got.append(m)
        if len(got) == 2:
            sub.request_stop()

    sub.handler = handler
    sub.start(["b1"])
    assert got == [b"m1", b"m2"]
    assert v.unsubscribed


def test_wire_transport_full_protocol_stack():
    """EventSubscription over WireTransport over a byte-level fake
    validator: the entire stack exchanges real protobuf bytes; only the
    socket itself is faked."""
    from consensource_sds_spark.codec.messages import decode_message, encode_message
    from consensource_sds_spark.streaming.subscriber import WireTransport

    class ByteValidator:
        def __init__(self):
            self.requests: list[tuple[str, dict]] = []
            self.events = [b"evt1", None]

        def send_request(self, message_type: str, payload: bytes) -> bytes:
            if message_type == WireTransport.SUBSCRIBE:
                req = decode_message("ClientEventsSubscribeRequest", payload)
                self.requests.append((message_type, req))
                status = "OK" if "known" in req["last_known_block_ids"] else "UNKNOWN_BLOCK"
                return encode_message("ClientEventsSubscribeResponse", {"status": status})
            self.requests.append((message_type, {}))
            return encode_message("ClientEventsUnsubscribeResponse", {"status": "OK"})

        def recv_event(self, timeout_sec: float):
            return self.events.pop(0) if self.events else None

    v = ByteValidator()
    transport = WireTransport(v)
    got: list[bytes] = []
    sub = EventSubscription(transport, handler=lambda m: (got.append(m), sub.request_stop()))
    # 25 unknown heads force one slide before the window containing 'known'
    sub.start([f"h{i}" for i in range(KNOWN_COUNT)] + ["known"])
    assert got == [b"evt1"]
    kinds = [k for k, _ in v.requests]
    assert kinds == [WireTransport.SUBSCRIBE, WireTransport.SUBSCRIBE, WireTransport.UNSUBSCRIBE]
    assert v.requests[1][1]["last_known_block_ids"] == ["known"]
    # the wire request always carries both subscriptions + the regex filter
    assert len(v.requests[0][1]["subscriptions"]) == 2


def test_spark_stream_graceful_stop_and_resume(spark, tmp_path):
    """S4 on the Spark side: stop a live processing-time stream mid-flight;
    the checkpoint + store manifest stay consistent and a later run resumes
    exactly-once."""
    import time

    from consensource_sds_spark.operators.scd2 import ScdParquetStore
    from consensource_sds_spark.schemas import MAX_BLOCK_NUM
    from consensource_sds_spark.sources import fixtures as fx
    from consensource_sds_spark.streaming.runner import run_file_stream, stop_stream

    store = ScdParquetStore(spark, str(tmp_path / "reporting"))
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    fx.events_df(
        spark, [fx.delivery(1, "b1", [fx.state_change("agent", fx.PUBLIC_KEY, [fx.make_agent()])])]
    ).write.parquet(src)

    q = run_file_stream(spark, src, store, ckpt, trigger_once=False, processing_time="1 second")
    deadline = time.time() + 90
    while time.time() < deadline and store.current("agents").count() == 0:
        time.sleep(0.5)
    stop_stream(q)
    assert not q.isActive
    assert store.current("agents").count() == 1

    # resume over the same checkpoint: only the new file is processed
    fx.events_df(
        spark,
        [fx.delivery(2, "b2", [fx.state_change("agent", fx.PUBLIC_KEY, [dict(fx.make_agent(), name="v2")])])],
    ).write.mode("append").parquet(src)
    q2 = run_file_stream(spark, src, store, ckpt, trigger_once=True)
    q2.awaitTermination(120)
    versions = sorted(
        (r["name"], r["start_block_num"], r["end_block_num"]) for r in store.read("agents").collect()
    )
    assert versions == [("test", 1, 2), ("v2", 2, MAX_BLOCK_NUM)]


def test_request_stop_during_negotiation_is_not_lost():
    """request_stop issued while start() is still negotiating (walk-back
    round trips can take many seconds) must be honored: the old flag was
    overwritten by the loop entry's _active = True and the poll loop ran
    forever."""
    v = FakeValidator(known={"b1"})
    sub = EventSubscription(v, handler=lambda m: None, poll_timeout_sec=0.01)
    orig_subscribe = v.subscribe

    def slow_subscribe(block_ids):
        sub.request_stop()  # lands mid-negotiation
        return orig_subscribe(block_ids)

    v.subscribe = slow_subscribe
    sub.start(["b1"])  # must return (and unsubscribe), not poll forever
    assert v.unsubscribed


def test_handler_exception_still_unsubscribes():
    """A handler crash must not skip the acknowledged unsubscribe (S4):
    the validator would otherwise keep the subscription until TCP
    teardown and the object would be left active."""
    import pytest

    v = FakeValidator(known={"b1"})
    v.recv = lambda timeout_sec: b"boom"
    sub = EventSubscription(v, handler=lambda m: (_ for _ in ()).throw(OSError("disk full")))
    with pytest.raises(OSError):
        sub.start(["b1"])
    assert v.unsubscribed
