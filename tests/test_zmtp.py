"""ZMTP transport end-to-end over a real TCP loopback: greeting + NULL
READY handshake, sawtooth Message envelope correlation, the S3 walk-back
negotiation against a fake validator that only knows an older block,
interleaved CLIENT_EVENTS delivery, and the S4 acknowledged unsubscribe —
all through the SAME EventSubscription/WireTransport stack the spool
transport uses, no pyzmq anywhere."""

from __future__ import annotations

import socket
import threading

import pytest
import time

from consensource_sds_spark.codec.messages import decode_message, encode_message
from consensource_sds_spark.streaming import zmtp
from consensource_sds_spark.streaming.subscriber import EventSubscription, WireTransport


class FakeValidator(threading.Thread):
    """DEALER-style listener speaking the subscription protocol; knows one
    block id and rejects windows that don't contain it (UNKNOWN_BLOCK)."""

    def __init__(self, known_block: str, events: list[bytes]):
        super().__init__(daemon=True)
        self.known_block = known_block
        self.events = events
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self.offered_windows: list[list[str]] = []
        self.got_unsubscribe = False
        self.handshake_meta: dict[str, bytes] | None = None

    def run(self) -> None:
        conn, _ = self.srv.accept()
        zs = zmtp.ZmtpSocket(conn, socket_type="DEALER")
        self.handshake_meta = zs.handshake()
        subscribed = False
        while True:
            msg = zs.recv_message(timeout_sec=10)
            if msg is None:
                return
            mtype, corr, content = zmtp.decode_validator_message(msg)
            if mtype == zmtp.MSG_CLIENT_EVENTS_SUBSCRIBE_REQUEST:
                req = decode_message("ClientEventsSubscribeRequest", content)
                window = req["last_known_block_ids"]
                self.offered_windows.append(window)
                ok = self.known_block in window
                reply = encode_message(
                    "ClientEventsSubscribeResponse",
                    {"status": "OK" if ok else "UNKNOWN_BLOCK"},
                )
                zs.send_message(
                    zmtp.encode_validator_message(
                        zmtp.MSG_CLIENT_EVENTS_SUBSCRIBE_RESPONSE, corr, reply
                    )
                )
                if ok and not subscribed:
                    subscribed = True
                    for ev in self.events:  # unsolicited deliveries
                        zs.send_message(
                            zmtp.encode_validator_message(zmtp.MSG_CLIENT_EVENTS, "", ev)
                        )
            elif mtype == zmtp.MSG_CLIENT_EVENTS_UNSUBSCRIBE_REQUEST:
                self.got_unsubscribe = True
                reply = encode_message("ClientEventsUnsubscribeResponse", {"status": "OK"})
                zs.send_message(
                    zmtp.encode_validator_message(
                        zmtp.MSG_CLIENT_EVENTS_UNSUBSCRIBE_RESPONSE, corr, reply
                    )
                )
                zs.close()
                return


def test_validator_message_roundtrip():
    buf = zmtp.encode_validator_message(zmtp.MSG_CLIENT_EVENTS, "abc123", b"\x01\x02")
    assert zmtp.decode_validator_message(buf) == (zmtp.MSG_CLIENT_EVENTS, "abc123", b"\x01\x02")


def test_subscription_over_zmtp_loopback():
    payloads = [b"eventlist-1", b"eventlist-2"]
    # client knows 15 heads; validator only knows the 13th-newest -> the
    # first 10-wide window is rejected, the walk-back's second window lands
    srv = FakeValidator(known_block="k2", events=payloads)
    srv.start()

    z = zmtp.connect("127.0.0.1", srv.port)
    channel = zmtp.ValidatorChannel(z)
    transport = WireTransport(channel)
    received: list[bytes] = []
    sub = EventSubscription(transport, handler=received.append, poll_timeout_sec=0.2)

    known = [f"k{i}" for i in range(14, -1, -1)]  # k14 (newest) .. k0
    runner = threading.Thread(target=sub.start, args=(known,), daemon=True)
    runner.start()
    deadline = time.monotonic() + 10
    while len(received) < 2 and time.monotonic() < deadline:
        time.sleep(0.05)
    sub.request_stop()
    runner.join(timeout=10)
    assert not runner.is_alive()

    assert received == payloads
    # walk-back happened: first offered window lacked k2, second had it
    assert len(srv.offered_windows) == 2
    assert "k2" not in srv.offered_windows[0] and "k2" in srv.offered_windows[1]
    # READY handshake carried the DEALER socket type
    assert srv.handshake_meta and srv.handshake_meta.get("Socket-Type") == b"DEALER"
    # acknowledged unsubscribe (S4)
    srv.join(timeout=5)
    assert srv.got_unsubscribe
    channel.close()


def test_ping_answered_with_pong():
    """A heartbeating peer sends PING mid-stream; the client must answer
    PONG (echoing the ping context) and keep receiving messages — a
    validator running ZMTP heartbeats disconnects clients that never PONG."""
    a, b = socket.socketpair()
    client = zmtp.ZmtpSocket(b)
    # peer: PING command (TTL=0x0064, context b"ctx"), then a real message
    zmtp._send_frame(a, bytes((4,)) + b"PING" + b"\x00\x64" + b"ctx", command=True)
    zmtp._send_frame(a, b"payload-after-ping")
    assert client.recv_message(timeout_sec=5) == b"payload-after-ping"
    # the client's PONG is on the wire: command frame, name PONG, same context
    body, is_cmd, _more = zmtp._recv_frame(a)
    assert is_cmd and body == bytes((4,)) + b"PONG" + b"ctx"
    a.close()
    b.close()


def test_timeout_before_any_frame_is_clean_none():
    a, b = socket.socketpair()
    client = zmtp.ZmtpSocket(b)
    assert client.recv_message(timeout_sec=0.1) is None
    # stream still in sync: a frame sent afterwards parses normally
    zmtp._send_frame(a, b"still-in-sync")
    assert client.recv_message(timeout_sec=5) == b"still-in-sync"
    a.close()
    b.close()


def test_stall_mid_multipart_raises():
    """A timeout AFTER a MORE-flagged part has been consumed must raise
    (reconnect), never return None with the stream desynced."""
    import pytest

    a, b = socket.socketpair()
    client = zmtp.ZmtpSocket(b)
    zmtp._send_frame(a, b"part-1", more=True)  # ...and then the peer stalls
    with pytest.raises(ConnectionError):
        client.recv_message(timeout_sec=0.2)
    a.close()
    b.close()


def test_long_frame_roundtrip():
    """Frames >255 bytes use the 8-byte-length LONG form."""
    a, b = socket.socketpair()
    big = bytes(range(256)) * 40  # 10 KiB
    zmtp._send_frame(a, big)
    body, is_cmd, more = zmtp._recv_frame(b)
    assert body == big and not is_cmd and not more
    a.close()
    b.close()


def test_framing_roundtrip_property():
    """Hypothesis fuzz over the frame codec: arbitrary multipart payloads
    (short and LONG form, empty parts, interleaved PINGs) reassemble
    exactly, and the PONG echoes every context."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        parts=st.lists(st.binary(max_size=2000), min_size=1, max_size=4),
        ping_ctx=st.one_of(st.none(), st.binary(max_size=16)),
    )
    def check(parts, ping_ctx):
        a, b = socket.socketpair()
        try:
            client = zmtp.ZmtpSocket(b)
            if ping_ctx is not None:
                zmtp._send_frame(a, bytes((4,)) + b"PING" + b"\x00\x10" + ping_ctx, command=True)
            for i, p in enumerate(parts):
                zmtp._send_frame(a, p, more=(i < len(parts) - 1))
            assert client.recv_message(timeout_sec=5) == b"".join(parts)
            if ping_ctx is not None:
                body, is_cmd, _ = zmtp._recv_frame(a)
                assert is_cmd and body == bytes((4,)) + b"PONG" + ping_ctx
        finally:
            a.close()
            b.close()

    check()


def test_huge_frame_header_raises_connection_error():
    """A desynced or non-ZMTP peer advertising an absurd long-frame size
    must surface as the module's documented ConnectionError — never an
    OverflowError/MemoryError escaping from recv(2**63)."""
    import struct

    import pytest

    a, b = socket.socketpair()
    client = zmtp.ZmtpSocket(b)
    a.sendall(bytes((zmtp._FLAG_LONG,)) + struct.pack(">Q", 2**63))
    with pytest.raises(ConnectionError, match="bound"):
        client.recv_message(timeout_sec=1)
    a.close()
    b.close()


def test_truncated_ready_metadata_raises_connection_error():
    import pytest

    # READY command with a metadata key length pointing past the body
    body = bytes((5,)) + b"READY" + bytes((200,)) + b"short"
    with pytest.raises(ConnectionError, match="truncated"):
        zmtp._parse_ready(body)


def test_recv_timeout_is_a_deadline_not_per_frame():
    """Regression (r9 review): heartbeat PINGs arriving more often than the
    poll timeout must not postpone it forever — each handled command
    previously restarted the FULL first-byte timeout, so a chatty peer
    made recv_message never return None and the stop flag was never
    re-checked."""
    a, b = socket.socketpair()
    try:
        zs = zmtp.ZmtpSocket(a)
        stop = threading.Event()

        def ping_flood():
            ping = bytes((4,)) + b"PING" + b"\x00\x00ctx"
            while not stop.is_set():
                # command frame: flags=0x04, short size
                b.sendall(bytes((0x04, len(ping))) + ping)
                time.sleep(0.1)

        t = threading.Thread(target=ping_flood, daemon=True)
        t.start()
        t0 = time.monotonic()
        out = zs.recv_message(timeout_sec=0.5)
        took = time.monotonic() - t0
        stop.set()
        t.join(timeout=2)
        assert out is None
        assert took < 3.0, f"deadline did not fire under command traffic ({took:.1f}s)"
    finally:
        a.close()
        b.close()


def test_recv_timeout_zero_returns_immediately():
    """timeout 0 must behave as an instant poll (None), not flip the
    socket non-blocking and crash with BlockingIOError."""
    a, b = socket.socketpair()
    try:
        assert zmtp.ZmtpSocket(a).recv_message(timeout_sec=0) is None
    finally:
        a.close()
        b.close()


def test_connect_bounded_against_silent_peer():
    """Regression (r9 review): a peer that accepts TCP but never greets
    must not hang connect() forever; the socket is closed on failure."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    try:
        t0 = time.monotonic()
        with pytest.raises(OSError):
            zmtp.connect("127.0.0.1", srv.getsockname()[1], timeout_sec=0.5)
        assert time.monotonic() - t0 < 5.0
    finally:
        srv.close()


def test_late_reply_after_timeout_does_not_leak():
    """Regression (r9 review): a reply landing after its request timed out
    must not be stored under an abandoned correlation id — unbounded
    growth on a long-running channel."""
    a, b = socket.socketpair()
    try:
        ch = zmtp.ValidatorChannel(zmtp.ZmtpSocket(a))
        with pytest.raises(TimeoutError):
            ch.send_request("CLIENT_EVENTS_SUBSCRIBE_REQUEST", b"", timeout_sec=0.3)
        # the peer answers late: read the request off the wire, reply with
        # its correlation id, then pump the channel once
        flags = b.recv(1)[0]
        size = b.recv(1)[0] if not flags & 0x02 else int.from_bytes(b.recv(8), "big")
        _mtype, corr, _ = zmtp.decode_validator_message(b.recv(size))
        late = zmtp.encode_validator_message(
            zmtp.MSG_CLIENT_EVENTS_SUBSCRIBE_RESPONSE, corr, b"late"
        )
        b.sendall(bytes((0, len(late))) + late)
        assert ch.recv_event(timeout_sec=0.5) is None  # pumps the late reply
        assert ch._replies == {} and ch._pending == set()
    finally:
        a.close()
        b.close()


def test_request_stop_before_start_wins():
    """Regression (r9 review): a stop issued before the start thread runs
    must not be erased by a latch reset inside start() — the latch is
    one-shot."""
    from consensource_sds_spark.streaming.subscriber import EventSubscription

    class StubTransport:
        def __init__(self):
            self.unsubscribed = False

        def subscribe(self, block_ids):
            return "OK"

        def unsubscribe(self):
            self.unsubscribed = True
            return "OK"

        def recv(self, timeout_sec):
            time.sleep(0.01)
            return None

    tr = StubTransport()
    sub = EventSubscription(tr, handler=lambda m: None, poll_timeout_sec=0.05)
    sub.request_stop()  # BEFORE start
    t0 = time.monotonic()
    sub.start(["k1"])   # must negotiate, skip the loop, unsubscribe, return
    assert time.monotonic() - t0 < 5.0
    assert tr.unsubscribed
