"""Pure-stdlib ZMTP 3.0 transport: the real wire protocol under the
reference's ZMQ DEALER socket (subscriber.rs:33-42), with no zmq library.

The sandbox ships no pyzmq, but ZeroMQ's wire protocol (ZMTP, public spec
at rfc.zeromq.org/spec/23) is just TCP framing: a fixed 64-byte greeting,
a NULL-mechanism READY handshake carrying the socket type, then
length-prefixed frames. This module implements exactly the subset a
sawtooth client needs — a DEALER-side socket — plus the sawtooth
``Message`` envelope (public validator.proto: message_type enum,
correlation_id, content) and a ``ValidatorChannel`` that plugs straight
into :class:`subscriber.WireTransport` (``send_request``/``recv_event``).

The in-repo test peer is a DEALER-style listener (frames identical to the
client's; a real validator is a ROUTER, which only differs by the identity
envelope its own side manages), so the loopback tests exercise this
client's actual bytes end to end: greeting, READY, framing, correlation,
event delivery, unsubscribe.
"""

from __future__ import annotations

import socket
import struct
import threading
import time
import uuid

from consensource_sds_spark.codec import wire

# -- ZMTP 3.0 constants ------------------------------------------------------

_SIGNATURE = b"\xff" + b"\x00" * 8 + b"\x7f"
_VERSION = bytes((3, 0))
_MECHANISM = b"NULL" + b"\x00" * 16
_FLAG_MORE, _FLAG_LONG, _FLAG_COMMAND = 0x01, 0x02, 0x04
#: sanity bound on a single incoming frame — validator EventLists are
#: KBs-to-MBs; anything larger is a desynced or hostile stream
_MAX_FRAME_BYTES = 64 * 1024 * 1024

# -- sawtooth Message envelope (public validator.proto) ----------------------

MSG_CLIENT_EVENTS_SUBSCRIBE_REQUEST = 500
MSG_CLIENT_EVENTS_SUBSCRIBE_RESPONSE = 501
MSG_CLIENT_EVENTS_UNSUBSCRIBE_REQUEST = 502
MSG_CLIENT_EVENTS_UNSUBSCRIBE_RESPONSE = 503
MSG_CLIENT_EVENTS = 504

_TYPE_BY_NAME = {
    "CLIENT_EVENTS_SUBSCRIBE_REQUEST": MSG_CLIENT_EVENTS_SUBSCRIBE_REQUEST,
    "CLIENT_EVENTS_UNSUBSCRIBE_REQUEST": MSG_CLIENT_EVENTS_UNSUBSCRIBE_REQUEST,
}


def encode_validator_message(message_type: int, correlation_id: str, content: bytes) -> bytes:
    out = bytearray()
    out += wire.encode_varint_field(1, message_type)
    out += wire.encode_len_delimited(2, correlation_id.encode())
    out += wire.encode_len_delimited(3, content)
    return bytes(out)


def decode_validator_message(buf: bytes) -> tuple[int, str, bytes]:
    mtype, corr, content = 0, "", b""
    for fnum, _wt, raw in wire.iter_fields(bytes(buf)):
        if fnum == 1:
            mtype = raw
        elif fnum == 2:
            corr = raw.decode()
        elif fnum == 3:
            content = raw
    return mtype, corr, content


# -- framing -----------------------------------------------------------------


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed during read")
        buf += chunk
    return bytes(buf)


def _send_frame(sock: socket.socket, body: bytes, command: bool = False, more: bool = False) -> None:
    flags = (_FLAG_COMMAND if command else 0) | (_FLAG_MORE if more else 0)
    if len(body) > 255:
        sock.sendall(bytes((flags | _FLAG_LONG,)) + struct.pack(">Q", len(body)) + body)
    else:
        sock.sendall(bytes((flags, len(body))) + body)


def _recv_frame(sock: socket.socket, first_byte_timeout: float | None = None) -> tuple[bytes, bool, bool]:
    """Read one frame. A timeout can only fire on the FIRST byte (a frame
    boundary — nothing consumed, so the stream stays in sync); once the
    flags byte is in, the rest of the frame is read blocking. socket.timeout
    propagates to the caller only from that first read."""
    sock.settimeout(first_byte_timeout)
    try:
        flags = _recv_exact(sock, 1)[0]
    finally:
        sock.settimeout(None)
    if flags & _FLAG_LONG:
        size = struct.unpack(">Q", _recv_exact(sock, 8))[0]
    else:
        size = _recv_exact(sock, 1)[0]
    if size > _MAX_FRAME_BYTES:
        # a desynced stream or non-ZMTP peer advertising a huge frame must
        # surface as the module's documented ConnectionError, not as an
        # OverflowError/MemoryError from recv(2**63)
        raise ConnectionError(f"frame size {size} exceeds the {_MAX_FRAME_BYTES}-byte bound")
    body = _recv_exact(sock, size)
    return body, bool(flags & _FLAG_COMMAND), bool(flags & _FLAG_MORE)


def _ready_command(socket_type: str) -> bytes:
    name = b"Socket-Type"
    val = socket_type.encode()
    return (
        bytes((len(b"READY"),))
        + b"READY"
        + bytes((len(name),))
        + name
        + struct.pack(">I", len(val))
        + val
    )


def _parse_ready(body: bytes) -> dict[str, bytes]:
    if not body:
        # a desynced/malformed peer; must be the module's documented
        # ConnectionError, not an IndexError escaping the handshake
        raise ConnectionError("empty command frame where READY was expected")
    nlen = body[0]
    cmd = body[1 : 1 + nlen]
    if cmd != b"READY":
        raise ConnectionError(f"expected READY, got {cmd!r}")
    meta: dict[str, bytes] = {}
    pos = 1 + nlen
    while pos < len(body):
        klen = body[pos]
        if pos + 1 + klen + 4 > len(body):
            # truncated metadata must be the documented ConnectionError,
            # not a struct.error escaping from a short unpack slice
            raise ConnectionError("truncated READY metadata")
        key = body[pos + 1 : pos + 1 + klen].decode()
        pos += 1 + klen
        vlen = struct.unpack(">I", body[pos : pos + 4])[0]
        if pos + 4 + vlen > len(body):
            raise ConnectionError("truncated READY metadata value")
        meta[key] = body[pos + 4 : pos + 4 + vlen]
        pos += 4 + vlen
    return meta


class ZmtpSocket:
    """One ZMTP 3.0 NULL-mechanism peer over a connected TCP socket."""

    def __init__(self, sock: socket.socket, socket_type: str = "DEALER"):
        self.sock = sock
        self.socket_type = socket_type
        # ALL outbound frames serialize here — including the PONG the
        # reader thread emits from inside recv_message: two concurrent
        # sendall() calls interleave bytes and desync the peer's framing
        self._send_lock = threading.Lock()

    def handshake(self) -> dict[str, bytes]:
        """Exchange greeting + READY; returns the peer's READY metadata."""
        s = self.sock
        s.sendall(_SIGNATURE + _VERSION + _MECHANISM + b"\x00" + b"\x00" * 31)
        peer = _recv_exact(s, 64)
        if peer[:10] != _SIGNATURE or peer[10] < 3:
            raise ConnectionError("not a ZMTP 3.x peer")
        if peer[12:32].rstrip(b"\x00") != b"NULL":
            raise ConnectionError("peer requires a security mechanism")
        _send_frame(s, _ready_command(self.socket_type), command=True)
        body, is_cmd, _more = _recv_frame(s)
        if not is_cmd:
            raise ConnectionError("expected READY command before messages")
        return _parse_ready(body)

    def send_message(self, payload: bytes) -> None:
        with self._send_lock:
            _send_frame(self.sock, payload)

    def _handle_command(self, body: bytes) -> None:
        """ZMTP command dispatch: answer PING with a PONG echoing the ping
        context (spec 23 / ZMTP 3.1 heartbeats — a heartbeating peer
        disconnects clients that never PONG); other commands are ignored."""
        if not body:
            return
        nlen = body[0]
        name = body[1 : 1 + nlen]
        if name == b"PING":
            # PING body after the name: 2-byte TTL then opaque context
            context = body[1 + nlen + 2 :]
            with self._send_lock:
                _send_frame(self.sock, bytes((4,)) + b"PONG" + context, command=True)

    def recv_message(self, timeout_sec: float | None = None) -> bytes | None:
        """One complete message (multipart concatenated); None on timeout.

        Timeouts are only honored at a frame boundary with no message
        parts pending — a timeout mid-multipart means the peer stalled
        inside a message, which is unrecoverable framing-wise, so it
        raises ConnectionError instead of silently desyncing.

        ``timeout_sec`` is one DEADLINE for the whole call, not a
        per-frame budget: command traffic (heartbeat PINGs) arriving more
        often than the timeout must not postpone it forever — a shutdown
        poll that never times out never re-checks its stop flag."""
        deadline = None if timeout_sec is None else time.monotonic() + timeout_sec
        parts: list[bytes] = []
        while True:
            if deadline is None:
                remaining = None
            else:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    if parts:
                        raise ConnectionError("peer stalled mid-multipart message")
                    return None
            try:
                body, is_cmd, more = _recv_frame(self.sock, first_byte_timeout=remaining)
            except (socket.timeout, TimeoutError, BlockingIOError):
                if parts:
                    raise ConnectionError("peer stalled mid-multipart message")
                return None
            if is_cmd:
                self._handle_command(body)
                continue
            parts.append(body)
            if not more:
                return b"".join(parts)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


def connect(
    host: str, port: int, socket_type: str = "DEALER", timeout_sec: float = 30.0
) -> ZmtpSocket:
    """TCP connect + ZMTP handshake, BOUNDED: a peer that accepts the
    connection but never greets (wedged validator, non-ZMTP service on
    the port) must not hang the caller forever, and a failed handshake
    must not leak the socket."""
    sock = socket.create_connection((host, port), timeout=timeout_sec)
    z = ZmtpSocket(sock, socket_type)
    try:
        z.handshake()
    except BaseException:
        z.close()
        raise
    sock.settimeout(None)  # steady state: recv_message manages timeouts
    return z


class ValidatorChannel:
    """The reference's DEALER channel semantics over :class:`ZmtpSocket`:
    correlated request/reply (subscriber.rs future.get) plus an event
    inbox for the unsolicited CLIENT_EVENTS deliveries that interleave
    with replies on the same socket."""

    def __init__(self, zsock: ZmtpSocket):
        self.zsock = zsock
        self._events: list[bytes] = []
        self._replies: dict[str, bytes] = {}
        #: correlation ids someone is still waiting on — a reply landing
        #: after its request timed out would otherwise be stored under a
        #: key nothing ever pops (unbounded growth on a long-running
        #: channel against an intermittently slow validator)
        self._pending: set[str] = set()
        self._lock = threading.Lock()
        # serialize frame READS separately: two threads inside
        # recv_message would interleave multipart frame reads (corrupted
        # messages / spurious mid-multipart errors); reads must not hold
        # the dict lock (they block up to the poll timeout). Outbound
        # frames serialize in ZmtpSocket._send_lock, which also covers
        # the PONG the reader thread emits.
        self._read_lock = threading.Lock()

    def _pump(self, timeout_sec: float) -> bool:
        with self._read_lock:
            msg = self.zsock.recv_message(timeout_sec)
        if msg is None:
            return False
        mtype, corr, content = decode_validator_message(msg)
        with self._lock:
            if mtype == MSG_CLIENT_EVENTS:
                self._events.append(content)
            elif corr in self._pending:
                self._replies[corr] = content
        return True

    def send_request(self, message_type: str, payload: bytes, timeout_sec: float = 10.0) -> bytes:
        mtype = _TYPE_BY_NAME[message_type]
        corr = uuid.uuid4().hex
        with self._lock:
            self._pending.add(corr)
        try:
            self.zsock.send_message(encode_validator_message(mtype, corr, payload))
            deadline = time.monotonic() + timeout_sec
            while time.monotonic() < deadline:
                with self._lock:
                    if corr in self._replies:
                        return self._replies.pop(corr)
                self._pump(min(0.2, max(0.01, deadline - time.monotonic())))
            # the final _pump may have stored the reply right AT the
            # deadline — raising then would discard a reply we hold
            with self._lock:
                if corr in self._replies:
                    return self._replies.pop(corr)
            raise TimeoutError(f"no reply to {message_type} within {timeout_sec}s")
        finally:
            with self._lock:
                self._pending.discard(corr)
                self._replies.pop(corr, None)

    def recv_event(self, timeout_sec: float) -> bytes | None:
        with self._lock:
            if self._events:
                return self._events.pop(0)
        self._pump(timeout_sec)
        with self._lock:
            return self._events.pop(0) if self._events else None

    def close(self) -> None:
        self.zsock.close()
