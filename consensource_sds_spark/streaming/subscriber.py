"""Validator subscription protocol (SURVEY §2.1 S3/S4), transport-agnostic.

Mirrors the reference's ZMQ subscription client semantics
(/root/reference/src/subscriber.rs) without binding to ZMQ (not available in
this sandbox; any transport object with ``subscribe``/``unsubscribe``/
``recv`` drops in — a ZMQ socket, a Kafka consumer bridge, a test fake):

- S3 catch-up negotiation (subscriber.rs:58-106, 157-178): offer the
  validator up to ``KNOWN_COUNT`` most-recent known block ids; on
  UNKNOWN_BLOCK slide the window by ``KNOWN_COUNT`` and retry, walking back
  through history until a common ancestor is found; past the end of the
  list, offer the genesis sentinel ``NULL_BLOCK_ID`` (subscriber.rs:20,
  162-164). The validator then replays events since the agreed block and
  W4 fork repair fixes any divergent rows.
- S4 graceful shutdown (subscriber.rs:121-151, main.rs:67-71): a stop flag
  checked once per poll; on exit an unsubscribe request is sent and must be
  acknowledged OK.

Deviation from the reference, on purpose: if the validator rejects even the
genesis sentinel the reference would recurse forever (start() at
subscriber.rs:97-100 re-offers the same [NULL_BLOCK_ID] window);
here that raises ``SubscriptionError`` — an unbounded retry against a
validator that rejects genesis is a config error, not a fork.
"""

from __future__ import annotations

from collections.abc import Callable

from consensource_sds_spark.addressing import NAMESPACE
from consensource_sds_spark.codec.messages import decode_message, encode_message

#: genesis sentinel block id (subscriber.rs:20)
NULL_BLOCK_ID = "0000000000000000"
#: how many known block ids are offered per attempt (subscriber.rs:21)
KNOWN_COUNT = 10


# -- wire messages (S2, subscriber.rs:180-223; public client_event.proto) ----


def get_block_commit_subscription() -> dict:
    return {"event_type": "sawtooth/block-commit", "filters": []}


def get_state_delta_subscription(namespace: str = NAMESPACE) -> dict:
    """State-delta subscription with the SERVER-SIDE address filter — the
    reference's only pushdown (REGEX_ANY '^<namespace>' on key 'address',
    subscriber.rs:199-223): the validator filters events before they ever
    cross the wire, the connector-level twin of Catalyst source pushdown."""
    return {
        "event_type": "sawtooth/state-delta",
        "filters": [
            {"key": "address", "match_string": f"^{namespace}", "filter_type": "REGEX_ANY"}
        ],
    }


def build_subscription_request(last_known_block_ids: list[str]) -> bytes:
    """Encoded ClientEventsSubscribeRequest exactly as the reference builds
    it (subscriber.rs:180-197): both subscriptions + the offered cursor."""
    return encode_message(
        "ClientEventsSubscribeRequest",
        {
            "subscriptions": [get_block_commit_subscription(), get_state_delta_subscription()],
            "last_known_block_ids": list(last_known_block_ids),
        },
    )


def parse_subscribe_response(buf: bytes) -> str:
    return decode_message("ClientEventsSubscribeResponse", buf)["status"]


def build_unsubscribe_request() -> bytes:
    return encode_message("ClientEventsUnsubscribeRequest", {})


def parse_unsubscribe_response(buf: bytes) -> str:
    return decode_message("ClientEventsUnsubscribeResponse", buf)["status"]


class SubscriptionError(Exception):
    """Validator returned something other than OK/UNKNOWN_BLOCK, or
    rejected the genesis sentinel."""


def last_known_block_ids(known_block_ids: list[str], start_index: int) -> list[str]:
    """At most KNOWN_COUNT ids starting at start_index, newest first; past
    the end of the list, the genesis sentinel
    (subscriber.rs:157-178 ``get_last_known_block_ids``)."""
    if start_index >= len(known_block_ids):
        return [NULL_BLOCK_ID]
    return known_block_ids[start_index : start_index + KNOWN_COUNT]


def negotiate_subscription(
    subscribe: Callable[[list[str]], str], known_block_ids: list[str]
) -> list[str]:
    """Walk back through known blocks until the validator accepts a window
    (S3). ``subscribe`` is the transport's subscription request: takes the
    offered block ids, returns the response status string ('OK',
    'UNKNOWN_BLOCK', or anything else = error). Returns the accepted
    window."""
    start_index = 0
    while True:
        window = last_known_block_ids(known_block_ids, start_index)
        status = subscribe(window)
        if status == "OK":
            return window
        if status != "UNKNOWN_BLOCK":
            raise SubscriptionError(f"validator returned an invalid response {status!r}")
        if window == [NULL_BLOCK_ID]:
            raise SubscriptionError("validator did not recognize the genesis sentinel")
        start_index += KNOWN_COUNT


class WireTransport:
    """Byte-level transport: speaks the actual subscription protocol over
    any request/reply channel (a ZMQ DEALER socket in the reference,
    subscriber.rs:33-42; anything with the same two methods here).

    ``channel`` needs: ``send_request(message_type: str, payload: bytes)
    -> bytes`` (correlated request/reply, the reference's future.get) and
    ``recv_event(timeout_sec) -> bytes | None`` (the event delivery path).
    """

    SUBSCRIBE = "CLIENT_EVENTS_SUBSCRIBE_REQUEST"
    UNSUBSCRIBE = "CLIENT_EVENTS_UNSUBSCRIBE_REQUEST"

    def __init__(self, channel):
        self.channel = channel

    def subscribe(self, block_ids: list[str]) -> str:
        reply = self.channel.send_request(self.SUBSCRIBE, build_subscription_request(block_ids))
        return parse_subscribe_response(reply)

    def unsubscribe(self) -> str:
        reply = self.channel.send_request(self.UNSUBSCRIBE, build_unsubscribe_request())
        return parse_unsubscribe_response(reply)

    def recv(self, timeout_sec: float):
        return self.channel.recv_event(timeout_sec)


class EventSubscription:
    """The reference's poll loop + shutdown wrapper (subscriber.rs:83-96,
    121-151) over an abstract transport.

    ``transport`` needs: ``subscribe(block_ids) -> status``,
    ``unsubscribe() -> status``, ``recv(timeout_sec) -> bytes | None``
    (None = timeout, exactly the reference's 1 s recv_timeout tick)."""

    def __init__(self, transport, handler: Callable[[bytes], None], poll_timeout_sec: float = 1.0):
        self.transport = transport
        self.handler = handler
        self.poll_timeout_sec = poll_timeout_sec
        self._active = False
        self._stop_requested = False

    def start(self, known_block_ids: list[str]) -> None:
        """Negotiate (S3), then poll until ``request_stop`` (S4). The
        acknowledged unsubscribe runs even when the handler raises
        (try/finally), and a ``request_stop`` issued DURING negotiation
        is honored — the latch is ONE-SHOT and never reset here: a
        request_stop racing the start thread (operator aborts right after
        launching the bridge) must win no matter which line runs first
        (r9 review; construct a fresh subscription to subscribe again).
        A transport failure mid-poll still attempts the unsubscribe, but
        a secondary failure THERE (the socket is usually dead too) must
        not mask the root cause nor re-raise over it."""
        negotiate_subscription(self.transport.subscribe, known_block_ids)
        self._active = True
        try:
            while self._active and not self._stop_requested:
                msg = self.transport.recv(self.poll_timeout_sec)
                if msg is not None:
                    self.handler(msg)
        except BaseException:
            try:
                self.stop()
            except Exception:
                pass  # dead transport; the original error is the story
            raise
        else:
            self.stop()

    def request_stop(self) -> None:
        """Latch the stop request (the reference's ctrl-c AtomicBool,
        main.rs:67-71); the poll loop exits at the next tick — or never
        starts, if negotiation is still in flight."""
        self._stop_requested = True
        self._active = False

    def stop(self) -> None:
        """Send the unsubscribe request; OK required (subscriber.rs:121-151)."""
        self._active = False
        status = self.transport.unsubscribe()
        if status != "OK":
            raise SubscriptionError(f"unsubscribe rejected: {status!r}")
