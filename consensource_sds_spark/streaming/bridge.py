"""ZMTP -> spool bridge: the last hop that makes S1 end-to-end real.

``main.rs`` wires subscriber -> event_handler in one process; the Spark
shape splits it at a replayable boundary: this bridge runs the live
subscription (pure-stdlib ZMTP transport, :mod:`streaming.zmtp`) and
appends each delivered ``EventList`` — byte-identical to the wire — to
the validator spool that :mod:`sources.validator_source` streams from.
The spool is the WAL: the engine's offset log + block-number offsets give
exactly-once replay downstream no matter when the bridge or the query
restarts, and ``ScdParquetStore.known_block_ids`` seeds BOTH ends (the
walk-back window here, ``start_block`` there).
"""

from __future__ import annotations

from collections import deque

from consensource_sds_spark.codec import decode_message
from consensource_sds_spark.sources.validator_source import next_seq, write_envelope
from consensource_sds_spark.streaming import zmtp
from consensource_sds_spark.streaming.subscriber import EventSubscription, WireTransport

BLOCK_COMMIT = "sawtooth/block-commit"


def block_num_of(event_list_bytes: bytes) -> int | None:
    """The delivery's block number, from its block-commit event attributes
    (every validator delivery carries one; heartbeats carry nothing)."""
    decoded = decode_message("EventList", bytes(event_list_bytes))
    for ev in decoded["events"]:
        if ev["event_type"] == BLOCK_COMMIT:
            for attr in ev["attributes"]:
                if attr["key"] == "block_num":
                    return int(attr["value"])
    return None


class ZmtpSpoolBridge:
    """Subscribe over ZMTP and spool every delivery for the Spark source.

    Heartbeat deliveries (no block-commit event) are dropped here — the
    F1 filter's first line of defense — so the spool only ever holds
    replayable block-keyed envelopes."""

    def __init__(self, host: str, port: int, spool_dir: str):
        self.spool_dir = spool_dir
        self.channel = zmtp.ValidatorChannel(zmtp.connect(host, port))
        self.subscription = EventSubscription(
            WireTransport(self.channel), handler=self._on_delivery, poll_timeout_sec=0.2
        )
        # own counter: one listdir at startup, never one per delivery
        self._seq = next_seq(spool_dir)
        #: recent spooled block numbers (BOUNDED — a long-running bridge
        #: must not grow a list forever); n_spooled is the full count
        self.spooled: deque[int] = deque(maxlen=4096)
        self.n_spooled = 0

    def _on_delivery(self, event_list_bytes: bytes) -> None:
        bn = block_num_of(event_list_bytes)
        if bn is None:
            return  # heartbeat
        write_envelope(self.spool_dir, bn, bytes(event_list_bytes), seq=self._seq)
        self._seq += 1
        self.spooled.append(bn)
        self.n_spooled += 1

    def run(self, known_block_ids: list[str]) -> None:
        """Negotiate (S3 walk-back) then poll until ``request_stop`` —
        blocking; run it on a thread and stop via ``request_stop()``."""
        try:
            self.subscription.start(known_block_ids)
        finally:
            self.channel.close()

    def request_stop(self) -> None:
        self.subscription.request_stop()
