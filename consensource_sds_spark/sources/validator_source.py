"""Custom Structured Streaming source for validator event deliveries (S1).

The reference's event source is a ZMQ DEALER socket polled in a loop
(subscriber.rs:33-42, 58-106). The idiomatic Spark 4 equivalent is a
Python DataSource: this module implements one whose offsets are delivery
SEQUENCE numbers over an append-only spool, so the catch-up cursor (S3),
replayable recovery, and exactly-once batch semantics come from the
engine's offset log instead of hand-rolled state:

- the transport is a spool directory of ``<seq>-<block_num>.evl`` files,
  each one encoded ``EventList`` envelope exactly as delivered on the
  wire (the package codec's bytes), fsynced before the writer returns;
  APPEND-ONLY — a fork's replacement delivery for an already-spooled
  height gets a fresh seq instead of overwriting, so committed ranges
  replay byte-identically AND the replacement flows downstream where W4
  repairs the store;
- ``initialOffset`` honors a ``start_block`` option — the
  ``ScdParquetStore.known_block_ids`` handshake (S3) feeds it, so a
  restarted pipeline skips the contiguous history prefix the store
  already holds rather than re-reading it;
- ``read(start)`` returns spooled deliveries above the cursor (bounded
  by ``max_blocks_per_batch`` so a backlog never materializes in one
  driver-side batch) and advances it; ``readBetweenOffsets`` replays a
  committed range deterministically (the spool is the WAL);
- rows are the package's EVENT envelope schema + ``delivery_id`` (= the
  delivery seq — unique even across a fork and its same-height
  replacement, which the SCD2 sink's serial fork resolution needs),
  identical in shape to ``fixtures.events_df``, so the whole
  transform/SCD2 pipeline runs on the stream unchanged.

Driver-side reads (SimpleDataSourceStreamReader) are correct here: the
source hands over envelope *references* per microbatch (one block's events
are KBs); the heavy decode/fan-out runs distributed in the DataFrame plan.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from consensource_sds_spark import schemas
from consensource_sds_spark.codec import decode_message

FORMAT_NAME = "sds_validator"
ENVELOPE_EXT = ".evl"

#: EVENT envelope + delivery_id, the shape fixtures.events_df produces —
#: one shared definition (schemas.event_envelope_schema) so the source,
#: the fixtures, and the streaming runner cannot drift
STREAM_SCHEMA = schemas.event_envelope_schema()


def spool_path(directory: str, seq: int, block_num: int) -> str:
    """``<seq>-<block_num>.evl`` — APPEND-ONLY naming: the delivery
    SEQUENCE number keys the file, so a fork's replacement for an
    already-spooled height lands as a NEW file instead of overwriting the
    committed one. Overwrite-by-height had two failure modes: committed
    offset ranges replayed different bytes than the original batch
    (breaking the spool-is-the-WAL contract), and the cursor (past the
    height) never re-read the replacement, so W4 fork repair silently
    never ran downstream."""
    return os.path.join(directory, f"{seq:020d}-{block_num:020d}{ENVELOPE_EXT}")


def _parse_name(name: str) -> tuple[int, int] | None:
    """(seq, block_num) from a spool filename; legacy block-keyed files
    (``<block>.evl``, pre-append-only) read as seq == block_num, which
    preserves both their ordering and any committed ``last_block``
    cursor over them."""
    if not name.endswith(ENVELOPE_EXT):
        return None
    stem = name[: -len(ENVELOPE_EXT)]
    try:
        if "-" in stem:
            s, b = stem.split("-", 1)
            return int(s), int(b)
        return int(stem), int(stem)
    except ValueError:
        # a foreign *.evl file (backup.evl, editor droppings) is not a
        # spool entry — returning None skips it; raising here would fail
        # EVERY microbatch until someone hand-deletes the file
        return None


def next_seq(directory: str) -> int:
    """The next delivery sequence number (single-writer bridge contract)."""
    entries = _spooled_entries(directory)
    return (entries[-1][0] + 1) if entries else 0


def write_envelope(
    directory: str, block_num: int, event_list_bytes: bytes, seq: int | None = None
) -> str:
    """Bridge-side helper: append one delivery to the spool (what the ZMQ
    poll loop would do per received EventList). ``seq`` defaults to the
    next spool sequence (a long-running bridge passes its own counter to
    avoid the per-write listdir).

    Durability: file AND directory are fsynced before returning — the
    engine's offset log may durably reference this envelope in the next
    instant, and a power loss that ate a referenced envelope would turn
    recovery's readBetweenOffsets into a crash loop (or silent row
    loss)."""
    os.makedirs(directory, exist_ok=True)
    if seq is None:
        seq = next_seq(directory)
    path = spool_path(directory, seq, block_num)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(event_list_bytes)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic: readers never see partial envelopes
    dfd = os.open(directory, os.O_RDONLY)
    try:
        os.fsync(dfd)  # make the rename itself durable
    finally:
        os.close(dfd)
    return path


def _spooled_entries(directory: str) -> list[tuple[int, int]]:
    """Sorted (seq, block_num) pairs currently in the spool."""
    try:
        names = os.listdir(directory)
    except FileNotFoundError:
        return []
    return sorted(e for e in (_parse_name(n) for n in names) if e is not None)


def _envelope_rows(directory: str, seq: int, block_num: int) -> Iterator[tuple]:
    path = spool_path(directory, seq, block_num)
    if seq == block_num and not os.path.exists(path):
        path = os.path.join(directory, f"{block_num:020d}{ENVELOPE_EXT}")  # legacy name
    with open(path, "rb") as f:
        decoded = decode_message("EventList", f.read())
    for ord_, ev in enumerate(decoded["events"]):
        yield (
            ev["event_type"],
            [(a["key"], a["value"]) for a in ev["attributes"]],
            ev["data"],
            ord_,  # batch_ord: arrival ordinal within the delivery (A1)
            seq,  # delivery_id = SEQ: unique per delivery, monotone in
            # arrival order — two deliveries at one height (a fork +
            # replacement) stay distinguishable, which the SCD2 sink's
            # serial fork resolution requires
        )


class _SpoolStreamReader(SimpleDataSourceStreamReader):
    #: per-microbatch block cap: an unbounded read() after bridge downtime
    #: would decode and materialize the WHOLE backlog driver-side at once
    DEFAULT_MAX_BLOCKS = 256

    def __init__(self, options: dict) -> None:
        self.directory = options.get("path")
        if not self.directory:
            raise ValueError("sds_validator requires the 'path' option (spool directory)")
        self.start_block = int(options.get("start_block", -1))
        self.max_blocks = int(options.get("max_blocks_per_batch", self.DEFAULT_MAX_BLOCKS))

    def initialOffset(self) -> dict:
        # skip the contiguous STRICTLY-INCREASING prefix of history at or
        # below start_block (the S3 handshake). Both conditions matter: a
        # fork REPLACEMENT re-delivers a height <= the previous spooled
        # height, so its block is <= the store head that seeds start_block
        # — a height-only skip would silently drop a spooled-but-
        # unprocessed replacement on a fresh-checkpoint start and W4 fork
        # repair would never run. Stopping at the first non-increase is
        # conservative: an already-PROCESSED fork tail re-flows, and the
        # store's same-id re-delivery skip makes that overlap a no-op.
        last = -1
        prev = -1
        for seq, block in _spooled_entries(self.directory):
            if block <= self.start_block and block > prev:
                last = seq
                prev = block
            else:
                break
        return {"last_seq": last}

    @staticmethod
    def _cursor(offset: dict) -> int:
        # legacy checkpoints committed {"last_block": N} over block-keyed
        # files, whose seq == block_num — the cursors are interchangeable
        return offset.get("last_seq", offset.get("last_block", -1))

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        last = self._cursor(start)
        entries = [e for e in _spooled_entries(self.directory) if e[0] > last]
        entries = entries[: self.max_blocks]
        if not entries:
            return iter(()), start
        rows = [r for s, b in entries for r in _envelope_rows(self.directory, s, b)]
        return iter(rows), {"last_seq": entries[-1][0]}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        lo, hi = self._cursor(start), self._cursor(end)
        entries = [e for e in _spooled_entries(self.directory) if lo < e[0] <= hi]
        return iter(r for s, b in entries for r in _envelope_rows(self.directory, s, b))


class ValidatorSpoolDataSource(DataSource):
    """``spark.readStream.format("sds_validator").option("path", spool)``"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return STREAM_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> _SpoolStreamReader:
        return _SpoolStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ValidatorSpoolDataSource)
