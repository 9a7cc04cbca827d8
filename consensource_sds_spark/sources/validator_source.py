"""Custom Structured Streaming source for validator event deliveries (S1).

The reference's event source is a ZMQ DEALER socket polled in a loop
(subscriber.rs:33-42, 58-106). The idiomatic Spark 4 equivalent is a
Python DataSource: this module implements one whose offsets ARE block
numbers, so the catch-up cursor (S3), replayable recovery, and
exactly-once batch semantics come from the engine's offset log instead of
hand-rolled state:

- the transport is a spool directory of ``<block_num>.evl`` files, each
  one encoded ``EventList`` envelope exactly as delivered on the wire
  (the package codec's bytes; a ZMQ bridge would write the same files);
- ``initialOffset`` honors a ``start_block`` option — the
  ``ScdParquetStore.known_block_ids`` handshake (S3) feeds it, so a
  restarted pipeline resumes where the store left off rather than
  re-reading history;
- ``read(start)`` returns all spooled blocks above the cursor and advances
  it; ``readBetweenOffsets`` replays a committed range deterministically
  (crash recovery re-reads the same envelopes — the spool is the WAL);
- rows are the package's EVENT envelope schema + ``delivery_id`` (=
  block_num), identical to ``fixtures.events_df``, so the whole
  transform/SCD2 pipeline runs on the stream unchanged.

Driver-side reads (SimpleDataSourceStreamReader) are correct here: the
source hands over envelope *references* per microbatch (one block's events
are KBs); the heavy decode/fan-out runs distributed in the DataFrame plan.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import LongType, StructField, StructType

from consensource_sds_spark import schemas
from consensource_sds_spark.codec import decode_message

FORMAT_NAME = "sds_validator"
ENVELOPE_EXT = ".evl"

#: EVENT envelope + delivery_id, the shape fixtures.events_df produces
STREAM_SCHEMA = StructType(
    schemas.EVENT.fields + [StructField("delivery_id", LongType(), False)]
)


def spool_path(directory: str, block_num: int) -> str:
    return os.path.join(directory, f"{block_num:020d}{ENVELOPE_EXT}")


def write_envelope(directory: str, block_num: int, event_list_bytes: bytes) -> str:
    """Bridge-side helper: append one delivery to the spool (what the ZMQ
    poll loop would do per received EventList)."""
    os.makedirs(directory, exist_ok=True)
    path = spool_path(directory, block_num)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(event_list_bytes)
    os.replace(tmp, path)  # atomic: readers never see partial envelopes
    return path


def _spooled_blocks(directory: str) -> list[int]:
    try:
        names = os.listdir(directory)
    except FileNotFoundError:
        return []
    return sorted(
        int(n[: -len(ENVELOPE_EXT)]) for n in names if n.endswith(ENVELOPE_EXT)
    )


def _envelope_rows(directory: str, block_num: int) -> Iterator[tuple]:
    with open(spool_path(directory, block_num), "rb") as f:
        decoded = decode_message("EventList", f.read())
    for ord_, ev in enumerate(decoded["events"]):
        yield (
            ev["event_type"],
            [(a["key"], a["value"]) for a in ev["attributes"]],
            ev["data"],
            ord_,  # batch_ord: arrival ordinal within the delivery (A1)
            block_num,
        )


class _SpoolStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.directory = options.get("path")
        if not self.directory:
            raise ValueError("sds_validator requires the 'path' option (spool directory)")
        self.start_block = int(options.get("start_block", -1))

    def initialOffset(self) -> dict:
        return {"last_block": self.start_block}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        last = start["last_block"]
        blocks = [b for b in _spooled_blocks(self.directory) if b > last]
        if not blocks:
            return iter(()), start
        rows = [r for b in blocks for r in _envelope_rows(self.directory, b)]
        return iter(rows), {"last_block": blocks[-1]}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        lo, hi = start["last_block"], end["last_block"]
        blocks = [b for b in _spooled_blocks(self.directory) if lo < b <= hi]
        return iter(r for b in blocks for r in _envelope_rows(self.directory, b))


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
