"""SCD Type-2 sink: block-range versioned tables over partitioned Parquet.

Semantics (SURVEY §2.6 W1-W4; reference: database crate's
``execute_operations_in_block`` called at event_handler.rs:34-35, sentinel
``MAX_BLOCK_NUM`` imported at :9):

- every row lives in a half-open block interval
  ``[start_block_num, end_block_num)``; ``end_block_num = MAX_BLOCK_NUM``
  means "current";
- a new version of an entity at block *b* closes the previous open
  version(s) of the same **version key** to ``end_block_num = b``, then
  inserts the new row(s) (close-then-insert MERGE, W2);
- child tables version as whole groups with their parent entity: a new
  Organization emission replaces ALL of that org's accreditations /
  authorizations / contacts / address rows, even when the new emission has
  none (U3 re-emission) — so closes are driven by **entity emissions**, not
  by the child table's own new rows;
- an assertion DELETE closes the open version and inserts nothing
  (tombstone, W3 — event_handler.rs:185-191);
- fork/reorg repair (W4): rewind to block *b* = drop rows with
  ``start_block_num >= b``, re-open rows closed at ``>= b``, then replay.

Scale design: each table is stored as two Parquet areas —

- ``open/``   : the current versions (live-state sized), rewritten per batch;
- ``closed/`` : immutable closed versions, **append-only** per batch.

A batch therefore rewrites O(live state) and appends O(changed rows); the
full history is never rewritten (except by the rare fork rewind, which is
exactly Delta's RESTORE cost). On a real cluster the same plan maps 1:1 to a
Delta/Iceberg MERGE keyed on the version key + open-partition predicate.

The merge itself is one declarative plan (window ``lead`` over emission
order per key), no driver-side loops — a microbatch containing many blocks
applies in a single pass while preserving per-block sequencing
(event_handler.rs:56-58 applies operations in delivery order; we order by
(block_num, batch_ord, change_idx, entry_idx)).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from consensource_sds_spark import schemas
from consensource_sds_spark.schemas import MAX_BLOCK_NUM

#: entity group -> (version key column, member tables)
ENTITY_GROUPS: dict[str, tuple[str, list[str]]] = {
    "organization": (
        "organization_id",
        ["organizations", "accreditations", "authorizations", "contacts", "addresses"],
    ),
    "agent": ("public_key", ["agents"]),
    "certificate": ("certificate_id", ["certificates"]),
    "request": ("request_id", ["requests"]),
    "standard": ("standard_id", ["standards", "standard_versions"]),
    # assertions version by their state address: a DELETE tombstone carries
    # only the address (event_handler.rs:186-189), and a re-SET replaces the
    # state cell at that address.
    "assertion": ("address", ["assertions"]),
}

_ORDER = ["block_num", "batch_ord", "change_idx", "entry_idx"]
_EMISSION_COLS = ["vkey", *_ORDER, "is_delete"]


@dataclass
class PipelineBatch:
    """Everything one transformed microbatch wants to persist."""

    block: DataFrame | None = None  # schemas.BLOCKS_TABLE
    tables: dict[str, DataFrame] = field(default_factory=dict)  # new version rows
    emissions: dict[str, DataFrame] = field(default_factory=dict)  # per entity group
    quarantine: DataFrame | None = None  # W5 dead letters


def merge_scd2(open_rows: DataFrame, new_rows: DataFrame, vkey: str, emissions: DataFrame, table_schema) -> DataFrame:
    """Close-then-insert merge for one table (W2+W3), fully declarative.

    ``open_rows`` are the table's current versions (end == MAX);
    ``emissions`` rows: (vkey, block_num, batch_ord, change_idx, entry_idx,
    is_delete) — one per entity emission (SET) or tombstone (DELETE).

    Every new version's end = the next emission's block for the same key
    (``lead`` over emission order) or MAX; pre-existing open rows of touched
    keys close at the key's first emission block in the batch. Two emissions
    of one key at the same block yield a zero-width version [b, b) for the
    earlier one — exactly the reference's UPDATE-then-INSERT sequencing."""
    out_cols = [f.name for f in table_schema.fields]
    emis = emissions.select(
        F.col("vkey").alias("e_vkey"),
        F.col("block_num").alias("e_block"),
        F.col("batch_ord").alias("e_bo"),
        F.col("change_idx").alias("e_ci"),
        F.col("entry_idx").alias("e_ei"),
        "is_delete",
    )
    w = Window.partitionBy("e_vkey").orderBy("e_block", "e_bo", "e_ci", "e_ei")
    emis = emis.withColumn("next_start", F.lead("e_block").over(w))

    sets = emis.filter(~F.col("is_delete"))
    inserted = (
        new_rows.join(
            sets,
            (new_rows[vkey] == sets["e_vkey"])
            & (new_rows["start_block_num"] == sets["e_block"])
            & (new_rows["batch_ord"] == sets["e_bo"])
            & (new_rows["change_idx"] == sets["e_ci"])
            & (new_rows["entry_idx"] == sets["e_ei"]),
            "left",
        )
        .withColumn("new_end", F.coalesce(F.col("next_start"), F.lit(MAX_BLOCK_NUM)))
        .select(*[new_rows[c] for c in out_cols if c != "end_block_num"], F.col("new_end").alias("end_block_num"))
        .select(*out_cols)
    )

    first = emissions.groupBy("vkey").agg(F.min("block_num").alias("first_block"))
    closed = (
        open_rows.join(F.broadcast(first), open_rows[vkey] == first["vkey"], "left")
        .withColumn(
            "end_block_num",
            F.coalesce(F.col("first_block"), F.col("end_block_num")),
        )
        .select(*out_cols)
    )
    return closed.unionByName(inserted)


class ScdParquetStore:
    """The reporting-database stand-in: 11 SCD2 tables + blocks, on Parquet.

    ``foreachBatch`` idempotence: ``apply(..., batch_id=)`` no-ops when the
    batch id was already applied (recorded in a marker file), the Spark
    equivalent of the reference's transactional per-block apply + catch-up
    cursor (main.rs:57-63)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _open(self, table: str) -> str:
        return os.path.join(self.path, table, "open")

    def _closed(self, table: str) -> str:
        return os.path.join(self.path, table, "closed")

    def _blocks_path(self) -> str:
        return os.path.join(self.path, "blocks")

    def _marker(self) -> str:
        return os.path.join(self.path, "_last_batch_id")

    # -- reads ------------------------------------------------------------
    def _read_dir(self, path: str, schema) -> DataFrame:
        if os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path)):
            return self.spark.read.schema(schema).parquet(path)
        return self.spark.createDataFrame([], schema)

    def read(self, table: str) -> DataFrame:
        schema = schemas.SINK_TABLES[table][0]
        return self._read_dir(self._open(table), schema).unionByName(
            self._read_dir(self._closed(table), schema)
        )

    def current(self, table: str) -> DataFrame:
        """Current state = the open partition (end == MAX by construction)."""
        return self._read_dir(self._open(table), schemas.SINK_TABLES[table][0])

    def as_of(self, table: str, block_num: int) -> DataFrame:
        """Time travel: state as of block b (start <= b < end)."""
        return self.read(table).filter(
            (F.col("start_block_num") <= block_num) & (F.lit(block_num) < F.col("end_block_num"))
        )

    def blocks(self) -> DataFrame:
        return self._read_dir(self._blocks_path(), schemas.BLOCKS_TABLE)

    def known_block_ids(self, count: int | None = None) -> list[str]:
        """Catch-up cursor (S3, main.rs:57-63): block ids, newest first."""
        rows = self.blocks().orderBy(F.col("block_num").desc()).collect()
        ids = [r["block_id"] for r in rows]
        return ids[:count] if count else ids

    # -- writes -----------------------------------------------------------
    def _swap_in(self, path: str, df: DataFrame):
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        old = path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    def last_applied_batch(self) -> int:
        try:
            with open(self._marker()) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return -1

    def apply(self, batch: PipelineBatch, batch_id: int | None = None) -> None:
        if batch_id is not None and batch_id <= self.last_applied_batch():
            return  # replayed microbatch after restart — already committed
        blocks_new = batch.block.collect() if batch.block is not None else []
        if blocks_new:
            known = {r["block_num"]: r["block_id"] for r in self.blocks().collect()}
            for r in sorted(blocks_new, key=lambda r: r["block_num"]):
                if r["block_num"] in known and known[r["block_num"]] != r["block_id"]:
                    # fork detected (W4): rewind to the divergent block
                    self.rewind(r["block_num"])
                    known = {k: v for k, v in known.items() if k < r["block_num"]}

        for group, (vkey, tables) in ENTITY_GROUPS.items():
            emis = batch.emissions.get(group)
            if emis is None:
                continue
            emis = emis.cache()
            if emis.isEmpty():
                emis.unpersist()
                continue
            for table in tables:
                schema = schemas.SINK_TABLES[table][0]
                new_rows = batch.tables.get(table)
                if new_rows is None:
                    new_rows = self.spark.createDataFrame([], schema)
                # only the open partition participates; closed history is
                # immutable and never rescanned during apply
                merged = merge_scd2(self.current(table), new_rows, vkey, emis, schema).cache()
                merged.count()  # materialize before overwriting the source files
                self._swap_in(self._open(table), merged.filter(F.col("end_block_num") == MAX_BLOCK_NUM))
                merged.filter(F.col("end_block_num") != MAX_BLOCK_NUM).write.mode("append").parquet(
                    self._closed(table)
                )
                merged.unpersist()
            emis.unpersist()

        if blocks_new:
            prev = self.blocks()
            merged_blocks = prev.unionByName(
                self.spark.createDataFrame(blocks_new, schemas.BLOCKS_TABLE)
            ).dropDuplicates(["block_num"])
            merged_blocks = merged_blocks.cache()
            merged_blocks.count()
            self._swap_in(self._blocks_path(), merged_blocks)
            merged_blocks.unpersist()
        if batch_id is not None:
            with open(self._marker(), "w") as f:
                f.write(str(batch_id))

    def rewind(self, block_num: int) -> None:
        """W4 fork repair: drop versions born at >= block_num, re-open
        versions closed at >= block_num, forget blocks >= block_num."""
        for table in schemas.SINK_TABLES:
            df = self.read(table).filter(F.col("start_block_num") < block_num).cache()
            df.count()
            reopened = df.withColumn(
                "end_block_num",
                F.when(F.col("end_block_num") >= block_num, F.lit(MAX_BLOCK_NUM)).otherwise(
                    F.col("end_block_num")
                ),
            ).cache()
            reopened.count()
            self._swap_in(self._open(table), reopened.filter(F.col("end_block_num") == MAX_BLOCK_NUM))
            self._swap_in(self._closed(table), reopened.filter(F.col("end_block_num") != MAX_BLOCK_NUM))
            df.unpersist()
            reopened.unpersist()
        kept = self.blocks().filter(F.col("block_num") < block_num).cache()
        kept.count()
        self._swap_in(self._blocks_path(), kept)
        kept.unpersist()
