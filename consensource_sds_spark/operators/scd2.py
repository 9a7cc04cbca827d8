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

Storage/commit design — a miniature table-format log (the same shape as a
Delta/Iceberg transaction log, which is what a real cluster deployment
would use via MERGE):

- each table's OPEN partition (current versions) is hash-bucketed by the
  table's version key: bucket ``pmod(hash(vkey), n_buckets)`` -> its own
  immutable leaf directory. A batch computes the set of buckets its
  emission keys touch, merges ONLY those buckets' open rows, and writes
  the result to NEW per-bucket directories; untouched buckets' manifest
  pointers carry over byte-for-byte. Closed-version increments land in a
  per-batch closed segment (``_bucket=-1``, liveness split ``_open``);
- ``_manifest.json`` maps each table to its open bucket directories + the
  list of closed segments, plus the blocks segments and the last applied
  ``foreachBatch`` batch id. A batch COMMITS by atomically replacing the
  manifest (single ``os.replace``) — all 11 tables + blocks + the batch-id
  marker flip together, which is the reference's per-block Postgres
  transaction (W1). A crash mid-apply leaves the old manifest pointing at
  the old directories; replay re-runs the whole batch onto fresh
  directories and commits once. Nothing is ever mutated in place and
  source directories are only vacuumed AFTER a successful commit, so the
  durable parquet write itself is the materialization barrier (no
  cache()+count(), no recompute-after-swap hazard);
- a batch therefore rewrites O(touched buckets) and appends O(changed
  rows) — the Delta-MERGE "rewrite only touched files" cost, NOT O(live
  state): at 100 TB live state with n_buckets sized so a bucket is a few
  GB, a one-key microbatch rewrites a few GB, not the table. Closed
  history is never rewritten except by fork rewind (exactly Delta's
  RESTORE cost).

The merge itself is one declarative plan (window ``lead`` over emission
order per key), no driver-side loops — a microbatch containing many blocks
applies in a single pass while preserving per-block sequencing
(event_handler.rs:56-58 applies operations in delivery order; we order by
(block_num, batch_ord, change_idx, entry_idx)). Fork detection is a
predicate-pushdown lookup of ONLY the incoming block numbers against the
stored blocks table — O(microbatch), never an O(chain) driver collect.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from consensource_sds_spark import schemas
from consensource_sds_spark.functions.checkpoints import free_local_checkpoint
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
#: full emission order key within a block: delivery arrival first —
#: (batch_ord, change_idx, entry_idx) are PER-DELIVERY ordinals and can
#: collide across two deliveries at one height (an intra-batch fork)
#: order columns a new-rows DataFrame must carry for the insert join
#: (delivery_id is normalized to NULL by merge_scd2 when absent)
_NEW_ROW_ORDER = ["delivery_id", "batch_ord", "change_idx", "entry_idx"]


class ConcurrentWriteError(RuntimeError):
    """Another writer committed a newer generation between this writer's
    manifest read and its commit (optimistic-concurrency conflict)."""


class UnsupportedStoreLayout(RuntimeError):
    """A store on disk uses a manifest layout this build cannot read.

    Raised instead of silently treating the open partition as empty: a
    mis-read manifest would make the next ``apply`` merge against empty
    open state and its commit's vacuum would delete the still-referenced
    legacy directories — silent data loss. Failing loudly preserves the
    store for a manual migration."""


class CorruptManifestError(RuntimeError):
    """The manifest file exists but cannot be parsed. Same loud-failure
    rationale as :class:`UnsupportedStoreLayout`: reading it as an empty
    store would let the next commit's vacuum delete every committed
    generation."""


def _stage_token() -> str:
    """Per-writer salt for staged generation directories. Two writers that
    both base on generation g stage into DIFFERENT ``...-g{g+1}-{tok}``
    paths, so the optimistic-concurrency loser's mode('overwrite') writes
    can never delete or replace directories the winner's committed
    manifest references — the flock'd expected_gen check then fails the
    loser loudly and its orphaned salted directories are reclaimed by the
    winner's next vacuum (they are referenced by no manifest)."""
    return uuid.uuid4().hex[:8]


def _microbatch_hint(df: DataFrame) -> DataFrame:
    """Broadcast hint for microbatch-bounded frames, latency profile only.

    The emission-order lookup a merge joins against is O(microbatch), but a
    backfill batch can be arbitrarily large, so the cluster profile leaves
    the build-side choice to the planner/AQE (checkpointed frames have
    unknown stats, which would otherwise force a shuffle join even for a
    kilobyte-sized emission set)."""
    return F.broadcast(df) if os.environ.get("SPARK_GRAFT_PROFILE", "local") == "local" else df


@dataclass
class PipelineBatch:
    """Everything one transformed microbatch wants to persist."""

    block: DataFrame | None = None  # schemas.BLOCKS_TABLE
    tables: dict[str, DataFrame] = field(default_factory=dict)  # new version rows
    emissions: dict[str, DataFrame] = field(default_factory=dict)  # per entity group
    quarantine: DataFrame | None = None  # W5 dead letters
    #: True when the producer already pinned the decode pipeline in memory
    #: (transform_events(materialize=True) checkpoints the decoded entries),
    #: so every frame above is a narrow projection over in-memory state and
    #: the sink can skip its own defensive materialization of the emissions.
    materialized: bool = False
    #: per-group touched open-bucket ids, observed during the producer's
    #: checkpoint waves (transform_events(n_buckets=...)) so apply() can
    #: skip its bucket-distinct job; buckets_n records the bucket count the
    #: producer assumed — a sink with a different count recomputes.
    touched_buckets: dict[str, list[int]] | None = None
    buckets_n: int | None = None


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
    # delivery_id is part of the order key (per-delivery ordinals collide
    # across two deliveries at one height) but optional on the public
    # surface — normalize to NULL and join null-safely so hand-built
    # frames without it keep their old semantics
    if "delivery_id" not in emissions.columns:
        emissions = emissions.withColumn("delivery_id", F.lit(None).cast("long"))
    if "delivery_id" not in new_rows.columns:
        new_rows = new_rows.withColumn("delivery_id", F.lit(None).cast("long"))
    emis = emissions.select(
        F.col("vkey").alias("e_vkey"),
        F.col("block_num").alias("e_block"),
        F.col("delivery_id").alias("e_did"),
        F.col("batch_ord").alias("e_bo"),
        F.col("change_idx").alias("e_ci"),
        F.col("entry_idx").alias("e_ei"),
        "is_delete",
    )
    w = Window.partitionBy("e_vkey").orderBy("e_block", "e_did", "e_bo", "e_ci", "e_ei")
    emis = emis.withColumn("next_start", F.lead("e_block").over(w))

    sets = _microbatch_hint(emis.filter(~F.col("is_delete")))
    inserted = (
        new_rows.join(
            sets,
            (new_rows[vkey] == sets["e_vkey"])
            & (new_rows["start_block_num"] == sets["e_block"])
            & new_rows["delivery_id"].eqNullSafe(sets["e_did"])
            & (new_rows["batch_ord"] == sets["e_bo"])
            & (new_rows["change_idx"] == sets["e_ci"])
            & (new_rows["entry_idx"] == sets["e_ei"]),
            # INNER: a new version row exists exactly because its SET
            # emission does (both are projections of the same entry). A
            # left join would still insert rows whose emission was rewound
            # out of the batch (a superseded fork delivery) — resurrecting
            # the losing chain's state as open versions.
            "inner",
        )
        .withColumn("new_end", F.coalesce(F.col("next_start"), F.lit(MAX_BLOCK_NUM)))
        .select(*[new_rows[c] for c in out_cols if c != "end_block_num"], F.col("new_end").alias("end_block_num"))
        .select(*out_cols)
    )

    first = emissions.groupBy("vkey").agg(F.min("block_num").alias("first_block"))
    closed = (
        # _microbatch_hint, not a bare broadcast: `first` is one row per
        # touched key, which a backfill batch can grow arbitrarily — the
        # cluster profile must leave the build side to AQE like `sets`
        open_rows.join(_microbatch_hint(first), open_rows[vkey] == first["vkey"], "left")
        .withColumn(
            "end_block_num",
            F.coalesce(F.col("first_block"), F.col("end_block_num")),
        )
        .select(*out_cols)
    )
    return closed.unionByName(inserted)


def _empty_new_rows(spark: SparkSession, schema: StructType) -> DataFrame:
    """Schema for a group member table with no new rows in this batch: the
    sink columns PLUS the emission-order columns the insert join references
    (a partial PipelineBatch is a legal public ``apply`` input)."""
    fields = list(schema.fields) + [
        StructField(c, LongType(), True) for c in _NEW_ROW_ORDER if c not in schema.fieldNames()
    ]
    return spark.createDataFrame([], StructType(fields))


class ScdParquetStore:
    """The reporting-database stand-in: 11 SCD2 tables + blocks, on Parquet,
    committed through an atomic manifest (see module docstring).

    ``foreachBatch`` idempotence: ``apply(..., batch_id=)`` no-ops when the
    batch id was already committed — the manifest IS the marker, so a batch
    is either fully visible or not at all (the Spark equivalent of the
    reference's transactional per-block apply + catch-up cursor,
    main.rs:57-63)."""

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 16):
        self.spark = spark
        self.path = path
        # Bucket count for the open partitions. Persisted into the manifest
        # on first commit and read back thereafter — the on-disk layout owns
        # the number, not the constructor (a store reopened with a different
        # default keeps its original bucketing). local[32]-test default 16;
        # size so one bucket ~ a few GB at the deployment's live-state scale.
        self._default_n_buckets = n_buckets
        os.makedirs(path, exist_ok=True)

    # -- manifest ---------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_manifest.json")

    def _manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                man = json.load(f)
        except FileNotFoundError:
            # ONLY a missing file means "fresh store". Any other failure —
            # EMFILE, permissions, a truncated/corrupt file — must fail
            # loudly: returning the empty manifest here would make the next
            # commit's vacuum treat every committed generation as
            # unreferenced and DELETE it (total silent data loss). The
            # commit path fsyncs write-then-rename, so a crashed commit
            # leaves the previous manifest intact, never a corrupt one.
            return {"gen": 0, "last_batch_id": -1, "tables": {}, "blocks": []}
        except ValueError as e:
            raise CorruptManifestError(
                f"manifest at {self._manifest_path()!r} is unreadable: {e}. "
                "Refusing to treat a populated store as empty (a commit on "
                "top of that would vacuum away every committed generation). "
                "Restore the manifest or rebuild the store by replaying the "
                "stream."
            ) from e
        # layout version guard: the pre-bucketing format kept one 'open' dir
        # per table. Reading it as empty open_buckets would silently lose it
        # (see UnsupportedStoreLayout) — refuse instead.
        legacy = sorted(t for t, tman in man.get("tables", {}).items() if "open" in tman)
        if legacy:
            raise UnsupportedStoreLayout(
                f"store at {self.path!r} uses the pre-bucketing manifest layout "
                f"(tables {legacy} carry an 'open' pointer, this build reads "
                "'open_buckets'). Rebuild the store by replaying the stream, or "
                "migrate: read each table's open dir with the writing build and "
                "re-apply it here."
            )
        return man

    def _n_buckets(self) -> int:
        return self._manifest().get("n_buckets") or self._default_n_buckets

    @staticmethod
    def _bucket_expr(vkey: str, n: int):
        # Murmur3 (F.hash) is a fixed, documented algorithm — the mapping is
        # part of the on-disk layout and must be reproducible across sessions.
        return F.pmod(F.hash(F.col(vkey)), F.lit(n))

    @staticmethod
    def _referenced(manifest: dict) -> set[str]:
        # Truncate refs at the write root ("/_open="): a generation directory
        # stays alive while ANY of its bucket leaves is still referenced by
        # the current manifest (untouched buckets outlive their writing gen).
        referenced: set[str] = set()
        for t in manifest["tables"].values():
            for p in [*t.get("open_buckets", {}).values(), *t.get("closed", [])]:
                if p:
                    referenced.add(p.split("/_open=")[0])
        referenced.update(manifest["blocks"])
        return referenced

    def _commit(self, manifest: dict, expected_gen: int | None = None) -> None:
        """The transaction boundary: write-then-rename is atomic on POSIX;
        everything the manifest references was durably written before this
        point, so a crash on either side of the rename leaves a consistent
        store.

        Optimistic concurrency (the Delta commit-conflict check): with
        ``expected_gen``, the swap only proceeds if the on-disk manifest
        still carries that generation — a concurrent writer that committed
        first raises :class:`ConcurrentWriteError` instead of being
        silently overwritten (lost update). The check+swap runs under an
        flock on a sidecar lock file, which serializes same-host writers;
        the intended deployment is one writer per checkpoint (streaming),
        so the guard exists to turn operator error into a loud failure,
        not to enable multi-writer throughput. Staged generation
        directories are salted per writer (:func:`_stage_token`), so two
        writers basing on the same generation never share staging paths —
        the loser cannot clobber directories the winner's committed
        manifest references, its own orphaned directories are referenced
        by no manifest, and the winner's next vacuum reclaims them.

        Vacuum is deferred by ONE generation (a minimal Delta-style
        retention window): directories superseded by THIS commit are
        recorded in ``retired`` and stay on disk until the NEXT commit, so
        lazy DataFrames handed out under the previous manifest remain
        scannable across one apply/compact/rewind. Never-committed staging
        leftovers (a crashed attempt's directories, referenced by no
        manifest) are reclaimed immediately."""
        import fcntl

        with open(os.path.join(self.path, "_manifest.lock"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            prev = self._manifest()
            if expected_gen is not None and prev["gen"] != expected_gen:
                raise ConcurrentWriteError(
                    f"store at {self.path!r} advanced to generation {prev['gen']} "
                    f"while this writer built on generation {expected_gen}; "
                    "re-read and re-apply (one writer per store is the intended "
                    "deployment)"
                )
            prev_refs = self._referenced(prev)
            new_refs = self._referenced(manifest)
            manifest["retired"] = sorted(prev_refs - new_refs)
            tmp = self._manifest_path() + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f)
                # rename atomicity is not durability: without the fsync a
                # power loss after os.replace can surface a TRUNCATED
                # manifest (data still in page cache when the rename
                # metadata committed) — which _manifest() refuses loudly,
                # wedging the store until manual repair
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._manifest_path())
            dfd = os.open(self.path, os.O_RDONLY)
            try:
                os.fsync(dfd)  # make the rename itself durable
            finally:
                os.close(dfd)
            # vacuum INSIDE the lock: deferred past the release, a stalled
            # writer's vacuum would run with a stale keep set and could
            # rmtree directories a faster writer committed in the meantime
            # — deleting COMMITTED data despite the OCC gen check
            self._vacuum(manifest)

    def _vacuum(self, manifest: dict) -> None:
        keep = self._referenced(manifest) | set(manifest.get("retired", []))
        for table in [*schemas.SINK_TABLES, "blocks"]:
            base = os.path.join(self.path, table)
            if not os.path.isdir(base):
                continue
            for d in os.listdir(base):
                rel = f"{table}/{d}"
                if rel not in keep:
                    shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    # -- reads ------------------------------------------------------------
    def quarantine(self) -> DataFrame | None:
        """The persisted W5 dead-letter lane (every ``batch.quarantine``
        frame apply() ever received, partitioned by (_app, _batch_id)), or
        None before any batch carried one."""
        p = os.path.join(self.path, "quarantine")
        if not os.path.isdir(p):
            return None
        return self.spark.read.parquet(p)

    def _read_dirs(self, rel_paths: list[str], schema) -> DataFrame:
        paths = [os.path.join(self.path, p) for p in rel_paths if p]
        missing = [p for p in paths if not os.path.isdir(p)]
        if missing:
            # a manifest-referenced directory that is gone (manual delete,
            # partial restore) is store corruption: silently skipping it
            # would return partial data, and the NEXT apply() would merge
            # against the truncated open state and commit the loss
            # permanently (r9 review) — the manifest doctrine is loud
            # failure, same as CorruptManifestError on an unreadable file
            raise CorruptManifestError(
                f"manifest references missing director{'ies' if len(missing) > 1 else 'y'} "
                f"{missing[:3]!r} — the store is inconsistent (partial restore "
                "or out-of-band deletion); restore the directories or rebuild "
                "the store from the stream"
            )
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*paths)

    def read(self, table: str) -> DataFrame:
        t = self._manifest()["tables"].get(table, {})
        dirs = [*t.get("open_buckets", {}).values(), *t.get("closed", [])]
        return self._read_dirs(dirs, schemas.SINK_TABLES[table])

    def current(
        self, table: str, buckets: list[int] | None = None, _man: dict | None = None
    ) -> DataFrame:
        """Current state = the open partition (end == MAX by construction).
        ``buckets`` restricts the scan to those hash buckets — the bucketed
        analog of partition pruning; ``apply`` uses it to read only the
        buckets a batch's keys land in (and passes its already-loaded
        manifest as ``_man`` so an 11-table batch doesn't re-open and
        re-parse the manifest once per member table)."""
        ob = (_man if _man is not None else self._manifest())["tables"].get(table, {}).get(
            "open_buckets", {}
        )
        if buckets is None:
            dirs = list(ob.values())
        else:
            dirs = [ob[str(b)] for b in buckets if str(b) in ob]
        return self._read_dirs(dirs, schemas.SINK_TABLES[table])

    def as_of(self, table: str, block_num: int) -> DataFrame:
        """Time travel: state as of block b (start <= b < end)."""
        return self.read(table).filter(
            (F.col("start_block_num") <= block_num) & (F.lit(block_num) < F.col("end_block_num"))
        )

    def blocks(self) -> DataFrame:
        # segments are disjoint on block_num by construction: a conflicting
        # re-delivery triggers rewind (which consolidates) before append
        return self._read_dirs(self._manifest()["blocks"], schemas.BLOCKS_TABLE)

    def known_block_ids(self, count: int | None = None) -> list[str]:
        """Catch-up cursor (S3, main.rs:57-63): block ids, newest first.
        ``count`` is pushed into the plan (top-k, not a full collect)."""
        df = self.blocks().orderBy(F.col("block_num").desc())
        if count is not None:  # falsy 0 must mean "none", not "all"
            df = df.limit(count)
        return [r["block_id"] for r in df.collect()]

    def last_applied_batch(self) -> int:
        return self._manifest()["last_batch_id"]

    def describe(self) -> list[dict]:
        """Per-table storage profile from parquet FOOTERS only (no Spark
        job, no data scan — the ops dashboard / maintenance-cadence input):
        open/closed row counts, file counts and bytes, plus bucket and
        segment counts. ``n_closed_segments`` is the compaction signal
        (one per batch that closed versions until ``compact()`` folds
        them); a hot ``n_open_rows``/``n_open_files`` skew points at
        bucket-count sizing."""
        import pyarrow.parquet as pq

        man = self._manifest()

        def _profile(rel_paths: list[str]) -> tuple[int, int, int]:
            rows = files = nbytes = 0
            for rel in rel_paths:
                d = os.path.join(self.path, rel)
                if not rel or not os.path.isdir(d):
                    continue
                for root, _dirs, names in os.walk(d):
                    for nm in names:
                        if not nm.endswith(".parquet"):
                            continue
                        p = os.path.join(root, nm)
                        rows += pq.ParquetFile(p).metadata.num_rows
                        files += 1
                        nbytes += os.path.getsize(p)
            return rows, files, nbytes

        out = []
        for table, tman in sorted(man["tables"].items()):
            open_rows, open_files, open_bytes = _profile(list(tman.get("open_buckets", {}).values()))
            cl_rows, cl_files, cl_bytes = _profile(tman.get("closed", []))
            out.append(
                {
                    "table": table,
                    "n_open_rows": open_rows,
                    "n_open_buckets": len(tman.get("open_buckets", {})),
                    "n_open_files": open_files,
                    "n_closed_rows": cl_rows,
                    "n_closed_segments": len([c for c in tman.get("closed", []) if c]),
                    "n_closed_files": cl_files,
                    "bytes": open_bytes + cl_bytes,
                }
            )
        return out

    def _stored_block_ids(self, manifest: dict, lo: int, hi: int) -> dict[int, str]:
        """Fork-detection lookup: block_num -> block_id for stored blocks in
        ``[lo, hi]``. Driver-side pyarrow over the manifest's block segments
        with a range filter (row-group pruning) — the segments are kilobytes
        per batch and the filter window is microbatch-sized, so this stays
        O(microbatch) without paying a Spark job round trip per apply."""
        import pyarrow.parquet as pq

        out: dict[int, str] = {}
        for rel in manifest["blocks"]:
            d = os.path.join(self.path, rel)
            if not os.path.isdir(d):
                continue
            t = pq.read_table(
                d, filters=[("block_num", ">=", lo), ("block_num", "<=", hi)]
            )
            for num, bid in zip(t["block_num"].to_pylist(), t["block_id"].to_pylist()):
                out[num] = bid
        return out

    # -- writes -----------------------------------------------------------
    def _write_split(self, df: DataFrame, rel: str, vkey: str, n: int) -> tuple[dict[str, str], str | None]:
        """Write a merged table state partitioned by (liveness, open-row
        hash bucket); returns ``(open_buckets, closed)`` relative LEAF paths
        that actually materialized (closed rows carry sentinel bucket -1 so
        every manifest ref is a leaf directory — no partition discovery on
        read). The write is the durability barrier — nothing existing is
        touched."""
        out = os.path.join(self.path, rel)
        # mode=overwrite ONLY ever replaces leftover staging from a crashed
        # attempt at this same generation — committed manifests never share
        # a generation number, so committed data is never overwritten
        staged = df.withColumn("_open", F.col("end_block_num") == MAX_BLOCK_NUM).withColumn(
            "_bucket",
            F.when(F.col("end_block_num") == MAX_BLOCK_NUM, self._bucket_expr(vkey, n)).otherwise(
                F.lit(-1)
            ),
        )
        # cluster output rows to their target directory before the dynamic-
        # partition write: one writer task per bucket instead of every task
        # opening a file in every directory (shuffle.partitions x buckets
        # small files per generation — the streaming small-files problem at
        # the source). A bucket is sized to a few GB at deployment scale, so
        # one task per bucket is the intended write granularity.
        staged = staged.repartition(n + 1, "_open", "_bucket")
        staged.write.mode("overwrite").partitionBy("_open", "_bucket").parquet(out)
        open_buckets: dict[str, str] = {}
        for b in range(n):
            leaf = f"{rel}/_open=true/_bucket={b}"
            if os.path.isdir(os.path.join(self.path, leaf)):
                open_buckets[str(b)] = leaf
        closed_rel = f"{rel}/_open=false/_bucket=-1"
        return (
            open_buckets,
            closed_rel if os.path.isdir(os.path.join(self.path, closed_rel)) else None,
        )

    def apply(
        self, batch: PipelineBatch, batch_id: int | None = None, txn_app_id: str | None = None
    ) -> None:
        man = self._manifest()
        # Replay idempotency, the Delta txnAppId/txnVersion pattern: batch
        # ids are monotonic only WITHIN one stream identity (the engine's
        # persistent query id, stable across restarts of one checkpoint).
        # Keyed per app id, a REBUILT checkpoint (new query id, batch ids
        # restart at 0) is correctly treated as a new stream rather than a
        # replay; bare batch_id callers keep the legacy global guard.
        if batch_id is not None:
            last = (
                man.setdefault("txn", {}).get(txn_app_id, -1)
                if txn_app_id is not None
                else man["last_batch_id"]
            )
            if batch_id <= last:
                return  # replayed microbatch after restart — already committed

        if batch.quarantine is not None:
            # W5: dead letters are data to audit, never rows to drop — the
            # transform routes them here "instead of an inner join silently
            # discarding them", so the sink must actually LAND them.
            # Idempotent by layout: each (app, batch) owns its partition
            # and a replayed batch overwrites its own output.
            q_app = txn_app_id or "global"
            q_bid = batch_id if batch_id is not None else man["gen"] + 1
            (
                batch.quarantine.withColumn("_app", F.lit(q_app))
                .withColumn("_batch_id", F.lit(q_bid).cast("long"))
                .write.mode("overwrite")
                .partitionBy("_app", "_batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(os.path.join(self.path, "quarantine"))
            )

        from concurrent.futures import ThreadPoolExecutor

        n = man.get("n_buckets") or self._default_n_buckets
        # ONE emission wave for the whole batch. The previous shape ran a
        # localCheckpoint + isEmpty + bucket-distinct PER entity group — ~3
        # serial driver round trips x groups before any write started. Now:
        # union every group's emissions under a discriminator column,
        # materialize ONCE, and answer group presence AND touched buckets
        # with a single distinct collect (groups with no rows simply don't
        # appear). The block-row collect (driver-tiny) is submitted from a
        # second thread so its job overlaps the checkpoint wave instead of
        # serializing in front of it.
        def _emis_frame(g: str) -> DataFrame:
            e = batch.emissions[g]
            # delivery_id is optional on the public apply surface (hand-
            # built batches) — normalize to a NULL column so the union
            # schema is stable and the fork resolution can test for it
            did = (
                F.col("delivery_id").cast("long")
                if "delivery_id" in e.columns
                else F.lit(None).cast("long")
            )
            return e.select(*_EMISSION_COLS, did.alias("delivery_id")).withColumn(
                "_grp", F.lit(g)
            )

        tagged = [_emis_frame(g) for g in ENTITY_GROUPS if g in batch.emissions]
        unioned: DataFrame | None = None
        if tagged:
            unioned = tagged[0]
            for t in tagged[1:]:
                unioned = unioned.unionByName(t)

        with ThreadPoolExecutor(max_workers=2) as prefetch:
            blocks_fut = prefetch.submit(batch.block.collect) if batch.block is not None else None
            if unioned is not None and not batch.materialized:
                # defensive materialization for plan-only batches: without it
                # the bucket distinct and every member table's merge would
                # race to re-run the full upstream decode
                unioned = unioned.localCheckpoint()
                batch_ckpt = unioned
            else:
                batch_ckpt = None
            blocks_new = blocks_fut.result() if blocks_fut is not None else []

        dedupe_idless = False
        if blocks_new:
            # -- intra-batch resolution first (serial-delivery semantics:
            # the reference applies deliveries one at a time). Processing
            # in ARRIVAL order (delivery_id, which transform_events passes
            # through on both the block frame and the emissions): a
            # same-height SAME-id re-delivery is a duplicate and is
            # dropped; a same-height DIFFERENT-id delivery is a fork that
            # supersedes every already-accepted delivery at or above that
            # height (the in-batch scope of rewind) — and the superseded
            # deliveries' EMISSIONS are rewound out by their delivery_id.
            has_did = all(
                "delivery_id" in getattr(r, "__fields__", ()) and r["delivery_id"] is not None
                for r in blocks_new
            )
            rows = sorted(blocks_new, key=lambda r: r["delivery_id"]) if has_did else list(blocks_new)
            surviving: dict[int, object] = {}
            in_batch_dropped: list = []
            for r in rows:
                h = r["block_num"]
                cur = surviving.get(h)
                if cur is not None and cur["block_id"] == r["block_id"]:
                    in_batch_dropped.append(r)  # duplicate re-delivery
                    continue
                if has_did:
                    # serial-delivery semantics: a (non-duplicate) delivery
                    # at height h supersedes EVERY already-accepted delivery
                    # at or above h — including accepted HIGHER heights with
                    # no same-height conflict (the validator replaying from
                    # a lower common ancestor implies the chain above it is
                    # abandoned; keeping an earlier in-batch block 6 after a
                    # fork delivery at 5 would mix two chains, r9 review)
                    for hh in [x for x in list(surviving) if x >= h]:
                        in_batch_dropped.append(surviving.pop(hh))
                elif cur is not None:
                    raise ValueError(
                        f"batch carries conflicting block ids at height {h} "
                        f"({cur['block_id']!r} then {r['block_id']!r}) but its "
                        "block frame has no delivery_id column, so the "
                        "superseded delivery's emissions cannot be rewound "
                        "out. Produce the batch via transform_events (which "
                        "passes delivery_id through) or split the deliveries "
                        "across batches."
                    )
                surviving[h] = r
            blocks_new = [surviving[h] for h in sorted(surviving)]

            # -- W4 stored-fork detection: look up ONLY the incoming range
            # in the stored segments (driver-side pyarrow, row-group
            # pruned) — O(microbatch), never an O(chain) scan, no Spark job.
            nums = [r["block_num"] for r in blocks_new]
            stored = self._stored_block_ids(man, min(nums), max(nums)) if nums else {}
            forked = sorted(
                r["block_num"]
                for r in blocks_new
                if r["block_num"] in stored and stored[r["block_num"]] != r["block_id"]
            )
            if forked:
                # rewind commits its own generation; a crash in between is
                # converged by replay (the divergent block is gone, so the
                # re-run sees no fork and just applies).
                self.rewind(forked[0])
                man = self._manifest()
                # heights >= the rewind point were just removed, so re-read
                # what is STILL stored before the re-delivery check below
                stored = self._stored_block_ids(man, min(nums), max(nums))

            # -- stored same-id re-deliveries (a rebuilt checkpoint replays
            # the stream under a new query id, so the txn guard cannot
            # catch it): re-merging their emissions would revert current
            # state to a stale version and duplicate their block rows,
            # breaking blocks() disjointness — skip block AND emissions.
            redelivered = {
                r["block_num"] for r in blocks_new if stored.get(r["block_num"]) == r["block_id"]
            }
            if redelivered:
                blocks_new = [r for r in blocks_new if r["block_num"] not in redelivered]
            if unioned is not None and (in_batch_dropped or redelivered):
                drop = F.lit(False)
                if has_did and in_batch_dropped:
                    # exact: the superseded deliveries' emissions carry the
                    # same delivery_id.
                    drop = drop | F.col("delivery_id").isin(
                        [r["delivery_id"] for r in in_batch_dropped]
                    )
                for h in sorted(redelivered):
                    # exact by construction: every emission at height h
                    # belongs to the re-delivered block
                    drop = drop | (F.col("block_num") == F.lit(h))
                unioned = unioned.filter(~drop)
            dedupe_idless = not has_did
            if unioned is not None and not has_did:
                # id-less frames: a duplicated delivery duplicates its
                # emission rows byte-identically (same ordinals, same
                # payload — the ordinals uniquely place an operation within
                # the one stamped delivery, so full-row duplicates are
                # replay artifacts by construction). They must be DEDUPED,
                # not kept: the emission<->new-row insert join is
                # many-to-many on identical order keys, so 2 copies became
                # 2x2 = 4 inserted rows with TWO open [h, MAX) versions per
                # entity (r9 review, repro-confirmed) — not the zero-width
                # versions the old comment assumed. Id-full frames never
                # take this shuffle (duplicates are dropped exactly by
                # delivery_id above).
                unioned = unioned.dropDuplicates()

        touched_by_group: dict[str, list[int]] = {}
        if batch.touched_buckets is not None and batch.buckets_n == n:
            # producer observed the bucket sets on its own checkpoint waves
            # (transform_events(n_buckets=...)) — no extra job here; after
            # an in-batch drop the sets are supersets (harmless: untouched
            # keys pass through their bucket's merge unchanged)
            touched_by_group = {g: list(b) for g, b in batch.touched_buckets.items()}
        elif unioned is not None:
            for r in (
                unioned.select("_grp", self._bucket_expr("vkey", n).alias("b")).distinct().collect()
            ):
                touched_by_group.setdefault(r["_grp"], []).append(r["b"])

        gen = man["gen"] + 1
        tok = _stage_token()
        new_man = json.loads(json.dumps(man))
        new_man["gen"] = gen
        new_man["n_buckets"] = n

        # Build every touched table's merge plan first, then run the writes
        # CONCURRENTLY (Spark schedules jobs from multiple submitter threads
        # onto the same executors; an 11-table batch becomes one wave of
        # overlapping jobs instead of 11 serial ones — ingest latency is the
        # slowest table, not the sum). Crash semantics are unchanged: every
        # write lands in fresh generation directories and the manifest only
        # commits after ALL writes returned.
        # API guard: new rows only enter through the merge their group's
        # emissions drive — a tables= entry whose group supplied NO
        # emissions frame would be silently discarded (the group loop
        # skips it), a data-losing footgun for hand-built backfill batches
        table_group = {t: g for g, (_vk, tabs) in ENTITY_GROUPS.items() for t in tabs}
        orphaned = sorted(
            t for t in batch.tables if t in table_group and table_group[t] not in batch.emissions
        )
        if orphaned:
            raise ValueError(
                f"PipelineBatch.tables supplies {orphaned} but carries no "
                f"emissions frame for group(s) "
                f"{sorted({table_group[t] for t in orphaned})} — those rows "
                "would be silently dropped. Supply the emission rows that "
                "drive the merge (vkey, block_num, batch_ord, change_idx, "
                "entry_idx, is_delete)."
            )

        jobs: list[tuple[str, str, list[int], DataFrame]] = []
        for group, (vkey, tables) in ENTITY_GROUPS.items():
            touched = sorted(touched_by_group.get(group, []))
            if not touched:
                continue  # no emission rows for this group in the batch
            # member tables share the group's emission slice of the ONE
            # checkpointed union — a narrow in-memory filter, so concurrent
            # jobs re-read it without re-running any upstream decode
            emis = unioned.filter(F.col("_grp") == group).drop("_grp")
            for table in tables:
                schema = schemas.SINK_TABLES[table]
                new_rows = batch.tables.get(table)
                if new_rows is None:
                    new_rows = _empty_new_rows(self.spark, schema)
                elif dedupe_idless:
                    # same rationale as the emission dedupe above: an
                    # id-less duplicated delivery duplicates its new-row
                    # frames byte-identically, and each copy would join
                    # every matching emission copy in the insert join
                    new_rows = new_rows.dropDuplicates()
                # only the TOUCHED open buckets participate; untouched
                # buckets carry over by pointer and closed history is
                # immutable and never rescanned during apply
                merged = merge_scd2(
                    self.current(table, buckets=touched, _man=man), new_rows, vkey, emis, schema
                )
                jobs.append((table, vkey, touched, merged))

        if jobs:
            with ThreadPoolExecutor(max_workers=min(8, len(jobs))) as pool:
                results = list(
                    pool.map(
                        lambda j: self._write_split(j[3], f"{j[0]}/merged-g{gen}-{tok}", j[1], n), jobs
                    )
                )
            for (table, _vkey, touched, _df), (open_new, closed_rel) in zip(jobs, results):
                tman = new_man["tables"].setdefault(table, {"open_buckets": {}, "closed": []})
                for b in touched:
                    tman["open_buckets"].pop(str(b), None)
                tman["open_buckets"].update(open_new)
                if closed_rel:
                    tman["closed"].append(closed_rel)

        if blocks_new:
            # blocks_new is already driver-side (one tiny row per block) —
            # write the segment directly with pyarrow instead of paying a
            # Spark job round trip for kilobytes
            import pyarrow as pa
            import pyarrow.parquet as pq

            seg = f"blocks/seg-g{gen}-{tok}"
            seg_dir = os.path.join(self.path, seg)
            os.makedirs(seg_dir, exist_ok=True)
            table = pa.table(
                {
                    "block_num": pa.array([r["block_num"] for r in blocks_new], pa.int64()),
                    "block_id": pa.array([r["block_id"] for r in blocks_new], pa.string()),
                }
            )
            pq.write_table(table, os.path.join(seg_dir, "part-0.parquet"))
            new_man["blocks"].append(seg)
        if batch_id is not None:
            if txn_app_id is not None:
                new_man.setdefault("txn", {})[txn_app_id] = batch_id
            else:
                new_man["last_batch_id"] = batch_id
        self._commit(new_man, expected_gen=gen - 1)
        if batch_ckpt is not None:
            # past the manifest swap the batch checkpoint is dead — free
            # its blocks now instead of leaning on ContextCleaner's GC lag
            # (a long-running stream's storage bound; see
            # functions/checkpoints.py). A crash before the commit leaves
            # it to the cleaner, exactly the prior behavior.
            free_local_checkpoint(batch_ckpt)

    def compact(self, min_segments: int = 2) -> bool:
        """Table maintenance: coalesce each table's accumulated closed
        segments (one per batch that closed versions — the streaming
        small-files problem) into a single segment, and the blocks segments
        likewise. One generation, one atomic manifest commit; readers on
        the old manifest keep consistent snapshots until the swap, and
        ``_vacuum`` reclaims the merged inputs afterwards. The Delta
        OPTIMIZE / Iceberg rewrite-data-files analog; run it on a cadence,
        not per batch. Returns True if anything was compacted."""
        man = self._manifest()
        gen = man["gen"] + 1
        tok = _stage_token()
        new_man = json.loads(json.dumps(man))
        new_man["gen"] = gen
        did = False
        for table, tman in man["tables"].items():
            closed = [c for c in tman.get("closed", []) if c]
            if len(closed) < min_segments:
                continue
            merged_rel = f"{table}/closed-compact-g{gen}-{tok}"
            self._read_dirs(closed, schemas.SINK_TABLES[table]).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(self.path, merged_rel))
            new_man["tables"][table]["closed"] = [merged_rel]
            did = True
        if len(man["blocks"]) >= min_segments:
            merged_rel = f"blocks/compact-g{gen}-{tok}"
            self._read_dirs(man["blocks"], schemas.BLOCKS_TABLE).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(self.path, merged_rel))
            new_man["blocks"] = [merged_rel]
            did = True
        if did:
            self._commit(new_man, expected_gen=gen - 1)
        return did

    def maybe_compact(self, max_closed_segments: int = 8, max_block_segments: int = 32) -> bool:
        """Threshold maintenance policy — the glue between ``describe()``'s
        storage profile and ``compact()``: run compaction only once any
        table has accumulated more than ``max_closed_segments`` closed
        segments (one per batch that closed versions) or the block log
        exceeds ``max_block_segments`` segments (one per batch). The
        under-threshold check costs ONE manifest read (a driver-side JSON
        file — no file listing, no Spark job), so a streaming runner can
        call this every batch interval; byte-level policies can layer on
        ``describe()``, which walks parquet footers. Returns True when a
        compaction ran."""
        man = self._manifest()
        worst = max(
            (len([c for c in t.get("closed", []) if c]) for t in man["tables"].values()),
            default=0,
        )
        if worst <= max_closed_segments and len(man["blocks"]) <= max_block_segments:
            return False
        return self.compact()

    def rewind(self, block_num: int) -> None:
        """W4 fork repair: drop versions born at >= block_num, re-open
        versions closed at >= block_num, forget blocks >= block_num.
        One generation, one atomic commit; consolidates closed history
        (the Delta RESTORE cost — rare by construction)."""
        man = self._manifest()
        gen = man["gen"] + 1
        tok = _stage_token()
        n = self._n_buckets()
        new_man = json.loads(json.dumps(man))
        new_man["gen"] = gen
        new_man["n_buckets"] = n
        vkey_of = {t: vkey for _, (vkey, tables) in ENTITY_GROUPS.items() for t in tables}
        for table in schemas.SINK_TABLES:
            if table not in man["tables"]:
                continue
            repaired = (
                self.read(table)
                .filter(F.col("start_block_num") < block_num)
                .withColumn(
                    "end_block_num",
                    F.when(F.col("end_block_num") >= block_num, F.lit(MAX_BLOCK_NUM)).otherwise(
                        F.col("end_block_num")
                    ),
                )
            )
            open_new, closed_rel = self._write_split(repaired, f"{table}/rewind-g{gen}-{tok}", vkey_of[table], n)
            new_man["tables"][table] = {"open_buckets": open_new, "closed": [closed_rel] if closed_rel else []}
        if man["blocks"]:
            seg = f"blocks/seg-g{gen}-{tok}"
            kept = self.blocks().filter(F.col("block_num") < block_num).coalesce(1)
            kept.write.mode("overwrite").parquet(os.path.join(self.path, seg))
            new_man["blocks"] = [seg]
        self._commit(new_man, expected_gen=gen - 1)
