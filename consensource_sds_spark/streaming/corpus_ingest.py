"""Continuous training-corpus ingest — the streaming face of corpus.py.

A data team's corpus is not rebuilt nightly at 100 TB; new crawl batches
arrive continuously and must pass the SAME gates the batch build applies:

    rule filter (x43's verdict expressions, imported — one rule set)
      -> incremental exact dedup vs the STANDING digest index
         (x58 semantics: the corpus is never rescanned, only its
         (digest, keep_doc_id) index is probed; within-batch dups
         collapse to the min doc_id first)
      -> sharded split=*/shard_id=* append (same layout/expressions as
         the batch writer, so loaders cannot tell the corpora apart)

Exactly-once story: the streaming checkpoint dedupes source files; inside
``foreachBatch`` every write is keyed by ``batch_id`` partition so a
REPLAYED microbatch (crash between sink writes and checkpoint commit)
overwrites its own previous output instead of double-appending —
idempotence by layout, the same trick the SCD2 store gets from its
manifest. Corpus rows use dynamic partition overwrite on a plain parquet
layout; the indexes use dynamic-overwrite ``insertInto`` on bucketed
catalog tables: readers see one row per retained digest regardless of
replays.

Scale — the standing indexes are BUCKETED on their probe keys. Both
indexes are Spark-native bucketed tables (``CLUSTERED BY ... INTO N
BUCKETS``, partitioned by ``batch_id`` for replay idempotence), so every
per-batch probe join plans with NO Exchange and NO BroadcastExchange on
the index side: the small batch side takes the one hash shuffle into the
index's bucket layout and the O(corpus) side is read in place. The index
is the side that grows without bound (~16 B/doc ⇒ tens of GB at 1B+
docs), so it must never be the broadcast/build side — AQE may still
shrink the join to a broadcast of a genuinely-small index early in a
corpus's life, but nothing forces it. ``compact_indexes`` folds the
per-batch partitions through the same bucketed ``insertInto``, so
compaction preserves probe-compatibility (pinned by
``tests/test_corpus_ingest.py``). The near-dup twin is x66's band-index
probe; its standing (band, band_val) index gets the identical treatment.

On top of the bucketed layout, the digest probe short-circuits through a
driver-held bloom sidecar (functions/bloom.py): an all-new microbatch —
the steady state for novel content — touches ZERO index files, and a
batch with bloom hits probes only the candidate digests (IN-pushdown =
bucket + row-group pruning). The sidecar is a superset of the index by
write ordering, so the fast path can skip work but never skip a real
duplicate.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from consensource_sds_spark.functions.bloom import DEFAULT_M_BITS, BloomSidecar
from consensource_sds_spark.functions.checkpoints import free_local_checkpoint
from consensource_sds_spark.queries.extensions import (
    minhash_band_values,
    winnow_fingerprint_hashes,
    with_filter_verdict,
    with_gopher_verdict,
)
from consensource_sds_spark.sources.dataset_writer import ROW_GROUP_BYTES, with_shard_columns

#: the documents-table schema (TESTDATA.md) — file streams need it declared
DOC_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

#: bucket count for the standing index tables. Sized for probe-side
#: parallelism, not storage: the batch side of each probe shuffles into
#: exactly this many partitions. At 100 TB-corpus scale this is a deploy
#: knob (hundreds); the LAYOUT is what matters — the plan shape (index
#: side Exchange-free) is invariant in it.
_N_INDEX_BUCKETS = 16

#: (columns, bucket keys) per index — the digest index probes on digest,
#: the LSH band index on the compound (band, band_val) key, which is also
#: exactly the key both probe joins use.
_DIGEST_COLS = "digest STRING, keep_doc_id BIGINT"
_DIGEST_KEYS = "digest"
_BAND_COLS = "doc_id BIGINT, band INT, band_val BIGINT"
_BAND_KEYS = "band, band_val"
_FP_COLS = "doc_id BIGINT, fp_hash BIGINT"
_FP_KEYS = "fp_hash"

#: band-index LAYOUT VERSION (r12). v1 keyed band_val as the 17-char
#: "h0|h1" hex string from :func:`minhash_band_values`; v2 packs the two
#: 32-bit minhashes into ONE BIGINT (h0 in the high 32 bits) — the same
#: equality relation (the packing is injective), ~60% narrower key bytes
#: on the corpus-sized standing index and a cheaper long hash on every
#: probe join (measured 25% on the isolated probe join at 2M index
#: rows). The version is recorded in a ``_layout.json`` sidecar inside
#: the index directory (the SCD2 manifest pattern: fail LOUDLY on a
#: future version rather than mis-read the on-disk keys); a v1 index —
#: detected by its STRING band_val parquet schema — is migrated through
#: the same write-aside-then-swap path as the legacy unbucketed layout.
_BAND_LAYOUT_VERSION = 2


class CorpusIndexLayoutError(RuntimeError):
    """An index directory declares a layout version this build cannot
    read. Same loud-failure contract as ``ScdStoreVersionError``: probing
    a mis-read band index would silently re-admit near-duplicates."""

#: Spark bucketed files carry the bucket id as a ``_NNNNN`` suffix before
#: the codec extension; files written by a plain ``.parquet(dir)`` don't.
_BUCKETED_FILE_RE = re.compile(r"_\d{5}\.c\d{3}")

#: above this many bloom candidates, drop the IN-list pushdown (plan-bloat
#: territory) and run the plain anti-join — same result, no pruning.
_BLOOM_ISIN_CAP = 1024

#: above this many post-collapse batch rows, the digest probe stops
#: collecting digests to the driver (a backfill-sized microbatch would
#: ship GBs of 32-char hex strings through it) and switches to the
#: executor-side bitmap-broadcast probe — the bloom's FIXED m/8 bytes go
#: out once, candidates anti-join the index as usual, and the sidecar
#: update comes back as an OR-reduced bitmap. Retained content is
#: identical on both sides of the threshold.
_BLOOM_DRIVER_BATCH_CAP = 1_000_000


@contextmanager
def _dynamic_overwrite(spark: SparkSession):
    """``insertInto`` reads partitionOverwriteMode from the SESSION conf
    only (the per-write option is ignored on the insert path — verified
    empirically; a static overwrite would wipe every other batch's
    partition). Scope the dynamic setting to the write and restore."""
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def _index_table_name(dir_: str) -> str:
    """Deterministic catalog name for the index table at ``dir_`` — the
    path IS the identity, so any session (or a rebuilt metastore) resolves
    the same directory to the same table."""
    return "corpus_index_" + hashlib.md5(os.path.abspath(dir_).encode()).hexdigest()[:12]


def _index_has_files(dir_: str) -> bool:
    """True when ``dir_`` holds any parquet data at all (bucketed or
    legacy) — the guard that keeps a missing bloom sidecar from being
    mistaken for an empty corpus. A COMPLETED migration aside copy
    (``<dir>.migrating`` with _SUCCESS, see :func:`_ensure_index_table`)
    counts: mid-migration those rows ARE the index's durable data, and
    ignoring them would let a fresh empty bloom claim the whole corpus
    as definitely-new."""
    if os.path.isfile(os.path.join(os.path.abspath(dir_) + ".migrating", "_SUCCESS")):
        return True
    if not os.path.isdir(dir_):
        return False
    for _root, _dirs, files in os.walk(dir_):
        if any(f.endswith(".parquet") and not f.startswith(".") for f in files):
            return True
    return False


def _legacy_unbucketed(dir_: str) -> bool:
    """True when ``dir_`` holds parquet files WITHOUT bucket suffixes —
    an index written by a pre-bucketing version of this module."""
    if not os.path.isdir(dir_):
        return False
    for root, _dirs, files in os.walk(dir_):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(".") and not _BUCKETED_FILE_RE.search(f):
                return True
    return False


def _ensure_index_table(spark: SparkSession, dir_: str, cols: str, bucket_keys: str) -> str:
    """Register (or recover) the bucketed index table over ``dir_``.

    - table already in the catalog and the location exists: no-op;
    - location gone (recycled temp dir): drop the stale entry, recreate;
    - directory holds a LEGACY unbucketed index (older layout): migrate —
      read the rows, rewrite them through the bucketed table (a one-time
      full rewrite; leaving the DDL's bucket claim over unbucketed files
      would silently mis-bucket every probe);
    - fresh path: create the external table and recover any partitions a
      previous session already wrote (crash between insert and catalog is
      impossible — inserts register their own partitions — but a NEW
      metastore over an existing index needs the repair)."""
    dir_ = os.path.abspath(dir_)
    name = _index_table_name(dir_)
    # Legacy migration is write-aside-then-swap: the legacy dir is the ONLY
    # durable copy of the standing index, so it must never be deleted until
    # another durable copy exists — localCheckpoint blocks are NOT durable,
    # and a crash between rmtree and the bucketed rewrite would silently
    # destroy the whole index (the empty dir then reads as an empty corpus
    # and every future batch re-admits duplicates). The aside copy is only
    # trusted once its _SUCCESS marker landed; every crash point either
    # still has the legacy dir (redo from it) or a complete aside (resume).
    # The resume check runs BEFORE the tableExists early return: a crash
    # mid-rewrite leaves the table registered over a PARTIAL dir.
    aside = dir_ + ".migrating"
    resume = os.path.isfile(os.path.join(aside, "_SUCCESS"))
    if spark.catalog.tableExists(name):
        if os.path.isdir(dir_) and not resume:
            return name
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    legacy_src = None
    if _legacy_unbucketed(dir_):
        shutil.rmtree(aside, ignore_errors=True)  # any aside here is partial
        spark.read.parquet(dir_).write.parquet(aside)
        shutil.rmtree(dir_)
        legacy_src = aside
    elif resume:
        # a prior migration crashed after removing the legacy dir (or
        # mid-rewrite): the aside copy is the durable source — converge by
        # redoing the bucketed rewrite from it
        if os.path.isdir(dir_):
            shutil.rmtree(dir_)
        legacy_src = aside
    spark.sql(
        f"""CREATE TABLE IF NOT EXISTS {name} ({cols}, batch_id INT)
            USING PARQUET PARTITIONED BY (batch_id)
            CLUSTERED BY ({bucket_keys}) SORTED BY ({bucket_keys})
            INTO {_N_INDEX_BUCKETS} BUCKETS
            LOCATION '{dir_}'"""
    )
    if legacy_src is not None:
        base = [c.split()[0] for c in cols.split(",")]
        legacy_rows = spark.read.parquet(legacy_src)
        _insert_index(spark, name, legacy_rows.select(*base, F.col("batch_id").cast("int")))
        shutil.rmtree(legacy_src, ignore_errors=True)  # migration committed
    elif os.path.isdir(dir_):
        # a prior session's partitions exist on disk but this catalog is
        # fresh — recover them (MSCK lists the location, so only when the
        # directory exists; a brand-new index has nothing to recover)
        spark.sql(f"MSCK REPAIR TABLE {name}")
    return name


def _insert_index(spark: SparkSession, table: str, df: DataFrame) -> None:
    """Dynamic-overwrite positional insert — ``df``'s columns must already
    be in DDL order with ``batch_id`` last. The catalog's bucket spec is
    honored by the insert (files land bucket-suffixed), which is what
    keeps every later probe's index side Exchange-free.

    The overwrite-mode conf is set on the FRAME's session, not the passed
    one: under ``foreachBatch`` the batch frame belongs to a cloned
    session with its own conf, and a static-mode insert there would wipe
    every earlier batch's partition (observed, not hypothetical)."""
    with _dynamic_overwrite(df.sparkSession):
        df.write.mode("overwrite").insertInto(table)


def digest_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The standing (digest, keep_doc_id) table as a bucketed-scan frame
    (empty before the first batch — probes against it are free)."""
    return spark.table(_ensure_index_table(spark, index_dir, _DIGEST_COLS, _DIGEST_KEYS))


def pack_band_val(col) -> F.Column:
    """The v2 band key: :func:`minhash_band_values`' "h0|h1" value (two
    8-hex-char 32-bit minhashes) packed into ONE BIGINT, h0 in the high
    32 bits. Injective over the domain, so BIGINT equality == string
    equality — probes and index agree on the same candidate pairs."""
    return F.shiftleft(F.conv(F.substring(col, 1, 8), 16, 10).cast("bigint"), 32) + F.conv(
        F.substring(col, 10, 8), 16, 10
    ).cast("bigint")


def band_values_packed(d: DataFrame) -> DataFrame:
    """(doc_id, band, band_val BIGINT) — the streaming lane's band frame:
    x66's :func:`minhash_band_values` with the key packed to the v2
    layout. The registry queries (x03/x66) keep the string frame — their
    oracles join on the string form; the STANDING index's layout is
    internal state and free to narrow."""
    return minhash_band_values(d).select(
        "doc_id", "band", pack_band_val(F.col("band_val")).alias("band_val")
    )


def _band_layout_path(band_dir: str) -> str:
    return os.path.join(os.path.abspath(band_dir), "_layout.json")


def _ensure_band_v2(spark: SparkSession, band_dir: str) -> None:
    """Verify/migrate the band index at ``band_dir`` to layout v2.

    - ``_layout.json`` present with a FUTURE version: raise (loud-failure
      contract — a mis-read key layout silently re-admits near-dups);
    - on-disk parquet schema has a STRING ``band_val``: v1 — rewrite the
      rows aside with the key packed (write-aside-then-swap, the same
      crash-safety argument as the legacy-unbucketed migration: the v1
      dir is the only durable copy until the aside's _SUCCESS lands, and
      every crash point either redoes from the v1 dir or resumes from a
      complete aside via ``_ensure_index_table``);
    - BIGINT schema / empty dir: already v2, nothing to do."""
    import json as _json

    band_dir = os.path.abspath(band_dir)
    lp = _band_layout_path(band_dir)
    if os.path.isfile(lp):
        with open(lp) as f:
            v = _json.load(f).get("version")
        if v != _BAND_LAYOUT_VERSION:
            raise CorpusIndexLayoutError(
                f"band index at {band_dir!r} declares layout version {v}; "
                f"this build reads version {_BAND_LAYOUT_VERSION}. Refusing "
                "to probe a key layout it could mis-read."
            )
        return
    aside = band_dir + ".migrating"
    if os.path.isfile(os.path.join(aside, "_SUCCESS")):
        return  # a prior migration completed its aside; _ensure_index_table resumes it
    if not _index_has_files(band_dir):
        return
    from pyspark.sql.types import StringType

    rows = spark.read.parquet(band_dir)  # batch_id discovered as partition col
    if not isinstance(rows.schema["band_val"].dataType, StringType):
        return  # already v2 (sidecar stamped lazily by band_index)
    # v1 -> v2: the registered table (if any) carries the v1 DDL — drop it
    spark.sql(f"DROP TABLE IF EXISTS {_index_table_name(band_dir)}")
    shutil.rmtree(aside, ignore_errors=True)  # any aside here is partial
    rows.select(
        "doc_id", "band", pack_band_val(F.col("band_val")).alias("band_val"), "batch_id"
    ).write.parquet(aside)
    shutil.rmtree(band_dir)  # aside (with _SUCCESS) is now the durable copy


def _stamp_band_layout(band_dir: str) -> None:
    """Record the layout version sidecar (idempotent; write-then-rename so
    a torn write can never half-exist)."""
    import json as _json

    band_dir = os.path.abspath(band_dir)
    lp = _band_layout_path(band_dir)
    if os.path.isfile(lp):
        return
    os.makedirs(band_dir, exist_ok=True)
    tmp = lp + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"version": _BAND_LAYOUT_VERSION, "band_val": "minhash-2x32-packed"}, f)
    os.replace(tmp, lp)


def band_index(spark: SparkSession, band_dir: str) -> DataFrame:
    """The standing (doc_id, band, band_val BIGINT) LSH index, bucketed on
    the (band, band_val) probe key (layout v2; v1 string-keyed indexes are
    migrated in place on first open)."""
    _ensure_band_v2(spark, band_dir)
    name = _ensure_index_table(spark, band_dir, _BAND_COLS, _BAND_KEYS)
    _stamp_band_layout(band_dir)
    return spark.table(name)


def _near_dedup(
    spark: SparkSession, fresh: DataFrame, band_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Drop near-duplicates via the x66 band probe, streaming form:

    1. within-batch — a doc sharing any band with a SMALLER doc_id in the
       same batch drops (the pairwise-predecessor rule, x65's semantic;
       chains collapse toward the minimum like x06's star contraction);
    2. vs the corpus — surviving docs probe the STANDING band index; any
       hit (a retained doc, necessarily from an earlier batch) drops the
       newcomer. Index doc_ids equal to the probe doc_id are ignored so a
       crash-replayed batch never treats its own previous write as a dup.

    Both joins key on (band, band_val): batch x batch is bucket-bounded
    and batch-sized; batch x index reads the index's bucketed layout in
    place — no Exchange, no BroadcastExchange on the index side (plan
    pinned by ``test_corpus_ingest.py::test_probe_joins_never_shuffle_or_
    broadcast_the_index``). Never corpus x corpus.

    Returns ``(retained, bands)`` — the checkpointed band frame rides
    along so the caller's band-index insert reuses it (MinHash signatures
    are the dominant per-batch CPU cost; recomputing them for the insert
    would double it)."""
    bands = band_values_packed(fresh.select("doc_id", "text")).localCheckpoint()
    a = bands.select(F.col("doc_id").alias("_da"), "band", "band_val")
    b = bands.select(F.col("doc_id").alias("_db"), "band", "band_val")
    dup_in_batch = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("_db") < F.col("_da"))
        .select(F.col("_da").alias("doc_id"))
        .distinct()
    )
    fresh = fresh.join(dup_in_batch, "doc_id", "left_anti")
    idx = band_index(spark, band_dir)
    hits = (
        bands.join(
            idx.select(F.col("doc_id").alias("_di"), "band", "band_val"),
            ["band", "band_val"],
        )
        .filter(F.col("_di") != F.col("doc_id"))
        .select("doc_id")
        .distinct()
    )
    return fresh.join(hits, "doc_id", "left_anti"), bands


def fingerprint_index(spark: SparkSession, fingerprint_dir: str) -> DataFrame:
    """The standing (doc_id, fp_hash) winnowing-postings table, bucketed
    on the fp_hash probe key."""
    return spark.table(_ensure_index_table(spark, fingerprint_dir, _FP_COLS, _FP_KEYS))


def probe_containment(
    spark: SparkSession, batch_df: DataFrame, fingerprint_dir: str, min_shared: int = 2
) -> DataFrame:
    """Which retained corpus docs does the incoming batch PARTIALLY
    overlap? The batch's winnowed fingerprints probe the standing index;
    hits score by containment relative to the NEW doc (shared / new
    doc's fingerprint count — "how much of the newcomer already exists").
    Returns (new_doc_id, corpus_doc_id, shared, containment). A report,
    not an automatic drop: quoting a retained doc is a policy question
    (attribution, licensing, boilerplate) the caller decides — unlike
    exact/near dups, which the ingest drops itself.

    Scale: the join keys on fp_hash — batch fingerprints x matching
    postings against the bucketed index side, never corpus x corpus;
    same-doc hits are ignored so a replayed batch never reports itself."""
    # same foreachBatch-clone discipline as ingest_batch: the passed
    # session is superseded by the batch frame's own
    spark = batch_df.sparkSession
    fp = winnow_fingerprint_hashes(batch_df.select("doc_id", "text"))
    sized = fp.withColumn("n_new", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    idx = fingerprint_index(spark, fingerprint_dir).select(
        F.col("doc_id").alias("corpus_doc_id"), "fp_hash"
    )
    return (
        sized.select(F.col("doc_id").alias("new_doc_id"), "fp_hash", "n_new")
        .join(idx, "fp_hash")
        .filter(F.col("corpus_doc_id") != F.col("new_doc_id"))
        # one distinct over the HITS (batch-bounded): crash-duplicated
        # index partitions (a compaction interrupted between its
        # consolidated insert and the per-batch partition drops) would
        # otherwise double `shared` and push `containment` past 1.0 — the
        # digest (anti-join) and band (DISTINCT) probes are
        # duplicate-agnostic by shape, this COUNT was not. Deduping the
        # index side directly would re-shuffle the bucketed scan; the
        # hits relation is batch-sized.
        .dropDuplicates(["new_doc_id", "corpus_doc_id", "fp_hash"])
        .groupBy("new_doc_id", "corpus_doc_id")
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.round(F.count(F.lit(1)) / F.first("n_new").cast("double"), 4).alias("containment"),
        )
        .filter(F.col("shared") >= min_shared)
    )


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    index_dir: str,
    n_shards: int = 16,
    band_dir: str | None = None,
    bloom_bits: int | None = DEFAULT_M_BITS,
    quarantine_dir: str | None = None,
    fingerprint_dir: str | None = None,
    gopher_rules: tuple[str, ...] | None = None,
) -> None:
    """One microbatch through filter -> incremental dedup -> sharded append.

    Pure function of (batch, standing index) so the identical code runs
    under spark.read for backfill and inside foreachBatch for the stream.

    ``quarantine_dir`` (the W5 treatment for documents): rows that cannot
    enter the pipeline — NULL doc_id/text, or a populated
    ``_corrupt_record`` column when the source was parsed permissively
    (JSONL/CSV) — are routed to their own batch_id-partitioned parquet
    lane instead of being silently dropped, replay-idempotent like every
    other write here. The good path continues without the corrupt column.

    ``bloom_bits`` (None disables): the digest probe short-circuits
    through a driver-held bloom sidecar (``<index_dir>/_bloom``, a
    SUPERSET of the index's digests by write ordering — see
    :class:`~consensource_sds_spark.functions.bloom.BloomSidecar`). Batch
    digests the bloom has never seen are DEFINITELY new: an all-new batch
    skips the index probe join entirely (zero index reads — the steady
    state for novel content). Bloom hits are candidates only; they take
    an exact anti-join against the bucketed index, with the candidate
    digests pushed down as an IN filter (bucket + row-group pruning) when
    few enough (``_BLOOM_ISIN_CAP``). False positives are cleared by that
    join, false negatives cannot occur, so retained content is
    bit-identical with the bloom on or off (pinned by
    ``test_corpus_ingest.py::test_bloom_equivalence_and_fast_path``).

    The driver-side digest collect is bounded by
    ``_BLOOM_DRIVER_BATCH_CAP``: past it (a backfill-sized microbatch,
    where O(batch) digests through the driver would be GBs) the probe
    auto-switches to the executor-side path — the FIXED-size bitmap is
    broadcast once and tested in an Arrow-vectorized UDF
    (:func:`~consensource_sds_spark.functions.bloom.might_contain_col`),
    bloom-missing rows skip the index join entirely, and the sidecar
    update ships only a per-partition-OR-reduced bitmap back (never the
    digests). Same retained content on both sides of the threshold
    (pinned by ``test_bloom_executor_path_equivalence``)."""
    # under foreachBatch the batch frame lives in a CLONED session; run
    # every catalog op / table read on that session so probe frames and
    # batch frames resolve against one state (tables themselves are in the
    # shared external catalog either way)
    spark = batch_df.sparkSession
    bad = F.col("doc_id").isNull() | F.col("text").isNull()
    if "_corrupt_record" in batch_df.columns:
        bad = bad | F.col("_corrupt_record").isNotNull()
    if quarantine_dir is not None:
        (
            batch_df.filter(bad)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(quarantine_dir)
        )
    # the NULL-key drop is UNCONDITIONAL — quarantine_dir only controls
    # whether such rows are preserved for inspection, never whether they
    # enter the pipeline: a NULL doc_id row passes the text gates (the x43
    # verdict only traps NULL text/lang), then WINS the within-batch digest
    # collapse (ascending orderBy ranks NULLs first), ejecting the real doc
    # and planting NULL keep_doc_id rows and NULL-keyed postings in every
    # standing index (where the same-doc_id replay guard is vacuously NULL)
    batch_df = batch_df.filter(~bad).drop("_corrupt_record")
    kept = with_filter_verdict(batch_df).filter(F.col("verdict") == "keep")
    if gopher_rules is not None:
        # the batch build's gopher_gate, streaming face — identical rule
        # expressions (GOPHER_RULES names the full set), applied after the
        # x43 filter exactly like build_training_corpus does
        kept = (
            with_gopher_verdict(kept, rules=gopher_rules)
            .filter(F.col("gopher_verdict") == "keep")
            .drop("gopher_verdict")
        )
    digests = kept.withColumn("digest", F.md5("text"))
    # collapse within-batch duplicates first (min doc_id survives), then
    # probe the standing index — one digest-keyed shuffle + one probe join
    # whose index side is a bucketed scan (never shuffled, never broadcast;
    # the BATCH side pays the one small Exchange into the bucket layout)
    batch_min = (
        digests.withColumn(
            "_rk", F.row_number().over(Window.partitionBy("digest").orderBy("doc_id"))
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    # every per-batch localCheckpoint lands here and is freed together
    # after the digest-index commit point — a long-running stream must not
    # lean on ContextCleaner's GC lag to bound its storage (see
    # functions/checkpoints.py for the measured envelope)
    batch_ckpts: list[DataFrame] = []
    sidecar, batch_digs = None, None
    if bloom_bits is not None:
        bloom_path = os.path.join(os.path.abspath(index_dir), "_bloom")
        if not os.path.exists(bloom_path) and _index_has_files(index_dir):
            # an index built before the bloom existed (or a deleted
            # sidecar): an EMPTY bloom would violate the superset
            # invariant and silently re-admit duplicates — rebuild from
            # the index (the source of truth; one-time distributed build,
            # converges across crashes since the file appears atomically
            # only after a complete build)
            from consensource_sds_spark.functions import bloom as _bloom

            sidecar = _bloom.rebuild(
                spark, digest_index(spark, index_dir).select("digest"), bloom_path, m_bits=bloom_bits
            )
        else:
            sidecar = BloomSidecar(bloom_path, m_bits=bloom_bits)
        batch_min = batch_min.localCheckpoint()
        batch_ckpts.append(batch_min)
        n_batch = batch_min.count()  # checkpointed: a metadata-cheap job
        if n_batch <= _BLOOM_DRIVER_BATCH_CAP:
            # one digest per row post-collapse: a microbatch-bounded
            # driver collect (control-plane scale, like the SCD2 bucket
            # distinct) — the bloom never ships to executors this way
            batch_digs = [r["digest"] for r in batch_min.select("digest").collect()]
            cands = sidecar.candidates(batch_digs)
            if not cands:
                # every digest is definitely new: no index probe at all
                _ensure_index_table(spark, index_dir, _DIGEST_COLS, _DIGEST_KEYS)
                fresh = batch_min
            elif len(cands) <= _BLOOM_ISIN_CAP:
                dup = digest_index(spark, index_dir).select("digest").filter(F.col("digest").isin(cands))
                fresh = batch_min.join(dup, "digest", "left_anti")
            else:
                fresh = batch_min.join(digest_index(spark, index_dir).select("digest"), "digest", "left_anti")
        else:
            # backfill-sized batch: collecting O(batch) digests would ship
            # GBs through the driver. Broadcast the FIXED-size bitmap once
            # instead and test executor-side (Arrow-vectorized); rows the
            # bloom has never seen are DEFINITELY new and skip the index
            # join entirely, candidates take the exact anti-join as usual.
            from consensource_sds_spark.functions.bloom import might_contain_col

            probe = might_contain_col(spark, sidecar.bits, sidecar.k)
            # checkpoint the flagged frame: both branches of the union
            # filter it, and left lazy each would re-run the membership UDF
            # over the whole batch — doubling the probe pass on exactly the
            # batches chosen for being large
            flagged = batch_min.withColumn("_bh", probe(F.col("digest"))).localCheckpoint()
            batch_ckpts.append(flagged)
            bc = getattr(probe, "bloom_broadcast", None)
            if bc is not None:
                # the checkpoint above MATERIALIZED the probe — release the
                # m/8-byte bitmap broadcast now rather than waiting for
                # driver GC to notice it (several pinned filters between
                # GCs is real memory at large m)
                bc.unpersist()
            maybe = flagged.filter(F.col("_bh")).drop("_bh")
            fresh = (
                flagged.filter(~F.col("_bh"))
                .drop("_bh")
                .unionByName(
                    maybe.join(
                        digest_index(spark, index_dir).select("digest"), "digest", "left_anti"
                    )
                )
            )
    else:
        fresh = batch_min.join(digest_index(spark, index_dir).select("digest"), "digest", "left_anti")
    fresh = fresh.select("doc_id", "text", "lang", "source", "n_chars", "digest").localCheckpoint()
    batch_ckpts.append(fresh)
    batch_bands = None
    if band_dir is not None:
        fresh, batch_bands = _near_dedup(spark, fresh, band_dir)
        fresh = fresh.localCheckpoint()
        batch_ckpts.append(fresh)
        batch_ckpts.append(batch_bands)

    # idempotent-by-layout appends: each write owns its batch_id partition.
    # ORDER MATTERS for crash convergence: corpus rows first, then the
    # bloom sidecar, then the band/fingerprint postings, and the DIGEST
    # index strictly LAST — the digest insert is the "commit point" after
    # which a replay's probe filters the batch to empty, so every other
    # artifact of the batch must already be on disk by then. A replay
    # after a crash anywhere before the digest insert recomputes the SAME
    # `fresh` (the digest probe still misses; bloom hits only make its own
    # digests CANDIDATES, which the exact join clears; a band probe
    # ignores same-doc_id hits, and two docs retained from one batch never
    # share a band — the within-batch predecessor rule dropped one of them
    # — so the batch's own earlier band insert can't eject its rows) and
    # dynamic-overwrites the same partitions. Had the digest insert gone
    # before the band/fp inserts, a crash between them would lose those
    # postings PERMANENTLY: the replay's empty `fresh` writes no rows, and
    # retained docs of the batch would be invisible to every later
    # near-dup/containment probe. The bloom precedes the digest insert so
    # the sidecar is always a SUPERSET of index digests (false positives
    # safe, false negatives impossible). (`fresh` is checkpointed above,
    # so the index inserts below never re-run the probe against their own
    # output either.)
    (
        with_shard_columns(fresh.drop("digest"), key="doc_id", n_shards=n_shards)
        .withColumn("batch_id", F.lit(batch_id))
        .repartition("split", "shard_id")
        .write.mode("overwrite")
        .partitionBy("batch_id", "split", "shard_id")
        .option("partitionOverwriteMode", "dynamic")
        .option("parquet.block.size", ROW_GROUP_BYTES)
        .parquet(out_dir)
    )
    if sidecar is not None:
        # superset-before-index: OR in the digests of exactly the rows the
        # digest insert below commits — `fresh`, not the pre-probe
        # batch_min. Cross-batch dups and near-dup drops never enter the
        # index, so counting them inflated fill fraction (earlier rebuilds
        # than the index warranted) and n_added; and a crash-replayed
        # batch re-counted every digest (replay's fresh is empty, so this
        # form is also naturally replay-idempotent). Superset safety only
        # requires the committed digests, which fresh is.
        if batch_digs is not None:
            sidecar.add_digests([r["digest"] for r in fresh.select("digest").collect()])
        else:
            # executor path: the update ships a per-partition OR-reduced
            # bitmap (partitions x m/8 bytes), never the digests
            from consensource_sds_spark.functions.bloom import build_bits

            sidecar.add_bits(
                build_bits(fresh.select("digest"), "digest", sidecar.m_bits, sidecar.k),
                fresh.count(),  # checkpointed: a metadata-cheap job
            )
    if band_dir is not None:
        # only RETAINED docs enter the band index (dups must never become
        # probes' reference points); replay-safe like the digest index.
        # The probe's checkpointed band frame is reused (narrowed to the
        # survivors) — recomputing MinHash signatures here would double
        # the dominant per-batch CPU cost for identical rows
        _insert_index(
            spark,
            _index_table_name(band_dir),
            batch_bands.join(fresh.select("doc_id"), "doc_id").select(
                "doc_id", "band", "band_val", F.lit(batch_id).cast("int").alias("batch_id")
            ),
        )
    if fingerprint_dir is not None:
        # standing winnowed-fingerprint index (x48 postings) for retained
        # docs — the corpus side of containment probes (x73's production
        # form); maintained append-only, replay-safe like the others
        _ensure_index_table(spark, fingerprint_dir, _FP_COLS, _FP_KEYS)
        _insert_index(
            spark,
            _index_table_name(fingerprint_dir),
            winnow_fingerprint_hashes(fresh.select("doc_id", "text")).select(
                "doc_id", "fp_hash", F.lit(batch_id).cast("int").alias("batch_id")
            ),
        )
    # the commit point: ONLY after every other artifact of the batch is
    # durable may the digest index learn these digests (see ordering
    # comment above)
    dig_tbl = _index_table_name(index_dir)
    _insert_index(
        spark,
        dig_tbl,
        fresh.select(
            "digest",
            F.col("doc_id").alias("keep_doc_id"),
            F.lit(batch_id).cast("int").alias("batch_id"),
        ),
    )
    # past the commit point every per-batch checkpoint is dead — free the
    # blocks now; a crash before this line leaves them to ContextCleaner,
    # exactly the pre-r11 behavior, and the replay recomputes from source
    for ck in batch_ckpts:
        free_local_checkpoint(ck)


def run_corpus_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_shards: int = 16,
    available_now: bool = True,
    near_dedup: bool = False,
    containment_index: bool = False,
    bloom_bits: int | None = DEFAULT_M_BITS,
    source_format: str = "parquet",
    reader_options: dict | None = None,
    quarantine: bool | None = None,
    auto_compact: bool = False,
    gopher_rules: tuple[str, ...] | None = None,
):
    """Stream document files from ``source_dir`` through the corpus gates
    into ``out_dir`` (+ ``<out_dir>_digest_index``; with ``near_dedup``
    also ``<out_dir>_band_index`` for the x66 LSH probe). ``available_now``
    drains what exists and stops — the backfill/test trigger; pass False
    for a continuously-running ingest. ``containment_index`` additionally
    maintains the standing winnowed-fingerprint index
    (``<out_dir>_fp_index``) that :func:`probe_containment` scores
    doc-in-doc overlap against. ``bloom_bits`` sizes the digest
    probe's bloom fast path (see :func:`ingest_batch`; None disables).

    ``source_format``: ``parquet`` (default), ``json`` (JSONL — one doc
    per line, the lingua franca of crawl drops), or ``csv``; extra reader
    knobs via ``reader_options`` (e.g. ``{"header": "true"}`` for csv).
    Text formats parse PERMISSIVELY against the declared DOC_SCHEMA: a
    malformed line becomes a ``_corrupt_record`` row and lands in the
    ``<out_dir>_quarantine`` lane (on by default for non-parquet sources;
    force with ``quarantine=``; the batch twin of this read discipline is
    ``sources/jsonl.py``) instead of failing the stream or
    vanishing — at crawl scale some breakage per billion lines is a
    certainty, and an auditable lane beats both a dead query and silent
    loss.

    ``auto_compact`` runs :func:`maybe_compact_indexes` after every
    applied batch — the same per-batch-interval maintenance cadence the
    SCD2 runner's ``auto_compact`` gives the store: a listdir no-op under
    threshold, one index fold when the per-batch partitions pile up.

    ``gopher_rules`` (None = off) activates the x80 rule gate after the
    x43 filter — the batch build's ``gopher_gate``, identical
    expressions, same per-rule tuning knob (extensions.GOPHER_RULES is
    the full set)."""
    index_dir = out_dir.rstrip("/") + "_digest_index"
    band_dir = out_dir.rstrip("/") + "_band_index" if near_dedup else None
    fp_dir = out_dir.rstrip("/") + "_fp_index" if containment_index else None
    if quarantine is None:
        quarantine = source_format != "parquet"
    q_dir = out_dir.rstrip("/") + "_quarantine" if quarantine else None
    schema = DOC_SCHEMA
    if source_format in ("json", "csv"):
        # surface parse failures as data, not exceptions (PERMISSIVE is
        # the default mode; declaring the column captures the raw line)
        schema = DOC_SCHEMA + ", _corrupt_record STRING"
    stream = (
        spark.readStream.schema(schema)
        .options(**(reader_options or {}))
        .format(source_format)
        .load(source_dir)
    )

    def body(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            spark, batch_df, batch_id, out_dir, index_dir, n_shards, band_dir, bloom_bits,
            q_dir, fp_dir, gopher_rules
        )
        if auto_compact:
            maybe_compact_indexes(batch_df.sparkSession, out_dir)

    writer = stream.writeStream.foreachBatch(body).option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()


def read_corpus(spark: SparkSession, out_dir: str) -> DataFrame:
    """The ingested corpus as a frame (batch_id/split/shard_id partition
    columns included)."""
    return spark.read.parquet(out_dir)


#: consolidated partition id for compacted index segments — negative so it
#: can never collide with a real stream batch id
_COMPACTED_BATCH_ID = -1


def _live_batch_dirs(dir_: str) -> list[str]:
    return [
        d
        for d in os.listdir(dir_)
        if d.startswith("batch_id=") and d != f"batch_id={_COMPACTED_BATCH_ID}"
    ]


def compact_indexes(spark: SparkSession, out_dir: str) -> None:
    """Fold the per-batch index partitions into one consolidated segment.

    The ingest writes one ``batch_id=N`` partition per microbatch — the
    right shape for idempotent replay, the wrong one after 10k batches
    (small-files listing cost on every probe; each batch's insert also
    emits up to tasks x buckets files). Compaction rewrites each index
    into ``batch_id=-1`` THROUGH the same bucketed table, so the
    consolidated segment keeps the CLUSTERED BY layout and probes stay
    Exchange-free — the ``repartition`` onto the bucket keys with exactly
    the bucket count aligns shuffle partitions 1:1 with bucket ids (same
    murmur3 pmod), so the fold emits one file per bucket.

    Crash-safe by probe semantics, no manifest needed: the consolidated
    segment is written FIRST (dynamic overwrite of its own partition),
    then per-batch partitions are dropped. A crash in between leaves rows
    duplicated across old and consolidated partitions — and every probe
    is agnostic to duplicate index rows (the digest/band probes by shape:
    anti joins and DISTINCT'd hit sets; the fp containment probe via its
    explicit hit-set dedup in :func:`probe_containment`, whose COUNT
    would otherwise double), so reads stay correct and the next
    compaction converges. New batches arriving after compaction append
    fresh batch_id partitions as usual."""
    for dir_, cols, keys in (
        (out_dir.rstrip("/") + "_digest_index", _DIGEST_COLS, _DIGEST_KEYS),
        (out_dir.rstrip("/") + "_band_index", _BAND_COLS, _BAND_KEYS),
        (out_dir.rstrip("/") + "_fp_index", _FP_COLS, _FP_KEYS),
    ):
        if not os.path.isdir(dir_):
            continue
        if cols is _BAND_COLS:
            # a compaction may be the first opener of a v1 band index
            _ensure_band_v2(spark, dir_)
        name = _ensure_index_table(spark, dir_, cols, keys)
        if cols is _BAND_COLS:
            _stamp_band_layout(dir_)
        live = _live_batch_dirs(dir_)
        if not live:
            continue
        key_cols = [k.strip() for k in keys.split(",")]
        # localCheckpoint cuts the file lineage BEFORE the write: the
        # consolidated rows are pinned in block storage, so the overwrite
        # never reads the partition it is rewriting
        consolidated = (
            spark.table(name)
            .drop("batch_id")
            .distinct()
            .repartition(_N_INDEX_BUCKETS, *[F.col(c) for c in key_cols])
            .withColumn("batch_id", F.lit(_COMPACTED_BATCH_ID).cast("int"))
            .localCheckpoint()
        )
        _insert_index(spark, name, consolidated)
        for d in live:
            bid = d.split("=", 1)[1]
            spark.sql(f"ALTER TABLE {name} DROP IF EXISTS PARTITION (batch_id={bid})")
            shutil.rmtree(os.path.join(dir_, d), ignore_errors=True)
        free_local_checkpoint(consolidated)  # written + partitions dropped


def maybe_compact_indexes(spark: SparkSession, out_dir: str, max_live_batches: int = 64) -> bool:
    """Threshold compaction policy — the maintenance-cadence hook a
    long-running ingest calls per batch-interval (the index-side analog of
    ``ScdParquetStore.maybe_compact``): when either standing index has
    accumulated more than ``max_live_batches`` per-batch partitions, fold
    them. Returns True when a compaction ran. Listing-cost only (one
    listdir per index, no Spark job) when under threshold."""
    for suffix in ("_digest_index", "_band_index", "_fp_index"):
        dir_ = out_dir.rstrip("/") + suffix
        if os.path.isdir(dir_) and len(_live_batch_dirs(dir_)) > max_live_batches:
            compact_indexes(spark, out_dir)
            return True
    return False


__all__ = [
    "ingest_batch",
    "fingerprint_index",
    "probe_containment",
    "run_corpus_stream",
    "read_corpus",
    "compact_indexes",
    "maybe_compact_indexes",
    "maybe_rebuild_bloom",
    "corpus_profile",
    "digest_index",
    "band_index",
    "DOC_SCHEMA",
]


def corpus_profile(out_dir: str) -> list[dict]:
    """Per-surface storage profile for a streamed corpus, from parquet
    FOOTERS only (no Spark job, no data scan — the ops-dashboard /
    maintenance-cadence input, the corpus twin of
    ``ScdParquetStore.describe()``). One row per existing surface —
    corpus, digest/band index, quarantine — with row/file/byte counts and
    the live (uncompacted) batch-partition count that drives
    :func:`maybe_compact_indexes`; the digest index row also reports the
    bloom sidecar's n_added and fill fraction (the :func:`rebuild` cue
    when fill creeps toward ~0.5)."""
    import pyarrow.parquet as pq

    from consensource_sds_spark.functions.bloom import BloomSidecar

    out = []
    surfaces = [
        ("corpus", out_dir.rstrip("/")),
        ("digest_index", out_dir.rstrip("/") + "_digest_index"),
        ("band_index", out_dir.rstrip("/") + "_band_index"),
        ("fp_index", out_dir.rstrip("/") + "_fp_index"),
        ("quarantine", out_dir.rstrip("/") + "_quarantine"),
    ]
    for name, d in surfaces:
        if not os.path.isdir(d):
            continue
        rows = files = nbytes = 0
        for root, _dirs, names in os.walk(d):
            for nm in names:
                if not nm.endswith(".parquet") or nm.startswith("."):
                    continue
                p = os.path.join(root, nm)
                rows += pq.ParquetFile(p).metadata.num_rows
                files += 1
                nbytes += os.path.getsize(p)
        prof = {
            "surface": name,
            "n_rows": rows,
            "n_files": files,
            "n_bytes": nbytes,
            "n_live_batches": len(_live_batch_dirs(d)) if name.endswith("_index") else None,
        }
        if name == "digest_index":
            bp = os.path.join(d, "_bloom")
            if os.path.exists(bp):
                hdr = BloomSidecar.read_header(bp)
                prof["bloom_n_added"] = hdr["n"]
                if "f" in hdr:  # header-only (see read_header)
                    prof["bloom_fill"] = hdr["f"]
                else:
                    prof["bloom_fill"] = round(BloomSidecar(bp).fill_fraction(), 8)
        out.append(prof)
    return out


def maybe_rebuild_bloom(
    spark: SparkSession, out_dir: str, max_fill: float = 0.5, growth: int = 4
) -> bool:
    """Threshold bloom maintenance — the policy hook that acts on the
    fill-fraction cue ``corpus_profile`` reports (the bloom analog of
    :func:`maybe_compact_indexes`): when the digest sidecar's set-bit
    fraction exceeds ``max_fill`` (FPR degrading, fast path decaying
    toward the plain join), rebuild it from the standing index — the
    source of truth — at ``growth``x the bits. Under threshold the check
    costs one header read (no Spark job). Returns True when a rebuild
    ran."""
    from consensource_sds_spark.functions import bloom as _bloom

    index_dir = out_dir.rstrip("/") + "_digest_index"
    path = os.path.join(os.path.abspath(index_dir), "_bloom")
    if not os.path.exists(path):
        return False
    hdr = BloomSidecar.read_header(path)
    if "f" in hdr:  # header-only: no bitmap read under threshold
        fill, m_bits = hdr["f"], hdr["m"]
    else:  # pre-"f" sidecar: one full open, upgraded at its next save
        sc = BloomSidecar(path)
        fill, m_bits = sc.fill_fraction(), sc.m_bits
    if fill <= max_fill:
        return False
    _bloom.rebuild(
        spark, digest_index(spark, index_dir).select("digest"), path, m_bits=m_bits * growth
    )
    return True
