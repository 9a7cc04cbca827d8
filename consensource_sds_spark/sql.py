"""The spark.sql face of the engine — what replaces the reference stack's
"query Postgres" workflow (consensource-api/database reads the mirrored
tables with plain SQL; SURVEY §2.7).

Two registration entry points, after which any ANSI SQL the reference's
consumers run works verbatim via ``spark.sql(...)``:

- :func:`register_input_tables` — the analytic star schema + corpus
  tables as temp views (pooled/re-laid through ``queries.load``, so SQL
  users get the same scan behavior as the registry queries);
- :func:`register_store_views` — the SCD2 store's tables three ways per
  sink table: ``<t>`` (current state — ``end_block_num = MAX_BLOCK``,
  the reference's steady-state read, event_handler.rs's open rows),
  ``<t>_history`` (every version), and with ``as_of_block`` also
  ``<t>_asof`` (time travel: versions live at that block — the
  reference reconstructs this by replay; here it is one predicate).

Views are lazy plans, but store views PIN the manifest generation they
were registered against (``current()`` lists that generation's concrete
bucket directories into the plan): re-register after ``apply()`` — and
before a compaction prunes superseded directories — to see a newer
generation. The input-table views have no such pinning (their paths are
stable).

Scale: a view is just a named plan — predicates SQL users write are
pushed into the store's parquet scans by Catalyst exactly as the
DataFrame API's would be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from consensource_sds_spark import schemas
from consensource_sds_spark.operators.scd2 import ScdParquetStore
from consensource_sds_spark.queries import load

def _dir_exists(spark: SparkSession, path: str) -> bool:
    """Existence through the Hadoop FileSystem of ``path`` — an
    ``os.path.isdir`` here is always False for s3a://, hdfs:// etc. and
    would silently hide exactly the quarantine/sidecar views these
    registrars exist to surface."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


#: the driver testdata tables (TESTDATA.md)
INPUT_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_input_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> list[str]:
    """Register the analytic input tables as temp views named after the
    tables; returns the registered names. ``events`` gains the ``ts_us``
    column exactly as ``queries.load`` exposes it."""
    names = []
    for t in (INPUT_TABLES if tables is None else tables):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    return names


def register_store_views(
    spark: SparkSession, store: ScdParquetStore, as_of_block: int | None = None
) -> list[str]:
    """Register every SCD2 sink table as SQL views: ``<t>`` (current),
    ``<t>_history`` (all versions), and ``<t>_asof`` when ``as_of_block``
    is given. Views capture the manifest generation at registration time —
    call again after ``apply()`` to see a newer generation."""
    names: list[str] = []
    for t in schemas.SINK_TABLES:
        store.current(t).createOrReplaceTempView(t)
        store.read(t).createOrReplaceTempView(f"{t}_history")
        names += [t, f"{t}_history"]
        if as_of_block is not None:
            store.as_of(t, as_of_block).createOrReplaceTempView(f"{t}_asof")
            names.append(f"{t}_asof")
    store.blocks().createOrReplaceTempView("blocks")
    names.append("blocks")
    return names


def register_corpus_views(spark: SparkSession, out_dir: str) -> list[str]:
    """Register a streaming-ingested corpus (streaming/corpus_ingest.py)
    and its sidecars as SQL views: ``corpus`` (the sharded documents,
    partition columns included), ``corpus_digest_index``, and — when the
    corresponding stage ran — ``corpus_band_index``, ``corpus_fp_index``
    (containment postings) and ``corpus_quarantine`` (the dead-letter
    lane; on by default for non-parquet sources — a monitoring query door
    that can't see the quarantine hides exactly the rows an operator
    audits)."""
    names = []
    spark.read.parquet(out_dir).createOrReplaceTempView("corpus")
    names.append("corpus")
    for suffix in ("_digest_index", "_band_index", "_fp_index", "_quarantine"):
        d = out_dir.rstrip("/") + suffix
        if _dir_exists(spark, d):
            spark.read.parquet(d).createOrReplaceTempView("corpus" + suffix)
            names.append("corpus" + suffix)
    return names


def register_media_views(spark: SparkSession, out_dir: str) -> list[str]:
    """Register a streaming media ingest's lanes (streaming/media_ingest)
    as SQL views: ``media_features`` and — when any payload was
    undecodable — ``media_quarantine``. The consumers' workflow is the
    same as the document corpus: query the continuously-maintained
    mirror with plain spark.sql."""
    names = []
    f = out_dir.rstrip("/") + "/features"
    if _dir_exists(spark, f):
        spark.read.parquet(f).createOrReplaceTempView("media_features")
        names.append("media_features")
    q = out_dir.rstrip("/") + "_quarantine"
    if _dir_exists(spark, q):
        spark.read.parquet(q).createOrReplaceTempView("media_quarantine")
        names.append("media_quarantine")
    return names


def register_ann_views(spark: SparkSession, index_dir: str) -> list[str]:
    """Register a standing IVF ANN index (streaming/ann_ingest) as SQL
    views: ``ann_index`` (vectors with their cell/batch partition
    columns) and ``ann_centroids`` — the inspection surface for cell
    balance / drift queries."""
    names = []
    if _dir_exists(spark, index_dir):
        spark.read.parquet(index_dir).createOrReplaceTempView("ann_index")
        names.append("ann_index")
        c = index_dir.rstrip("/") + "/_centroids"
        if _dir_exists(spark, c):
            spark.read.parquet(c).createOrReplaceTempView("ann_centroids")
            names.append("ann_centroids")
    return names


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin alias so callers can treat this module as the query door."""
    return spark.sql(query)


__all__ = [
    "register_input_tables",
    "register_store_views",
    "register_corpus_views",
    "register_media_views",
    "register_ann_views",
    "sql",
    "INPUT_TABLES",
]
