"""consensource_sds_spark — a PySpark-native analytics engine with the
capabilities of the ConsenSource State Delta Subscriber (SDS).

The reference (/root/reference, Rust) is a streaming CDC/ETL service that
subscribes to a Sawtooth validator's event stream, decodes protobuf state
deltas for the ``certificate_registry`` family, and maintains a
block-versioned (SCD Type-2) relational mirror in Postgres
(/root/reference/src/event_handler.rs, subscriber.rs).

This package re-expresses that pipeline Spark-first:

- every transform is a pure ``DataFrame -> DataFrame`` function, so the same
  code runs under ``spark.read`` (batch/backfill/tests) and
  ``spark.readStream`` + ``foreachBatch`` (live);
- fixed ``StructType`` schemas (:mod:`.schemas`) mirror the reference's
  compile-time protobuf schemas;
- protobuf decode is the only Python-side step (Arrow-batched pandas UDFs,
  :mod:`.codec`); filters, explodes, enum decodes, NULL normalization, SCD2
  stamping and merging are all JVM-side Catalyst plans;
- the SCD2 sink (:mod:`.operators.scd2`) implements close-then-insert MERGE,
  delete tombstones and fork rewind over partitioned Parquet
  (``state=current`` / ``state=closed``), the no-Delta equivalent of a
  Delta MERGE.

On top of the mirrored tables the package exposes the full relational query
surface (:mod:`.queries`) plus large-scale training-data-pipeline operators:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search, text analysis (:mod:`.operators`, :mod:`.functions`).
"""

from consensource_sds_spark.schemas import MAX_BLOCK_NUM

__all__ = ["MAX_BLOCK_NUM"]
__version__ = "0.1.0"
