"""Schema-pinned JSONL corpus source with corrupt-record quarantine.

Raw training corpora arrive as newline-delimited JSON (one document per
line, often mixed-quality). The production-safe read discipline:

- the schema is ALWAYS supplied, never inferred — inference is an extra
  full pass over 100 TB and silently widens types when a late file
  disagrees;
- PERMISSIVE mode + ``columnNameOfCorruptRecord`` routes malformed lines
  into a quarantine DataFrame instead of failing the job or silently
  dropping them (the source-side twin of the pipeline's W5 dead-letter
  path);
- the split is computed from one parse: Spark refuses to filter on only
  the internal corrupt-record column of a lazy JSON scan, so the parsed
  frame is persisted first. At cluster scale the same one-pass contract is
  kept by materializing the parsed frame to parquet and deriving both
  splits from that staging table (the SCD2 store's staging rule).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


@dataclass
class JsonlRead:
    """Handle owning the persisted parse behind both splits. Unpack it like
    the former tuple (``good, quarantine = read_jsonl(...)``) or use it as a
    context manager; call :meth:`unpersist` (or exit the ``with`` block)
    when done with BOTH frames, else the cached parse lives for the session."""

    good: DataFrame
    quarantine: DataFrame
    _parsed: DataFrame

    def unpersist(self) -> None:
        self._parsed.unpersist()

    def __enter__(self) -> JsonlRead:
        return self

    def __exit__(self, *exc) -> None:
        self.unpersist()

    def __iter__(self):
        return iter((self.good, self.quarantine))


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> JsonlRead:
    """Read JSONL at ``path`` against a pinned ``schema``; return a
    :class:`JsonlRead` whose ``good`` carries exactly the schema's columns
    and ``quarantine`` the raw offending line for replay/repair.

    ``_corrupt_record`` is a reserved name here: a caller schema that
    already contains it (e.g. a quarantine-replay schema built from a
    previous read's output) would otherwise produce a duplicate field and
    an ambiguous reference on the split filters — rejected up front with
    a clear error instead."""
    if any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(
            f"schema must not contain the reserved column {CORRUPT_COL!r}; "
            "rename it (it is this reader's quarantine routing column)"
        )
    with_corrupt = StructType(
        [*schema.fields, StructField(CORRUPT_COL, StringType(), True)]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    ).persist()
    good = df.filter(F.col(CORRUPT_COL).isNull()).select(
        *[f.name for f in schema.fields]
    )
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return JsonlRead(good, quarantine, df)
