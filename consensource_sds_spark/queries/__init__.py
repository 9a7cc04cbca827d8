"""Query surface registry.

Every query is registered as (name -> fn(spark, sf_dir) -> DataFrame) with an
optional DuckDB oracle SQL string over the same parquet tables. The driver
compares Spark vs oracle at sf0.01 (row count + schema + order-insensitive
value hash), so:

- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded on both sides (cross-engine
  summation order differs in the last ULPs);
- timestamps are projected as epoch microseconds (Spark ``unix_micros`` /
  DuckDB ``epoch_us``) — BIGINT hashes identically everywhere;
- DuckDB ``SUM(BIGINT)`` returns HUGEINT, so oracle SQL casts back to BIGINT
  where Spark returns LongType.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver runs the weaker rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn, oracle)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # parquet naive timestamps read as TIMESTAMP_NTZ; pinning the session tz
    # to UTC makes NTZ->TZ casts identity so epoch projections match the
    # DuckDB oracle no matter what tz the host session was created with.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark 4 rejects outright; read it as raw nanos (legacy conf, runtime
    settable) and expose ``ts_us`` (epoch microseconds, BIGINT) — integer
    ``div`` so no double-precision loss at 1.7e18. DuckDB truncates the same
    column to microseconds on read, so ``ts_us`` == ``epoch_us(ts)``."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts_us", F.expr("ts div 1000"))


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # import side-effect: populate REGISTRY
    from consensource_sds_spark.queries import extensions, relational  # noqa: F401

    return {name: qd.fn for name, qd in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    from consensource_sds_spark.queries import extensions, relational  # noqa: F401

    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
