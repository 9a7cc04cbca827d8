#!/usr/bin/env python
"""Isolated per-stage scaling measurement (guide §1: measure first, noop
sink, labeled jobs). Mirrors bench.py's session config exactly so numbers
are comparable to the bench's scaling block.

Usage: python scripts/iso_stage.py <query> [<query> ...]
  env: ISO_FACTORS="1,10" ISO_RUNS=3 ISO_BASE_DOCS=5000 ISO_BASE_VECS=2000
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession


def main() -> None:
    names = sys.argv[1:]
    factors = [int(x) for x in os.environ.get("ISO_FACTORS", "1,10").split(",")]
    runs = int(os.environ.get("ISO_RUNS", "3"))
    base_docs = int(os.environ.get("ISO_BASE_DOCS", "5000"))
    base_vecs = int(os.environ.get("ISO_BASE_VECS", "2000"))
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{n_cpus}]")
        .appName("iso-stage")
        .config("spark.sql.shuffle.partitions", str(max(4, n_cpus // 4)))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.locality.wait", "0")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "65536")
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from consensource_sds_spark.queries import REGISTRY, all_queries, drop_pool
    from consensource_sds_spark.sources.synth import write_corpus

    all_queries()
    import shutil

    work = tempfile.mkdtemp(prefix="iso_stage_")
    try:
        dirs = {}
        for s in factors:
            dirs[s] = write_corpus(
                spark, os.path.join(work, f"scale{s}"), base_docs * s, base_vecs * s
            )
        for name in names:
            fn = REGISTRY[name].fn
            res = {}
            for s in factors:
                drop_pool(spark)
                spark.catalog.clearCache()
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
                best = float("inf")
                for _ in range(runs):
                    spark.sparkContext.setJobDescription(f"iso {name} x{s}")
                    t0 = time.perf_counter()
                    fn(spark, dirs[s]).write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                res[s] = best
            ratio = res[factors[-1]] / res[factors[0]] if res[factors[0]] > 0 else None
            print(
                f"{name}: "
                + " ".join(f"t{s}={res[s]:.3f}s" for s in factors)
                + (f" ratio={ratio:.2f}" if ratio else "")
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
