#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_wallclock_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced with the noop sink (full execution, no driver
collect). The first query absorbs JVM/codegen warmup; a warmup scan runs
first so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import SparkSession

from consensource_sds_spark.queries import REGISTRY, all_queries

HEADLINE = [
    "q01_pricing_summary",
    "q02_filter_pushdown",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q07_star_join_parts",
    "q10_window_topk_per_group",
    "q11_window_running_sum",
    "q15_rollup",
    "q25_semi_join",
    "q41_maxby_lastwins",
    "q43_scd2_versions",
    "x01_dedup_exact",
    "x02_minhash_signatures",
    "x05_simhash",
    "x10_cosine_topk",
    "x20_token_stats",
    "x21_quality_score",
    "x23_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("consensource-sds-spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # split the single-file-per-table testdata across cores (10 MB
        # lineitem would otherwise scan in ~3 tasks on 32 cores)
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # pass 1: cold (includes per-query planning + whole-stage codegen
    # compilation); pass 2: steady state — the number comparable to a
    # long-running warm engine, reported per query.
    cold: dict[str, float] = {name: run(name) for name in HEADLINE}
    timings: dict[str, float] = {name: run(name) for name in HEADLINE}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wallclock_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cold_total_sec": round(sum(cold.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
