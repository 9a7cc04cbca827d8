#!/usr/bin/env python
"""Dump .explain("formatted") for headline (or named) queries to plans/<tag>/.

Mirrors bench.py's session posture (AQE off, 64 MB broadcast threshold,
shuffle partitions = cores/4) so the captured plans are the ones the bench
actually executes.

Usage: python scripts/dump_plans.py <tag> [query ...]
  writes plans/<tag>/<query>_<suffix>.txt ; suffix via PLAN_SUFFIX (default
  'before').
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

from consensource_sds_spark.queries import REGISTRY, all_queries


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{n_cpus}]")
        .appName("plan-dump")
        .config("spark.sql.shuffle.partitions", str(max(4, n_cpus // 4)))
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    all_queries()
    if not names:
        import bench

        names = bench.HEADLINE
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
