#!/usr/bin/env python
"""Measure the DuckDB oracle wall-clock for the bench headline queries —
the BASELINE.md performance yardstick (target: Spark within 2x at sf0.1)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE
from consensource_sds_spark.queries import REGISTRY, all_queries
from consensource_sds_spark.sql import INPUT_TABLES as TABLES


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    all_queries()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # same methodology as bench.py: one cold pass, then min of five warm
    # passes per query (the host runs a background build harness, so any
    # single pass can catch CPU-steal artifacts)
    def run(name: str) -> float:
        t0 = time.perf_counter()
        con.execute(REGISTRY[name].oracle).fetchall()
        return round(time.perf_counter() - t0, 3)

    names = [n for n in HEADLINE if REGISTRY[n].oracle is not None]
    for name in names:
        run(name)
    warm = [{name: run(name) for name in names} for _ in range(5)]
    timings = {name: min(w[name] for w in warm) for name in names}
    print(json.dumps({"engine": "duckdb", "total_sec": round(sum(timings.values()), 3), "queries": timings}))


if __name__ == "__main__":
    main()
