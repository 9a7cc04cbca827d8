"""Driver correctness-gate emulation (see .claude/skills/verify/SKILL.md).

Fresh-process check that mirrors the per-round driver gate: import
__spark_entry__.py by path, smoke-run entry(spark), then run every
queries() entry at sf0.01 and hash-compare against oracle_sql() via DuckDB
views over the same parquet files.

Hash recipe (must match the driver): sort columns by name, int->int64,
float->float64 rounded to 9 decimals, stringify the rest, sort rows,
md5 of CSV.

Runs Spark with a HOSTILE session timezone (America/Los_Angeles) so any
query relying on ambient UTC fails here before it fails in the gate.

Usage: python scripts/verify_gate.py [query_name ...]
  (no args = all queries; exits non-zero on any mismatch)

``SPARK_GRAFT_GATE_SF`` overrides the table directory — point it at a
hostile fixture (``sources/hostile.py``) to sweep the registry over the
input domains the driver's testdata never exercises.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from consensource_sds_spark.sql import INPUT_TABLES as TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")


def _canon_rows(df: pd.DataFrame) -> tuple[list[str], str]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(9)
        else:
            df[c] = s.astype(str)
    rows = sorted(df.to_csv(index=False, header=False).splitlines())
    schema = ",".join(f"{c}:{df[c].dtype}" for c in df.columns)
    return rows, schema


def canon_hash(df: pd.DataFrame) -> tuple[str, int, str]:
    rows, schema = _canon_rows(df)
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return h, len(rows), schema


def main() -> int:
    only = set(sys.argv[1:])
    repo = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location("__spark_entry__", repo / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "America/Los_Angeles")  # hostile
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    # smoke: entry()
    n = len(mod.entry(spark).collect())
    print(f"entry(): OK ({n} rows)")

    qs, oracles = mod.queries(), mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name silently matching nothing would print a false
        # 'PASS: 0 failures' without running anything
        print("ERROR: unknown query name(s):", ", ".join(sorted(unknown)))
        return 2
    failures, t_all = [], time.perf_counter()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            spark_pdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(spark_pdf)} rows ({time.perf_counter()-t0:.1f}s)")
            if len(spark_pdf) == 0:
                print(f"  WARN {name}: 0 rows")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            continue
        sh, sn, ss = canon_hash(spark_pdf)
        dh, dn, ds = canon_hash(duck_pdf)
        dt = time.perf_counter() - t0
        if sh == dh:
            print(f"PASS {name}: {sn} rows ({dt:.1f}s)")
        else:
            failures.append(name)
            print(f"FAIL {name}: hash mismatch ({dt:.1f}s)")
            print(f"  spark: rows={sn} schema={ss}")
            print(f"  duck : rows={dn} schema={ds}")
            if sn == dn and sn > 0:
                # diff the SAME canonicalized rows the hash is built from:
                # raw astype(str) frames flag float-repr artifacts
                # (0.30000000000000004 vs 0.3) as the first diff row
                a, _ = _canon_rows(spark_pdf)
                b, _ = _canon_rows(duck_pdf)
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"  first diff row {i}:\n    spark: {x[:200]}\n    duck : {y[:200]}")
                        break
    print(f"\n{'FAIL' if failures else 'PASS'}: {len(failures)} failures in {time.perf_counter()-t_all:.0f}s")
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
