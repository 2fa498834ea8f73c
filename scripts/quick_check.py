"""Vanilla-session oracle check for NAMED queries only — the fast
inner loop while iterating on one operator (driver_sim.py remains the
full pre-commit gate).

Usage: python scripts/quick_check.py name [name ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import duckdb
from pyspark.sql import SparkSession

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts.driver_sim import TABLES, value_hash  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    master = os.environ.get("SPARK_SIM_MASTER", "local[8]")
    spark = (
        SparkSession.builder.master(master)
        .appName("quick-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, sf_dir).toPandas()
        t1 = time.time()
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows  [{t1-t0:.1f}s]")
            continue
        odf = con.execute(oracles[name]).df()
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        count_ok = len(sdf) == len(odf)
        hash_ok = cols_ok and count_ok and value_hash(sdf) == value_hash(odf)
        status = "OK" if hash_ok else "MISMATCH"
        bad += status != "OK"
        print(
            f"{name:24s} {status}  rows={len(sdf)}/{len(odf)} cols={cols_ok}"
            f" hash={hash_ok}  [{t1-t0:.1f}s spark]"
        )
        if not cols_ok:
            print(f"  spark cols: {sorted(sdf.columns)}")
            print(f"  oracle cols: {sorted(odf.columns)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
