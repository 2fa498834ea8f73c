"""Simulate the verification driver end-to-end: import
__spark_entry__ under a VANILLA SparkSession (default configs — ANSI
on, whatever timezone the JVM has), run entry() + every queries()[name]
at sf0.01, and compare against oracle_sql() via DuckDB exactly like
CORRECTNESS_r{N}: row count, schema column names, order-insensitive
value hash.

Usage: python scripts/driver_sim.py [sf_dir] [--full ROUND]

--full N (r10 VERDICT item 10, the round-close mode): in addition to
the console report, write FULLCHECK_r{{N}}.json — the full-surface
sf0.01 hash verdict for EVERY registered query, committed alongside
the round's driver artifacts. With 220+ queries and a ~50-slot driver
window, the driver's own full recheck period is ~4.5 rounds; this
file closes the sf0.01-hash tier every round (the sf1 gate already
value-checks all queries at scale).
"""

from __future__ import annotations

import hashlib
import os
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(6)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(tuple(v)) if isinstance(v, (list, np.ndarray)) else str(v))
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return hashlib.md5(str(rows).encode()).hexdigest()


def check_artifacts_committed() -> list[str]:
    """Driver round artifacts MUST be committed the moment they exist —
    the staleness rotation reads COMMITTED CORRECTNESS files only, so an
    untracked one makes the next driver window re-prove the newest
    cohort instead of rotating to the stalest greens (recurred r7, r8,
    AND r9 — r9 VERDICT item 1 mandates this mechanical check)."""
    import re
    import subprocess

    out = subprocess.run(
        ["git", "-C", REPO, "status", "--porcelain"],
        capture_output=True,
        text=True,
        check=False,
    ).stdout
    bad = []
    for line in out.splitlines():
        status, _, path = line[:2], line[2], line[3:]
        if re.fullmatch(r"(CORRECTNESS|BENCH)_r\d+\.json", path) and "?" in status:
            bad.append(path)
    return bad


def main() -> None:
    untracked = check_artifacts_committed()
    if untracked:
        sys.exit(
            f"FAIL: driver round artifacts untracked: {untracked} — "
            "`git add` + commit them before anything else (the rotation "
            "reads committed files only; see README round close-out)."
        )
    argv = sys.argv[1:]
    full_round = None
    if "--full" in argv:
        i = argv.index("--full")
        try:
            full_round = int(argv[i + 1])
        except (IndexError, ValueError):
            sys.exit("usage: driver_sim.py [sf_dir] --full ROUND  (ROUND = int)")
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    # Vanilla session — deliberately NOT cuttlefish_spark.session.get_spark.
    # Semantics configs (ANSI, timezone, Arrow, nanos) stay at Spark
    # defaults: catching config-dependence bugs is this script's job.
    # RESOURCE sizing alone is overridable for larger-SF runs: at
    # sf0.1 the default 1g driver heap on local[8] GC-thrashes in
    # dedup_clusters' band join (observed: 30+ min of 136% CPU with no
    # task progress) — memory and core count change no query's answer.
    master = os.environ.get("SPARK_SIM_MASTER", "local[8]")
    mem = os.environ.get("SPARK_SIM_DRIVER_MEM", "1g")
    spark = (
        SparkSession.builder.master(master)
        .config("spark.driver.memory", mem)
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    n = e.entry(spark).count()
    print(f"entry() smoke: {n} rows")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    # ORACLE-cost skips for larger-SF runs (never engine skips): e.g.
    # dedup_clusters' DuckDB recursive-CTE closure is super-quadratic
    # on the sf0.1 clique graph (~510k symmetric edges) — the Spark
    # side finishes in ~40 s under a fully vanilla session while the
    # oracle did not return in 30+ min. Skipped names are reported
    # loudly; the canonical sf0.01 run never sets this.
    skip = set(filter(None, os.environ.get("SPARK_SIM_SKIP_ORACLE", "").split(",")))
    ok = bad = rows_only = 0
    report: dict[str, dict] = {}
    for name in sorted(qs):
        if name in skip:
            n_rows = qs[name](spark, sf_dir).count()
            print(f"{name:24s} SKIPPED-ORACLE (engine ran: {n_rows} rows)")
            report[name] = {"err": "oracle_skipped", "spark_rows": n_rows}
            rows_only += 1
            continue
        sdf = qs[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows")
            report[name] = {"err": "no_oracle", "spark_rows": len(sdf)}
            rows_only += 1
            continue
        odf = con.execute(oracles[name]).df()
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        count_ok = len(sdf) == len(odf)
        hash_ok = cols_ok and count_ok and value_hash(sdf) == value_hash(odf)
        status = "OK" if (cols_ok and count_ok and hash_ok) else "MISMATCH"
        if status == "OK":
            ok += 1
        else:
            bad += 1
        report[name] = {
            "rows_match": count_ok,
            "schema_match": cols_ok,
            "hash_match": hash_ok,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "err": None,
        }
        print(
            f"{name:24s} {status}  rows={len(sdf)}/{len(odf)} cols={cols_ok} hash={hash_ok}"
        )
    print(f"\n{ok} oracle-match, {rows_only} rows-only, {bad} MISMATCH")
    if full_round is not None:
        import json
        import subprocess

        out = Path(REPO) / f"FULLCHECK_r{full_round}.json"
        out.write_text(json.dumps(report, indent=1, sort_keys=True) + "\n")
        # Stage the artifact the moment it exists (r11 VERDICT item 1:
        # two straight rounds left round artifacts untracked at close —
        # the round-close scripts now stage their own outputs).
        res = subprocess.run(["git", "-C", REPO, "add", str(out)])
        if res.returncode != 0:
            print(f"WARNING: git add exited {res.returncode} — stage manually")
        print(f"wrote + staged {out} ({len(report)} queries)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
