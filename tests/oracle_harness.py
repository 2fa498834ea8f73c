"""Local twin of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet, compare row count, sorted
column names, and exact values (order-insensitive, like the driver's
value-hash). Stricter-than-driver float handling: exact equality first,
with a diagnostic of max abs diff when it fails.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from cuttlefish_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str, pragmas: list[str] | None = None) -> pd.DataFrame:
    """`pragmas` (e.g. SET temp_directory/memory_limit) is for the
    LARGE-scale gates only — the driver-parity path passes none, so the
    local harness stays exactly as strict/vanilla as the driver."""
    con = duckdb.connect()
    for p in pragmas or []:
        con.execute(p)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    # Deliberately NO list->tuple rescue here: the driver's
    # canonicalizer does a raw pandas sort_values over all columns and
    # throws `unhashable type: 'list'` on any array/map-typed output
    # column (r3 driver failure on map_functions). Keeping the local
    # harness exactly as strict makes that failure class impossible to
    # ship — queries must export scalars (array_join / to_json /
    # element_at), never raw arrays.
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count spark={len(spark_df)} oracle={len(oracle_df)}"
    )
    s, o = _canon(spark_df), _canon(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sa = sv.astype("float64").to_numpy()
            oa = ov.astype("float64").to_numpy()
            both_nan = np.isnan(sa) & np.isnan(oa)
            eq = (sa == oa) | both_nan
            if not eq.all():
                bad = np.where(~eq)[0][:5]
                diffs = [
                    (i, sa[i], oa[i], abs(sa[i] - oa[i]) if not math.isnan(sa[i] - oa[i]) else None)
                    for i in bad
                ]
                raise AssertionError(f"{name}.{c}: {int((~eq).sum())} value diffs, e.g. {diffs}")
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                bad = eq[~eq].index[:5]
                diffs = [(int(i), sv[i], ov[i]) for i in bad]
                raise AssertionError(f"{name}.{c}: {int((~eq).sum())} value diffs, e.g. {diffs}")
