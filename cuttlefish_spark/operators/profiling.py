"""Data-profiling operators: one-pass column statistics.

A data-quality / catalog surface: given a table, emit one row per
column with null count, exact distinct count, and min/max rendered as
strings. The reference has no profiling at all (its only shape check
is the jsexpr? validation at meetup.rkt:92-95); this is the Layer-B
capability that replaces eyeballing JSON files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuttlefish_spark.io import load_table
from cuttlefish_spark.registry import query

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
]


def _col_oracle(c: str) -> str:
    return f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_value,
           CAST(MAX({c}) AS VARCHAR) AS max_value
    FROM orders
    """


@query(
    "profile_table",
    layer="B",
    oracle=" UNION ALL ".join(_col_oracle(c) for c in _PROFILE_COLS),
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile of `orders`: per column, null count,
    EXACT distinct count, and min/max (stringified so heterogeneous
    column types share one output schema).

    All five columns' aggregates are declared in a single agg() —
    Catalyst plans the multiple COUNT(DISTINCT)s as one Expand (each
    input row fans out once per distinct-aggregate) feeding ONE
    aggregation exchange, so the table is scanned exactly once however
    many columns are profiled; the oracle states the same answer as a
    per-column UNION ALL. The wide 1-row result is unpivoted to
    (column, stat) rows with an in-place Expand — no join, no second
    pass. Numeric min/max are computed on the native type and cast to
    string after, preserving numeric (not lexicographic) ordering."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__n_nulls"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__n_nulls").alias("n_nulls"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in _PROFILE_COLS
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")
