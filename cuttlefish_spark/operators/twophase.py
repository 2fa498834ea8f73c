"""Two-phase distributed rank — the sanctioned replacement for
`row_number()/rank() OVER (PARTITION BY <low-card key> ORDER BY ...)`.

A window partitioned only by a ~5-value key (lang, source, event_type,
label) funnels each group's ENTIRE corpus through one task's sort at
scale — the anti-pattern `tests/test_plans.py::
test_no_low_card_ordered_windows` exists to catch. The distributed
shape, used verbatim by ccnet_perplexity_buckets /
adaptive_length_cutoff / sequence_packing and factored here for new
call sites:

1. `repartitionByRange` on (key, *order) — every task owns a
   contiguous slice of ONE key's total order (a boundary partition can
   straddle keys; per-(pid, key) bookkeeping handles that).
2. Collect O(partitions x |keys|) slice counts to the driver, fold
   them in (pid, key) order into exclusive prefix offsets + per-key
   totals (a few hundred rows — NOT data).
3. Broadcast the offset frame back; `row_number() OVER (PARTITION BY
   pid, key ORDER BY ...)` + offset = the exact global per-key rank.

The result is identical for ANY range-boundary placement because the
caller promises (key, *order) is a strict total order. One shuffle
feeds both jobs (slice counts, then the windowed pass) via
localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def two_phase_rank(
    spark: SparkSession,
    df: DataFrame,
    key: str,
    order_cols: list[Column],
    key_type: str = "string",
) -> DataFrame:
    """Return `df` plus `rn` (1-based global rank of the row within its
    `key` group under `order_cols`) and `n` (the group's total count),
    both BIGINT, computed with no per-group single-task sort.

    `order_cols` must make (key, *order_cols) a strict total order
    (include a unique tiebreak column); `key` must be non-null (the
    driver-side fold sorts raw key values).
    """
    nparts = spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(nparts, F.col(key), *order_cols)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    raw = [
        (r["pid"], r[key], r["cnt"])
        for r in part.groupBy("pid", key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    # A NULL key would be silently dropped by the offset equi-join
    # below (and break the driver-side sort) — fail loudly instead;
    # callers coalesce to a sentinel if NULL groups are meaningful.
    assert all(k is not None for _, k, _c in raw), f"NULL {key} in two_phase_rank"
    slices = sorted(raw)
    totals: dict = {}
    rows = []
    for pid, k, cnt in slices:  # pid ascending = rank order per key
        rows.append((pid, k, totals.get(k, 0)))
        totals[k] = totals.get(k, 0) + cnt
    off_df = spark.createDataFrame(
        [(p, k, o, totals[k]) for p, k, o in rows],
        f"pid int, {key} {key_type}, off bigint, n bigint",
    )
    w = Window.partitionBy("pid", key).orderBy(*order_cols)
    return part.join(F.broadcast(off_df), ["pid", key]).withColumn(
        "rn", (F.row_number().over(w) + F.col("off")).cast("long")
    )
