"""Layer B — the generic relational operator surface the reference
lacks entirely (SURVEY.md §2.B: no joins, aggregations, windows, sorts,
or set ops anywhere in /root/reference). All built-ins; zero custom
execution code — Catalyst picks physical strategies (broadcast vs
shuffle join, partial aggregation, AQE coalescing/skew splitting).

Scale notes are per-query docstrings; the common rules:
- dims (region/nation/customer/supplier/part) broadcast — the fact
  table never shuffles for a dim join;
- aggregates go through DECIMAL so results are partition-order
  independent (identical on 32 cores or 1000 executors);
- every ORDER BY carries a total tie-break so top-k membership is
  deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cuttlefish_spark.functions import dec_sum
from cuttlefish_spark.io import load_table
from cuttlefish_spark.registry import query


@query(
    "filter_pushdown",
    layer="B",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05
      AND l_quantity < 24
    """,
)
def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushdown over the fact table.

    The plan must show PushedFilters on the parquet scan and a pruned
    ReadSchema (asserted in tests/test_plans.py) — at 100 TB this is
    the difference between scanning 5 columns of a year vs the whole
    table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate")


@query(
    "hash_join",
    layer="B",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate,
           c.c_name, c.c_mktsegment
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 150000
    """,
)
def hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders JOIN customer equi-join.

    Catalyst picks broadcast-hash while customer fits the 64 MiB
    threshold and falls back to shuffled hash / sort-merge beyond it —
    exactly the right behavior as the dim grows with SF. The selective
    orders predicate is pushed below the join into the scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "o_orderdate", "c_name", "c_mktsegment"
    )


@query(
    "broadcast_join",
    layer="B",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x 3 broadcast dims -> grouped revenue.

    Explicit broadcast() hints: supplier/nation/region are tiny at any
    SF, so the 100 TB lineitem side never shuffles for the joins — the
    only shuffle is the final (r_name, n_name) aggregation, which is
    25 groups after map-side partial agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), alias="revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "semi_anti_join",
    layer="B",
    oracle="""
    SELECT c_custkey, c_name, 'has_orders' AS status
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, c_name, 'no_orders' AS status
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti: customers with and without orders.

    Semi/anti joins never materialize right-side columns — at scale the
    orders side reduces to a distinct-key broadcast/shuffle of just
    o_custkey (column-pruned at the scan).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = c.c_custkey == o.o_custkey
    has = c.join(o, cond, "left_semi").select(
        "c_custkey", "c_name", F.lit("has_orders").alias("status")
    )
    without = c.join(o, cond, "left_anti").select(
        "c_custkey", "c_name", F.lit("no_orders").alias("status")
    )
    return has.unionByName(without)


@query(
    "agg_groupby",
    layer="B",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6)))
               AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (sum/avg/count by flags).

    Map-side partial aggregation means the shuffle carries ~|groups| x
    |partitions| rows regardless of input size; decimal sums make the
    result independent of partition count/order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    price = F.col("l_extendedprice")
    disc_price = price * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(qty, alias="sum_qty"),
            dec_sum(price, alias="sum_base_price"),
            dec_sum(disc_price, alias="sum_disc_price"),
            dec_sum(charge, alias="sum_charge"),
            (F.sum(F.round(qty * 1_000_000).cast("long")) / F.lit(1e6) / cnt).alias(
                "avg_qty"
            ),
            (F.sum(F.round(price * 1_000_000).cast("long")) / F.lit(1e6) / cnt).alias(
                "avg_price"
            ),
            cnt.alias("count_order"),
        )
    )


@query(
    "agg_rollup",
    layer="B",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal,
           CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over region -> nation with grouping_id.

    Rollup expands to grouping sets before the single shuffle; dims are
    broadcast so the customer fact side stays put.
    """
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dec_sum(F.col("c_acctbal"), alias="total_acctbal"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


@query(
    "distinct_exact",
    layer="B",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    """,
)
def distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column count-distinct (expands to one shuffle per
    distinct column via Spark's expand-and-aggregate rewrite)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "distinct_approx",
    layer="B",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts_exact,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders_exact,
           TRUE AS parts_err_lt_10pct,
           TRUE AS orders_err_lt_10pct
    FROM lineitem
    """,
)
def distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approx count-distinct next to the exact values.

    DuckDB's approx_distinct uses a different sketch, so the raw
    estimates can't hash-match — instead the ERROR BOUND is the checked
    contract (the property that makes a sketch usable): the estimate
    must land within 10% (2x the default 5% rsd) of the exact count,
    emitted as a boolean the oracle states as TRUE. Spark's HLL++ is
    deterministic for a given column, so the boolean is stable, and a
    broken sketch (or a tolerance regression) flips it and fails the
    hash. At 100 TB the approx path is the one you actually run: one
    pass, no expand, fixed-size sketch per partition merged through
    one shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Exact and approx are computed in SEPARATE aggregates joined on a
    # single row: mixing countDistinct with approx_count_distinct in
    # one agg forces an Expand-based plan where every expanded row
    # merges an HLL buffer — measured 20x slower at sf0.1. Two
    # independent single-shuffle aggs + a 1x1 cross join is the plan
    # you want at any scale.
    exact = li.agg(
        F.countDistinct("l_partkey").alias("n_parts_exact"),
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
    )
    approx = li.agg(
        F.approx_count_distinct("l_partkey").alias("n_parts_approx"),
        F.approx_count_distinct("l_orderkey").alias("n_orders_approx"),
    )
    err = lambda a, x: (  # noqa: E731
        F.abs(F.col(a) - F.col(x)) * 10 < F.col(x)
    )
    return exact.crossJoin(approx).select(
        "n_parts_exact",
        "n_orders_exact",
        err("n_parts_approx", "n_parts_exact").alias("parts_err_lt_10pct"),
        err("n_orders_approx", "n_orders_exact").alias("orders_err_lt_10pct"),
    )


@query(
    "window_rank",
    layer="B",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS BIGINT) AS rk
    FROM orders
    QUALIFY rk <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number window.

    One shuffle on the partition key; the rank filter is evaluated
    streaming per partition (no full sort of the table, only per-key
    sorted groups).
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "window_running",
    layer="B",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per user (unbounded-preceding frame).

    The prefix sum runs through DECIMAL: double window-sums are
    evaluation-order dependent (DuckDB uses a segment tree, Spark a
    sequential accumulator) but exact decimal arithmetic is not — the
    same reproducibility rule as the grouped aggregates, applied to
    frames. One shuffle on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.round(F.col("value") * 1_000_000).cast("long")).over(w) / F.lit(
        1e6
    )
    return ev.select("user_id", "event_id", "ts", running.alias("running_value"))


@query(
    "sessionize",
    layer="B",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, event_id, ts, value,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) AS TIMESTAMP) AS session_end,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization (batch form of session windows).

    The lag -> flag -> cumulative-sum -> groupBy chain reuses ONE
    partitioning: both windows and the final groupBy key on user_id, so
    Spark plans a single shuffle for all four steps. The streaming
    twin (F.session_window + watermark) lives in
    cuttlefish_spark.streaming.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap_ms > 1800000), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dec_sum(F.col("value"), alias="session_value"),
    )


@query(
    "tumbling_window",
    layer="B",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour tumbling aggregates (batch form of F.window).

    Uses the real F.window operator (not date_trunc) so the same
    expression works under readStream + watermark; the struct is
    projected to its start bound for the oracle-comparable shape.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum(F.col("value"), alias="total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "set_ops",
    layer="B",
    oracle="""
    SELECT user_id, 'click_and_purchase' AS segment FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT user_id, 'click_only' AS segment FROM (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over event-type slices, tagged and unioned.

    Spark plans both as joins over the distinct sets (left_semi /
    left_anti under the hood) — single-column shuffles on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both = clickers.intersect(buyers).select(
        "user_id", F.lit("click_and_purchase").alias("segment")
    )
    only = clickers.exceptAll(buyers).select("user_id", F.lit("click_only").alias("segment"))
    return both.unionByName(only)


@query(
    "topk_orders",
    layer="B",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 by totalprice.

    orderBy().limit() compiles to TakeOrderedAndProject — each
    partition keeps only its top 100 and the driver merges, so no
    global sort materializes even at 100 TB. Tie-break on o_orderkey
    makes membership deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )
