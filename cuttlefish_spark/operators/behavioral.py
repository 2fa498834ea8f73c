"""Behavioral / product-analytics operators: ordered funnel, cohort
retention, SCD2 run-collapse, hopping windows.

These are the event-sequence queries every analytics engine is asked
for the moment it holds an events table — the reference's pipeline
ends at keyed JSON fan-out (api-runner.rkt:39-52), so this whole
family is Layer-B capability the Spark engine adds on top. Each is
expressed with joins/windows that shuffle ONCE on user_id (the
natural partitioning key at 100 TB) and never collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuttlefish_spark.functions import dec_sum
from cuttlefish_spark.io import load_table, register_views
from cuttlefish_spark.registry import query


@query(
    "funnel_steps",
    layer="B",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, v.first_view, MIN(e.ts) AS first_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.first_view
        GROUP BY e.user_id, v.first_view
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS first_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.first_click
        GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(v.first_view AS TIMESTAMP) AS first_view,
           CAST(c.first_click AS TIMESTAMP) AS first_click,
           CAST(p.first_purchase AS TIMESTAMP) AS first_purchase
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: per user,
    the first view, the first click AT OR AFTER that view, and the
    first purchase at or after that click. The ordering constraint is
    what distinguishes a funnel from three independent mins — a click
    that precedes the user's first view must not count.

    Plan: three aggregations chained by equi-joins, all keyed on
    user_id, so every shuffle lands on the same partitioning (AQE
    reuses the exchange where it can) and each stage's input shrinks
    to only the users still in the funnel. No window over the full
    event list, no per-user array materialization — at 100 TB a user's
    events never need to fit anywhere together; only their per-stage
    mins travel."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "first_click"), "user_id")
        .filter(F.col("ts") >= F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.join(c.select("user_id", "first_click"), "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "first_view", "first_click", "first_purchase")
    )


@query(
    "cohort_retention",
    layer="B",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
        FROM events
    )
    SELECT CAST(f.cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) / 7 AS BIGINT)
               AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active_users
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the ISO week
    of their first event; each later active week increments that
    cohort's count at its week-offset. The canonical
    product-analytics rollup (the diagonal is cohort size, each row a
    retention curve).

    Plan: first-event agg and distinct-activity both shuffle on
    user_id, the join is co-partitioned on the same key, and the final
    small rollup on (cohort_week, offset) aggregates partial map-side.
    date_trunc('week') is ISO-Monday on both engines, so offsets are
    exact multiples of 7 days and the integer division is lossless."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.col("cohort_week").alias("cohort_week"),
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


_SCD2_SQL = """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, ts,
               SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS run_id
        FROM ordered
    ),
    collapsed AS (
        SELECT user_id, event_type,
               CAST(MIN(ts) AS TIMESTAMP) AS valid_from,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT user_id, event_type, valid_from, n_events,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from) AS valid_to,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from) IS NULL AS is_current
    FROM collapsed
"""


@query("scd2_collapse", layer="B", oracle=_SCD2_SQL)
def scd2_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 build: collapse each user's event stream into
    validity intervals of their consecutive event_type runs —
    lag-change flag -> running-sum run id -> group -> lead() closes
    each interval with the next one's start (NULL = current row).
    This is the standard gaps-and-islands construction for building a
    slowly-changing dimension out of a change log.

    All four steps (lag, running sum, group, lead) partition by
    user_id: Catalyst plans ONE exchange and sorts once for the two
    frame-compatible windows. The SQL is shared syntax — the identical
    text runs on Spark and the DuckDB oracle."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_SCD2_SQL)


@query(
    "hopping_window",
    layer="B",
    oracle="""
    SELECT CAST(ws AS TIMESTAMP) AS w_start,
           CAST(ws + INTERVAL '1 hour' AS TIMESTAMP) AS w_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (
        SELECT e.value,
               time_bucket(INTERVAL '30 minutes', e.ts)
                   - k.k * INTERVAL '30 minutes' AS ws
        FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS k) k
    )
    GROUP BY ws
    """,
)
def hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) time window: 1-hour windows advancing every
    30 minutes, so each event lands in exactly two overlapping
    windows — the smoothing aggregation behind rate dashboards, and
    the batch twin of the streaming hopping window.

    Spark's native F.window(ts, '1 hour', '30 minutes') expands the
    two window assignments with an in-place Expand (no join, no extra
    shuffle beyond the single aggregation exchange); the oracle states
    the same algebra explicitly as a 2-row cross join on the 30-minute
    grid. Epoch-aligned buckets on both engines. The money column
    routes through DECIMAL(18,6) for order-independent summation."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum(F.col("value"), alias="total_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "total_value",
        )
    )


_TRANSITION_SQL = """
    WITH ordered AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           round(CAST(COUNT(*) AS DOUBLE)
                 / CAST(SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS DOUBLE),
                 6) AS p_transition
    FROM ordered
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
"""


@query("transition_matrix", layer="B", oracle=_TRANSITION_SQL)
def transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: for each
    observed (prev -> next) pair, the transition count and row-
    normalized probability. The sequence model behind next-action
    prediction and anomaly scoring on clickstreams.

    Composition: lag() shuffles once on user_id; the pair aggregation
    combines map-side down to at most |types|^2 rows; the row
    normalization is a window over the AGGREGATED (tiny) result, so
    the second exchange moves kilobytes. Shared SQL text runs on both
    engines; ties in ts are broken by event_id so lag() is
    deterministic."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_TRANSITION_SQL)


@query(
    "time_weighted_avg",
    layer="B",
    oracle="""
    WITH seg AS (
        SELECT user_id, value,
               epoch_ms(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))
                 - epoch_ms(ts) AS dt_ms
        FROM events
    )
    SELECT user_id,
           round(CAST(SUM(CAST(value * dt_ms AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(SUM(dt_ms) AS DOUBLE), 6) AS tw_avg_value,
           CAST(SUM(dt_ms) AS BIGINT) AS observed_ms
    FROM seg WHERE dt_ms IS NOT NULL
    GROUP BY user_id
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of a sampled metric: each event's value
    is held until the user's next event and weighted by that holding
    duration — the correct mean for irregularly-sampled gauges
    (sensor readings, account balances, queue depths), where the
    arithmetic mean over-counts bursts.

    lead() and the aggregation share the user_id partitioning (one
    shuffle); weights are integer epoch-milliseconds so the weighted
    sum routes through DECIMAL(38,6) — wide enough for value*dt at
    week-long gaps — and stays order-independent. The final division
    happens in DOUBLE on both engines from identical exact sums."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt_ms = F.unix_millis(F.lead("ts").over(w)) - F.unix_millis(F.col("ts"))
    seg = ev.select("user_id", "value", dt_ms.alias("dt_ms")).filter(
        F.col("dt_ms").isNotNull()
    )
    return seg.groupBy("user_id").agg(
        F.round(
            F.sum((F.col("value") * F.col("dt_ms")).cast("decimal(38,6)"))
            .cast("double")
            / F.sum("dt_ms").cast("double"),
            6,
        ).alias("tw_avg_value"),
        F.sum("dt_ms").alias("observed_ms"),
    )
