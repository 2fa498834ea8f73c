"""Extended relational operators: as-of join, cube, pivot,
explode/unnest, lead-lag deltas, max_by, percentiles.

These fill the §2.B "reference does NOT have" categories beyond the
core set — each is a capability a user of a general analytics engine
expects, expressed with Spark built-ins and oracle-checked.

The as-of join is the one operator here Spark lacks natively
(SURVEY.md custom-operator guidance (a): composition of existing
DataFrame ops): it is built as union -> single keyed window ->
last(ignorenulls) carry-forward — one shuffle, no per-row Python, and
semantically identical to DuckDB's native ASOF JOIN (which the oracle
uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cuttlefish_spark.functions import dec_sum, hash60, tokens
from cuttlefish_spark.io import load_table, register_views, spread
from cuttlefish_spark.operators.twophase import two_phase_rank
from cuttlefish_spark.registry import query

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "asof_join",
    layer="B",
    oracle="""
    WITH clicks AS (
        SELECT event_id AS last_click_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
           c.last_click_id, CAST(c.click_ts AS TIMESTAMP) AS last_click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the same user's most recent
    click at-or-before it.

    Spark has no ASOF JOIN; the classic distributed formulation is:
    tag both streams, union, ONE window over (user_id | ts, tag order)
    and carry the last click forward with last(ignorenulls=True). One
    shuffle on user_id — same cost as any windowed op — vs. the naive
    inequality join which explodes to a range cross-product. Clicks
    are pre-deduped to one per (user, ts) (max event_id) so ties are
    deterministic on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w_dedup = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id"), F.col("ts"), F.lit(0).alias("tag"),
            F.col("event_id").alias("click_id"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts"), F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id"), F.col("value"),
    )
    # tag orders clicks before purchases at equal ts => inclusive (>=)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = clicks.unionByName(purchases).select(
        "*",
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("last_click_ts"),
    )
    return carried.filter(F.col("tag") == 1).select(
        "event_id", "user_id", "ts", "value", "last_click_id", "last_click_ts"
    )


@query(
    "agg_cube",
    layer="B",
    oracle="""
    SELECT r_name, c_mktsegment,
           count(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal,
           CAST(GROUPING(r_name, c_mktsegment) AS BIGINT) AS gid
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE (r_name, c_mktsegment)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, market segment): all four grouping sets in
    one pass (grouping-set expansion before a single shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .cube("r_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dec_sum(F.col("c_acctbal"), alias="total_acctbal"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


@query(
    "pivot_counts",
    layer="B",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY user_id
    """,
)
def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type to columns (per-user event-mix matrix).

    Explicit pivot values keep the schema static (no extra pass to
    discover values — mandatory at scale); absent combinations are 0,
    matching SQL FILTER counts.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


@query(
    "explode_tokens",
    layer="B",
    oracle=r"""
    SELECT doc_id, u.pos, u.token
    FROM (
        SELECT doc_id,
               unnest(list_transform(
                   CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                        ELSE regexp_split_to_array(trim(lower(text)), '\s+') END,
                   (x, i) -> {'pos': CAST(i - 1 AS INT), 'token': x})) AS u
        FROM documents
        WHERE doc_id < 20
    )
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array -> rows with position (posexplode / UNNEST WITH
    ORDINALITY). The row-generating lateral primitive every downstream
    token-level pipeline builds on; the doc_id predicate is pushed to
    the scan so the explode only sees selected rows."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token")
    )


@query(
    "window_lag_delta",
    layer="B",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           value - lag(value) OVER w AS value_delta,
           epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS gap_ms,
           lag(event_id) OVER w AS prev_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag: per-user deltas between consecutive events (value
    delta, inter-event gap, previous id). One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))).alias("gap_ms"),
        F.lag("event_id").over(w).alias("prev_event_id"),
    )


@query(
    "agg_minmax_by",
    layer="B",
    oracle="""
    SELECT user_id,
           arg_max(event_type,
                   lpad(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR),
                        10, '0')
                   || '|' || lpad(CAST(event_id AS VARCHAR), 14, '0'))
               AS top_value_type,
           CAST(max(value) AS DOUBLE) AS max_value,
           arg_min(event_id,
                   lpad(CAST(epoch_us(ts) AS VARCHAR), 16, '0')
                   || '|' || lpad(CAST(event_id AS VARCHAR), 14, '0'))
               AS first_event_id,
           CAST(min(ts) AS TIMESTAMP) AS first_ts
    FROM events
    GROUP BY user_id
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by: per-user argmax aggregation (event type of the
    highest-value event; id of the earliest event) — single shuffle
    with partial aggregation.

    The argmax keys are STRICT TOTAL ORDERS: a bare max_by(x, value)
    is under-determined on value ties — both engines pick an arbitrary
    row, and the sf1 gate wild-caught exactly that (11 of 15,000 users
    had two events sharing the max value, Spark and DuckDB choosing
    different types). Neither engine's argmax takes a composite key
    (DuckDB 1.0 arg_max is scalar-keyed), so the (value, event_id) /
    (ts, event_id) orders are ENCODED as fixed-width strings —
    zero-padded cents (exact: value is generated at 2 decimals, so
    round(value*100) is the same int64 in both engines) / epoch-micros
    concatenated with the zero-padded unique event_id, the same
    encoded-total-order trick as the unigram DP state."""
    ev = load_table(spark, sf_dir, "events")
    vk = F.concat(
        F.lpad(F.round(F.col("value") * 100).cast("long").cast("string"), 10, "0"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 14, "0"),
    )
    tk = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 16, "0"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 14, "0"),
    )
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", vk).alias("top_value_type"),
        F.max("value").alias("max_value"),
        F.min_by("event_id", tk).alias("first_event_id"),
        F.min("ts").alias("first_ts"),
    )


@query(
    "agg_percentiles",
    layer="B",
    oracle="""
    SELECT event_type,
           round(quantile_cont(CAST(value AS DOUBLE), 0.25), 6) AS p25,
           round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6)  AS p50,
           round(quantile_cont(CAST(value AS DOUBLE), 0.95), 6) AS p95
    FROM events
    GROUP BY event_type
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation on the sorted
    values). At 100 TB you'd switch to percentile_approx (t-digest
    sketch, mergeable, one pass) — exact percentile materializes the
    per-group value set; declared here because the oracle can check the
    exact form."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
    )


_SKETCH_PS = [0.25, 0.5, 0.9]


@query(
    "percentile_sketch",
    layer="B",
    oracle=f"""
    WITH q AS (
        SELECT quantile_cont(o_totalprice,
                             {_SKETCH_PS}) AS ex
        FROM orders
    )
    SELECT CAST(0.25 AS DOUBLE) AS p, round(ex[1], 6) AS exact_value,
           TRUE AS within_bracket FROM q
    UNION ALL
    SELECT CAST(0.5 AS DOUBLE), round(ex[2], 6), TRUE FROM q
    UNION ALL
    SELECT CAST(0.9 AS DOUBLE), round(ex[3], 6), TRUE FROM q
    """,
)
def percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) next to the exact
    percentiles, checked as a PROPERTY: each estimate must land inside
    the exact [p-0.01, p+0.01] rank bracket — the bound that makes a
    one-pass mergeable sketch substitutable for the exact sort. The
    oracle states the booleans as TRUE plus the exact values; a sketch
    regression flips a boolean and fails the hash (same pattern as
    distinct_approx).

    At 100 TB the sketch path is the only viable one: fixed-size
    per-partition summaries merged through one shuffle, vs exact
    percentile materializing every group's value set. Accuracy 10000
    bounds rank error at n/10000, well inside the +-1pp bracket.
    """
    o = load_table(spark, sf_dir, "orders")
    brackets = [round(q, 2) for p in _SKETCH_PS for q in (p - 0.01, p, p + 0.01)]
    agg = o.agg(
        F.percentile_approx(
            "o_totalprice", [float(p) for p in _SKETCH_PS], 10000
        ).alias("ap"),
        F.expr(
            f"percentile(o_totalprice, array({', '.join(map(str, brackets))}))"
        ).alias("ex"),
    )
    rows = []
    for i, p in enumerate(_SKETCH_PS):
        ap = F.col("ap")[i]
        lo, mid, hi = (F.col("ex")[3 * i + j] for j in range(3))
        rows.append(
            F.struct(
                F.lit(float(p)).alias("p"),
                F.round(mid, 6).alias("exact_value"),
                ((lo <= ap) & (ap <= hi)).alias("within_bracket"),
            )
        )
    return agg.select(F.inline(F.array(*rows)))


@query(
    "dataset_split",
    layer="B",
    oracle="""
    WITH s AS (
        SELECT CASE WHEN h < 80 THEN 'train'
                    WHEN h < 90 THEN 'validation'
                    ELSE 'test' END AS split,
               n_chars
        FROM (SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                          AS BIGINT) % 100 AS h,
                     n_chars
              FROM documents)
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           COUNT(*) * 1.0 / (SELECT COUNT(*) FROM documents) AS share
    FROM s GROUP BY split
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/validation/test split by content-
    independent key hash — the split every training pipeline needs to
    be REPRODUCIBLE across engines, runs, and incremental re-ingests
    (rng-based df.randomSplit reshuffles docs between splits whenever
    partitioning changes; hashing the id never does, so a doc's split
    assignment is stable for the lifetime of the corpus).

    The hash is the portable 60-bit md5 prefix (functions.hash60), so
    the oracle reproduces the exact assignment. Emitted at summary
    grain (per-split counts, char mass, share); the row-level form is
    the same expression as a projection. One narrow map + one 3-group
    aggregation — no join, no skew, scan-bound at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    h = hash60(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "validation").otherwise("test")
    )
    agg = d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    return agg.select(
        "split",
        "n_docs",
        "sum_chars",
        (
            F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy())
        ).alias("share"),
    )


@query(
    "window_range_frame",
    layer="B",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS trailing_1h,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               AS n_1h
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user trailing 1-hour sum/count at
    every event — the value-range sibling of the ROWS frames in
    window_running. Spark range frames need a numeric ordering key, so
    the frame runs over epoch-millis with a 3,600,000 ms lower bound
    (equivalent to DuckDB's INTERVAL RANGE, both ends inclusive). One
    shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3_600_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(F.round(F.col("value") * 1_000_000).cast("long")).over(w) / F.lit(1e6)).alias("trailing_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@query(
    "agg_stats",
    layer="B",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(stddev_samp(l_discount), 6) AS discount_sd,
           round(var_samp(l_tax), 6) AS tax_var
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moment aggregates (corr/covar/stddev/variance) per
    group — one shuffle with partial co-moment accumulation (each task
    merges its own moments; the final merge is O(groups)). Rounded to
    absorb the last-ulp difference between merge orders."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_discount"), 6).alias("discount_sd"),
        F.round(F.var_samp("l_tax"), 6).alias("tax_var"),
    )


_Q3_SQL = """
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
               AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, o_orderkey
    LIMIT 10
"""


@query("sql_frontend_q3", layer="B", oracle=_Q3_SQL)
def sql_frontend_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front-end end-to-end: TPC-H Q3 (shipping-priority) as a
    raw SQL string over registered views — the SAME text the DuckDB
    oracle runs (SURVEY.md §2.B: SQL comes free once tables register).
    Catalyst plans it like the DataFrame twin: customer filter pushed
    to the scan, broadcast of the filtered customer side under the
    64 MiB threshold, one aggregation exchange, TakeOrderedAndProject
    for the top-10."""
    from cuttlefish_spark.io import register_views

    register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(_Q3_SQL)


_Q5_SQL = """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
               AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey   = o.o_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    JOIN supplier s ON l.l_suppkey   = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
"""


@query("sql_frontend_q5", layer="B", oracle=_Q5_SQL)
def sql_frontend_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier revenue): the SIX-WAY join — fact table
    against two independent dimension chains (customer->nation->region
    and supplier->nation->region) plus the correlated c_nationkey =
    s_nationkey cut — run as one raw SQL text on both engines. The
    canonical join-ORDERING stress: Catalyst must push the region
    filter through nation before joining the fact side, broadcast
    every dim (region 5 rows .. supplier), and leave lineitem-orders
    as the only shuffle-worthy pair; AQE re-plans the middle joins to
    broadcasts at runtime from the observed filtered sizes. At 100 TB
    the o_orderdate year cut is the partition-pruning predicate (date-
    partitioned orders), reading ~1/6 of the fact table before any
    join runs."""
    register_views(
        spark, sf_dir,
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    )
    return spark.sql(_Q5_SQL)


_EWMA_SQL = """
    WITH lags AS (
        SELECT event_id, user_id, ts, value,
               lag(value, 1) OVER w AS l1,
               lag(value, 2) OVER w AS l2,
               lag(value, 3) OVER w AS l3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
           round(
               (value
                + 0.5 * coalesce(l1, 0)
                + 0.25 * coalesce(l2, 0)
                + 0.125 * coalesce(l3, 0))
               / (1
                  + 0.5 * (CASE WHEN l1 IS NULL THEN 0 ELSE 1 END)
                  + 0.25 * (CASE WHEN l2 IS NULL THEN 0 ELSE 1 END)
                  + 0.125 * (CASE WHEN l3 IS NULL THEN 0 ELSE 1 END)),
               6) AS ewma
    FROM lags
"""


@query("ewma_trailing", layer="B", oracle=_EWMA_SQL)
def ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted moving average (half-life decay
    0.5 over the last 4 events) per user — the smoothing behind rate
    dashboards and anomaly baselines on irregular event streams. The
    truncated-lag formulation (lag(1..3) + renormalized weights at
    series heads) makes EWMA — an inherently sequential recurrence —
    a pure WINDOW expression: one shuffle on user_id, one sorted pass,
    no recursion, no state. The weights are exact binary fractions and
    the sum is written in one fixed left-to-right association, so both
    engines produce bitwise-identical doubles from the same SQL text.
    At 100 TB an unbounded-decay EWMA switches to
    applyInPandasWithState (streaming) or a segmented-scan, but the
    truncated form is what dashboards actually use — old terms decay
    below float noise anyway."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_EWMA_SQL)


_ZSCORE_SQL = """
    WITH stats AS (
        SELECT event_id, event_type, value,
               avg(value)         OVER (PARTITION BY event_type) AS mu,
               stddev_samp(value) OVER (PARTITION BY event_type) AS sigma
        FROM events
    )
    SELECT event_id, event_type, value,
           round((value - mu) / sigma, 4) AS zscore,
           (abs(round((value - mu) / sigma, 4)) > 3) AS is_anomaly
    FROM stats
"""


@query("anomaly_zscore", layer="B", oracle=_ZSCORE_SQL)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging: every event scored against
    its event_type's mean/stddev, |z| > 3 flagged — the first-line
    data-quality tripwire for a metrics pipeline (fat-finger values,
    unit regressions, broken emitters). Computed as analytic windows
    over the full partition, so each event keeps its row — one shuffle
    on event_type, stats and scoring in the same pass (the two window
    functions share one sort). At 100 TB the whole-partition window
    becomes a two-pass join (tiny stats agg broadcast back onto the
    stream) — same algebra, and the z-scores round to 4 decimals
    identically on both engines (stddev's co-moment merge order only
    perturbs ~1e-15 relative)."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_ZSCORE_SQL)


@query(
    "window_distribution",
    layer="B",
    oracle="""
    SELECT event_id, event_type,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank /
    cume_dist) per event_type, ordered by value with event_id as the
    deterministic tiebreak — computed as CLOSED FORMS over the
    two-phase distributed rank, never as `OVER (PARTITION BY
    event_type ORDER BY ...)`: event_type is a ~5-value key, so the
    single-window form sorts each type's entire corpus in ONE task at
    100 TB (the funnel test_no_low_card_ordered_windows forbids).

    With rn = the exact global per-type rank under the strict total
    order (value, event_id) (so rank == row_number: no order ties) and
    n = the type's total, every emitted function is pure arithmetic:
      - ntile(4): SQL's big-buckets-first rule — q = n div 4,
        r = n mod 4, the first r buckets carry q+1 rows. Integer-exact
        in both engines (when q = 0 the first branch covers all rows,
        so the div-by-zero branch is never taken).
      - percent_rank = (rn-1)/(n-1), cume_dist = rn/n — the same two
        integer operands Spark's built-ins divide, so the IEEE
        quotients (and their round-6) are bit-identical to the
        windowed originals.
    Cost: one range shuffle + an O(partitions x 5) offset collect +
    one equi-join per band — every task sorts ~1/numPartitions of one
    type."""
    ev = load_table(spark, sf_dir, "events")
    ranked = two_phase_rank(
        spark,
        ev.select("event_id", "event_type", "value"),
        "event_type",
        [F.col("value"), F.col("event_id")],
    )
    q = F.expr("n div 4")
    r = F.col("n") % 4
    big = r * (q + 1)  # rows covered by the q+1-sized leading buckets
    quartile = (
        F.when(F.col("rn") <= big, F.expr("(rn - 1) div (n div 4 + 1) + 1"))
        .otherwise(r + F.expr("(rn - 1 - (n % 4) * (n div 4 + 1)) div (n div 4)") + 1)
        .cast("int")
    )
    pct = F.when(
        F.col("n") > 1,
        (F.col("rn") - 1).cast("double") / (F.col("n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    cume = F.col("rn").cast("double") / F.col("n").cast("double")
    return ranked.select(
        "event_id",
        "event_type",
        quartile.alias("quartile"),
        F.round(pct, 6).alias("pct_rank"),
        F.round(cume, 6).alias("cume"),
    )


@query(
    "outer_join_agg",
    layer="B",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 0)
               AS DOUBLE) AS total_spend
    FROM customer c
    LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer join with null-aware aggregation: every customer keeps a
    row, order-less customers show 0 — COUNT(col) skips the nulls the
    outer join manufactures. One shuffle (customer side broadcasts
    under the threshold at small SF; at scale both sides shuffle on
    custkey)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 1_000_000).cast("long"))
                / F.lit(1e6),
                F.lit(0.0),
            ).alias("total_spend"),
        )
    )


@query(
    "hash_sample",
    layer="B",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
          % 100 < 10
    """,
)
def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by key hash — the reproducible
    sampling a training-data pipeline needs (rng-based df.sample gives
    a different set per run/engine; hashing the key gives the SAME
    sample everywhere, composes with incremental runs, and pushes the
    scan down to a narrow filter). md5-window hash matches the DuckDB
    oracle bit-for-bit (functions.hash60)."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(hash60(F.col("doc_id").cast("string")) % 100 < 10).select(
        "doc_id", "lang", "n_chars"
    )


_CORR_SUBQ_SQL = """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE CAST(c_acctbal AS DECIMAL(18,6))
          * (SELECT COUNT(*) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
          > (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,6))) FROM customer c3
             WHERE c3.c_nationkey = c.c_nationkey)
"""


@query("correlated_subquery", layer="B", oracle=_CORR_SUBQ_SQL)
def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (customers above their nation's
    mean balance), decorrelated by Catalyst into aggregate + join —
    run from the same SQL text as the oracle. The above-average
    predicate is stated as balance*count > sum in exact DECIMAL so the
    threshold can't flip on a last-ulp float difference between
    engines (a divided AVG would)."""
    from cuttlefish_spark.io import register_views

    register_views(spark, sf_dir, ["customer"])
    return spark.sql(_CORR_SUBQ_SQL)


_DATE_SPINE_SQL = """
    WITH RECURSIVE spine(d, dmax) AS (
        SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP),
               CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP)
        FROM events
        UNION ALL
        SELECT d + INTERVAL 1 DAY, dmax FROM spine WHERE d < dmax
    ),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n
        FROM events GROUP BY 1
    )
    SELECT s.d AS day, COALESCE(daily.n, 0) AS n_events
    FROM spine s LEFT JOIN daily ON daily.day = s.d
"""


@query("recursive_date_spine", layer="B", oracle=_DATE_SPINE_SQL)
def recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily time series via a RECURSIVE CTE (Spark 4):
    generate the calendar spine over the observed range, left-join the
    daily counts so empty days surface as explicit zeros. The max
    bound rides through the recursion (no subquery in the recursive
    term); depth = day span, well under the recursion limit. Same SQL
    text runs on both engines."""
    from cuttlefish_spark.io import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_DATE_SPINE_SQL)


_FIRST_LAST_SQL = """
    SELECT event_id, user_id, event_type,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id)  OVER w AS last_event,
           nth_value(event_id, 2) OVER w AS second_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@query("window_first_last", layer="B", oracle=_FIRST_LAST_SQL)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions (first_value / last_value /
    nth_value) over the full-partition frame: every event annotated
    with its user's first, last, and second event — session entry/exit
    attribution. The frame must be explicit: last_value under the
    default frame (UNBOUNDED PRECEDING..CURRENT ROW) degenerates to
    the current row, the classic window-function trap. One shuffle on
    user_id; ORDER BY ts with event_id tiebreak keeps the answer
    deterministic. Same SQL text runs on both engines (the WINDOW
    clause is shared syntax)."""
    from cuttlefish_spark.io import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_FIRST_LAST_SQL)


@query(
    "unpivot_melt",
    layer="B",
    oracle="""
    WITH m AS (
        SELECT c_nationkey,
               CAST(COUNT(*) AS DOUBLE) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   AS total_acctbal,
               CAST(MAX(c_acctbal) AS DOUBLE) AS max_acctbal
        FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey, 'n_customers' AS metric, n_customers AS value FROM m
    UNION ALL
    SELECT c_nationkey, 'total_acctbal', total_acctbal FROM m
    UNION ALL
    SELECT c_nationkey, 'max_acctbal', max_acctbal FROM m
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): per-nation wide metrics -> long (key, metric,
    value) triples — the inverse of pivot_counts and the standard
    shape for feeding metric stores / plotting layers. Spark's native
    `unpivot` expands in-place with an Expand node (no shuffle beyond
    the feeding aggregation, no join); the oracle states the same
    semantics as a 3-way UNION ALL. Metrics are all cast DOUBLE — one
    value column requires one type — with the money sum routed through
    DECIMAL first for order-independence."""
    c = load_table(spark, sf_dir, "customer")
    wide = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        dec_sum(F.col("c_acctbal"), alias="total_acctbal"),
        F.max("c_acctbal").cast("double").alias("max_acctbal"),
    )
    return wide.unpivot(
        ["c_nationkey"],
        ["n_customers", "total_acctbal", "max_acctbal"],
        "metric",
        "value",
    )


@query(
    "string_agg_ordered",
    layer="B",
    oracle="""
    WITH top3 AS (
        SELECT c_nationkey, c_name, c_acctbal
        FROM customer
        QUALIFY row_number() OVER (PARTITION BY c_nationkey
                                   ORDER BY c_acctbal DESC, c_name) <= 3
    )
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_acctbal DESC, c_name) AS top_names,
           CAST(COUNT(*) AS BIGINT) AS n_names
    FROM top3 GROUP BY c_nationkey
    """,
)
def string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): per nation, the names of
    its top-3 customers by account balance, comma-joined in rank
    order — the report-formatting aggregate every SQL dialect grows
    eventually (LISTAGG / STRING_AGG / GROUP_CONCAT).

    Spark (pre-4.0 LISTAGG) states it as collect_list of
    (sort-key, name) structs -> array_sort -> transform -> array_join:
    all inside one aggregation exchange, with the top-3 window cut
    FIRST so each group carries at most 3 structs regardless of
    nation size — the unbounded-group trap LISTAGG has at scale is
    designed out before the collect. Sort key is (-acctbal, name) ==
    the oracle's ORDER BY acctbal DESC, name."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_name"
    )
    top3 = c.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    pair = F.struct((-F.col("c_acctbal")).alias("neg_bal"), F.col("c_name"))
    return top3.groupBy("c_nationkey").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["c_name"]),
            ",",
        ).alias("top_names"),
        F.count(F.lit(1)).alias("n_names"),
    )


@query(
    "conditional_agg",
    layer="B",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
               AS n_large,
           CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'F')
                AS BIGINT) AS n_finished_custs,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_value,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) * 1.0
                 / COUNT(*) AS large_share
    FROM orders GROUP BY o_orderpriority
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (filtered) aggregation: several differently-
    filtered measures of `orders` computed in ONE pass — counts,
    a filtered distinct-count, a filtered decimal sum, and a derived
    ratio. The SQL-standard FILTER clause; Spark states each measure
    as agg(when(cond, x)) which Catalyst folds into the same single
    HashAggregate.

    One scan + one shuffle for five measures is the point: the naive
    alternative (one query per measure, join at the end) scans and
    shuffles 5x. count(when) counts non-null branches, identical to
    COUNT(*) FILTER; the DECIMAL routing keeps the money sum
    order-independent."""
    o = load_table(spark, sf_dir, "orders")
    large = F.when(F.col("o_totalprice") > 200000, 1)
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(large).alias("n_large"),
        F.countDistinct(
            F.when(F.col("o_orderstatus") == "F", F.col("o_custkey"))
        ).alias("n_finished_custs"),
        (
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "O",
                    F.round(F.col("o_totalprice") * 1_000_000).cast("long"),
                )
            )
            / F.lit(1e6)
        ).alias("open_value"),
        (F.count(large) / F.count(F.lit(1))).alias("large_share"),
    )


@query(
    "histogram_bins",
    layer="B",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
           CAST(floor(o_totalprice / 50000) * 50000 AS DOUBLE) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY 1, 2
    """,
)
def histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: order totals bucketed into $50k bins
    with per-bin count and exact min/max — the distribution profile a
    query planner, a dashboard, or a data-quality check asks of any
    numeric column.

    A pure arithmetic bucket key (floor(x/width)) keeps this a single
    map-side-combinable aggregation — no sort, no window, no
    percentile state; at 100 TB the combiner reduces each partition to
    at most n_bins rows before the (tiny) shuffle. min/max on doubles
    are exact, so the oracle match is bitwise."""
    o = load_table(spark, sf_dir, "orders")
    bin_ = F.floor(F.col("o_totalprice") / 50000)
    return o.groupBy(
        bin_.cast("long").alias("bin"),
        (bin_ * 50000).cast("double").alias("bin_lo"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


_STRATA_RATES = {"view": 50, "click": 100, "purchase": 500, "signup": 1000, "error": 0}


@query(
    "stratified_sample",
    layer="B",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
          % 1000 <
          CASE event_type WHEN 'view' THEN 50 WHEN 'click' THEN 100
                          WHEN 'purchase' THEN 500 WHEN 'signup' THEN 1000
                          ELSE 0 END
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: a different keep-rate per
    event_type (views 5%, clicks 10%, purchases 50%, signups 100%,
    errors dropped) — the class-rebalancing downsample a training
    pipeline applies to skewed event logs. Hash-threshold per stratum
    instead of rng (df.sampleBy) so the sample is REPRODUCIBLE across
    runs and engines and composes with incremental ingestion: a row's
    fate depends only on its key.

    Pure narrow filter — no shuffle, no state; the per-stratum
    threshold is a CASE lookup fused into the scan filter, and at
    100 TB the md5 window (functions.hash60) is the only added cost
    per row."""
    ev = load_table(spark, sf_dir, "events")
    threshold = F.lit(0)
    for etype, rate in _STRATA_RATES.items():
        threshold = F.when(F.col("event_type") == etype, rate).otherwise(threshold)
    return ev.filter(
        hash60(F.col("event_id").cast("string")) % 1000 < threshold
    ).select("event_id", "user_id", "event_type")


@query(
    "cdc_merge",
    layer="B",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, 'U' AS op, 1 AS seq
        FROM orders
    ),
    updates AS (
        SELECT o_orderkey, o_orderstatus,
               o_totalprice + 1000.0 AS o_totalprice, 'U' AS op, 2 AS seq
        FROM orders WHERE o_orderkey % 3 = 0
    ),
    deletes AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, 'D' AS op, 3 AS seq
        FROM orders WHERE o_orderkey % 97 = 0
    ),
    log AS (
        SELECT * FROM base UNION ALL SELECT * FROM updates
        UNION ALL SELECT * FROM deletes
    )
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY seq DESC) AS rn
        FROM log
    )
    WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge (MERGE INTO semantics on plain parquet): apply a
    change log of upserts and deletes onto a base snapshot and emit
    the new snapshot — latest change per key wins, tombstones drop the
    key. The core lakehouse compaction every warehouse-less pipeline
    reimplements. The change feed here is synthesized
    deterministically from `orders` (every 3rd key gets a price-bumped
    update — an exact +1000.0 so both engines produce the identical
    IEEE double, no rounding step — every 97th a delete) so the query is self-contained.

    Plan shape: union-all of the three legs is shuffle-free; ONE
    window shuffle on the merge key resolves winners (row_number over
    seq DESC), and the tombstone filter rides the same stage. At
    100 TB this is the standard approach when the change feed is a
    meaningful fraction of the base; for small feeds, production
    narrows the rewrite to affected partitions first (partition-pruned
    anti-join + append) — same winner-resolution kernel."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = o.select(
        "*", F.lit("U").alias("op"), F.lit(1).alias("seq")
    )
    updates = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
        .select("*", F.lit("U").alias("op"), F.lit(2).alias("seq"))
    )
    deletes = o.filter(F.col("o_orderkey") % 97 == 0).select(
        "*", F.lit("D").alias("op"), F.lit(3).alias("seq")
    )
    log = base.unionAll(updates).unionAll(deletes)
    w = Window.partitionBy("o_orderkey").orderBy(F.col("seq").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "datetime_functions",
    layer="B",
    oracle="""
    SELECT event_id,
           CAST(date_part('year', ts) AS BIGINT) AS y,
           CAST(date_part('quarter', ts) AS BIGINT) AS q,
           CAST(date_part('month', ts) AS BIGINT) AS mo,
           CAST(date_part('day', ts) AS BIGINT) AS d,
           CAST(date_part('hour', ts) AS BIGINT) AS h,
           CAST(date_part('isodow', ts) - 1 AS BIGINT) AS wd,
           CAST(date_part('doy', ts) AS BIGINT) AS doy,
           CAST(ts + INTERVAL '7 days' AS TIMESTAMP) AS ts_plus_7d,
           CAST(date_trunc('quarter', ts) AS TIMESTAMP) AS quarter_start,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
    FROM events
    """,
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function library surface: calendar field extraction
    (year/quarter/month/day/hour, ISO weekday, day-of-year), interval
    arithmetic, quarter truncation, and epoch seconds — the timestamp
    toolbox the reference needed three bespoke Racket converters for
    (SURVEY.md A15-A17), shown here as one narrow codegen'd
    projection, zero shuffles. Weekday is pinned to the ISO Monday=0
    convention on both engines (Spark weekday() == DuckDB isodow-1;
    Spark's dayofweek() is Sunday=1 and deliberately avoided)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.quarter("ts").cast("long").alias("q"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.weekday("ts").cast("long").alias("wd"),
        F.dayofyear("ts").cast("long").alias("doy"),
        (F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("ts_plus_7d"),
        F.date_trunc("quarter", F.col("ts")).alias("quarter_start"),
        F.unix_timestamp("ts").alias("epoch_s"),
    )


@query(
    "string_functions",
    layer="B",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           reverse(c_name) AS name_rev,
           split_part(c_name, '#', 2) AS name_num,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           replace(c_mktsegment, 'AUTO', 'CAR') AS seg_replaced,
           CAST(length(c_name) AS BIGINT) AS name_len,
           CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
           substr(c_mktsegment, 1, 3) AS seg3,
           concat_ws('|', c_mktsegment, c_name) AS joined
    FROM customer
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function library surface: case mapping, reverse,
    split_part, padding, replace, length, substring search (1-based,
    0 = absent on both engines), slicing, and delimiter-joined
    concat — one narrow whole-stage-codegen projection, zero
    shuffles. Every function here is shared semantics between Spark
    and DuckDB under identical names or documented aliases
    (strpos == instr/locate)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.reverse(F.col("c_name")).alias("name_rev"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("c_mktsegment"), F.lit("AUTO"), F.lit("CAR")).alias(
            "seg_replaced"
        ),
        F.length("c_name").cast("long").alias("name_len"),
        F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
    )


_REGR_X = "(unix_millis(ts) - 1735689600000) / CAST(86400000 AS DOUBLE)"
_REGR_X_DUCK = "(epoch_ms(ts) - 1735689600000) / CAST(86400000 AS DOUBLE)"


def _regr_sql(x: str) -> str:
    return f"""
    SELECT event_type,
           CAST(regr_count(value, {x}) AS BIGINT) AS n,
           round(regr_slope(value, {x}), 6) AS slope,
           round(regr_intercept(value, {x}), 6) AS intercept,
           round(regr_r2(value, {x}), 6) AS r2,
           round(regr_avgx(value, {x}), 6) AS avg_x,
           round(regr_avgy(value, {x}), 6) AS avg_y
    FROM events GROUP BY event_type
    """


@query("linear_regression", layer="B", oracle=_regr_sql(_REGR_X_DUCK))
def linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares via the ANSI regr_* aggregate
    family: slope/intercept/r2 of metric value against time (days) for
    each event_type — the trend-detection aggregate behind capacity
    forecasts and drift monitors, computed in ONE shuffle with map-side
    partial co-moments (the same mergeable-moments machinery as
    agg_stats, so it scales like any sum).

    Two numeric guards make OLS oracle-checkable: x is integer
    epoch-millis divided as an explicit DOUBLE (a bare `/86400000.0`
    literal parses as DECIMAL in Spark and silently changes every
    downstream type), and x is RECENTERED on a fixed epoch — intercept
    is mean_y - slope*mean_x, so an uncentered epoch-scale mean_x
    amplifies 1e-15 co-moment jitter into the 6th decimal (observed as
    a round-boundary flip); centering keeps the cancellation benign.
    """
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_regr_sql(_REGR_X))


@query(
    "array_functions",
    layer="B",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS w
        FROM documents
    )
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           array_to_string(w[1:5], ' ') AS first5,
           array_to_string(list_sort(list_distinct(w))[1:3], ' ') AS sorted3,
           list_contains(w, 'the') AS has_the,
           CAST(coalesce(list_position(w, 'the'), 0) AS BIGINT) AS pos_the,
           w[-1] AS last_token,
           round(len(list_distinct(w)) * 1.0 / len(w), 6) AS distinct_ratio
    FROM t
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function library surface over token arrays: size, slice,
    sort+distinct, membership, 1-based position (0 = absent on both
    engines), negative indexing, and type-token ratio — the completing
    third of the scalar-function trio (string_functions,
    datetime_functions). One narrow projection, all higher-order-free
    built-ins, whole-stage codegen, zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    w = tokens(F.col("text"))
    t = d.select("doc_id", w.alias("w"))
    return t.select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        F.array_join(F.slice("w", 1, 5), " ").alias("first5"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct("w")), 1, 3), " "
        ).alias("sorted3"),
        F.array_contains("w", "the").alias("has_the"),
        F.array_position("w", "the").cast("long").alias("pos_the"),
        F.element_at("w", -1).alias("last_token"),
        F.round(
            F.size(F.array_distinct("w")) * F.lit(1.0) / F.size("w"), 6
        ).alias("distinct_ratio"),
    )


@query(
    "bitwise_functions",
    layer="B",
    oracle="""
    SELECT event_type,
           bit_and(event_id) AS and_all,
           bit_or(event_id) AS or_all,
           bit_xor(event_id) AS xor_all,
           CAST(SUM(bit_count(event_id)) AS BIGINT) AS total_bits,
           CAST(MAX(event_id & 255) AS BIGINT) AS max_low_byte,
           CAST(MIN(xor(event_id >> 4, event_id & 15)) AS BIGINT) AS min_mix
    FROM events GROUP BY event_type
    """,
)
def bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function surface: the bit_and/bit_or/bit_xor AGGREGATES
    (flag-mask intersection/union/parity across a group — the compact
    form of per-bit boolean rollups) plus scalar masks, shifts, and
    popcount inside the aggregation. One shuffle, integer-exact on
    both engines (no float parity concerns at all). Spark spells
    scalar xor `^` where DuckDB spells it xor(); the oracle text
    differs only in that token."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_bitwise_events")
    return spark.sql(
        """
        SELECT event_type,
               bit_and(event_id) AS and_all,
               bit_or(event_id) AS or_all,
               bit_xor(event_id) AS xor_all,
               CAST(SUM(bit_count(event_id)) AS BIGINT) AS total_bits,
               CAST(MAX(event_id & 255) AS BIGINT) AS max_low_byte,
               CAST(MIN((event_id >> 4) ^ (event_id & 15)) AS BIGINT) AS min_mix
        FROM _bitwise_events GROUP BY event_type
        """
    )


_Q10_SQL = """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
               AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey   = o.o_custkey
    JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


@query("sql_frontend_q10", layer="B", oracle=_Q10_SQL)
def sql_frontend_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): quarter-scoped fact filter,
    selective l_returnflag cut, four-way join, top-20 by grouped
    revenue — the third raw-SQL TPC-H text next to Q3/Q5, completing
    scan-filter / join-order / top-k coverage of the SQL front-end.
    Catalyst pushes BOTH fact filters to their scans (date range on
    orders, returnflag on lineitem) before any join, broadcasts
    nation, and compiles the LIMIT into TakeOrderedAndProject (per-
    partition heaps — no global sort materialization). c_custkey
    tiebreak keeps the top-20 deterministic on both engines."""
    register_views(
        spark, sf_dir, ["customer", "orders", "lineitem", "nation"]
    )
    return spark.sql(_Q10_SQL)


# The three money sums use the TWO-STEP export — extract the exact
# scaled BIGINT from the decimal total, THEN divide as doubles —
# because their sf1 totals (~2.1e10, scaled ~2.1e16) exceed 2^53:
# above that, `CAST(decimal AS DOUBLE)` is allowed to differ by one
# ulp between engines (Spark correctly rounds the rational via
# BigDecimal; DuckDB converts the scaled int then divides — a double
# rounding). Forcing BOTH engines through int->double->divide makes
# the result bit-identical at any magnitude the BIGINT holds, and is
# value-identical to the old form below 2^53 (int->double is then
# exact, leaving one correctly-rounded division — the same result the
# decimal cast produces). Wild-caught by the sf1 oracle gate (r7):
# sum_charge differed by exactly 2^-18 = 1 ulp at 2.1e10.
_Q1_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000
                     AS BIGINT) AS DOUBLE) / 1000000 AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,6))) * 1000000
                     AS BIGINT) AS DOUBLE) / 1000000 AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                              AS DECIMAL(18,6))) * 1000000
                     AS BIGINT) AS DOUBLE) / 1000000 AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000
                     AS BIGINT) AS DOUBLE) / 1000000
               / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@query("sql_frontend_q1", layer="B", oracle=_Q1_SQL)
def sql_frontend_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary): the canonical scan-heavy aggregate —
    one fact-table pass, eight aggregates over two low-cardinality
    group keys. The plan every columnar engine is measured by: filter
    pushed to the parquet scan, partial aggregation map-side (the
    shuffle carries ~4 groups x partials, not 60k rows), whole-stage
    codegen over the arithmetic. Cross-engine exactness via the
    DECIMAL(18,6) quantization discipline; the avg_* columns are
    emitted as the UNROUNDED quotient of the identical decimal sum and
    count (IEEE division is bit-identical — no round() boundary
    exists). At 100 TB this is the pure scan-throughput benchmark:
    no join, no skew, partition pruning on l_shipdate if the table is
    date-partitioned."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_Q1_SQL)


_Q6_SQL = """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
               AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query("sql_frontend_q6", layer="B", oracle=_Q6_SQL)
def sql_frontend_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue): the selective-scan benchmark — a
    conjunctive range filter (date year + discount band + quantity
    cap) reducing the fact table to ~2% before a single global sum.
    All three predicates push to the parquet scan (min/max row-group
    skipping does the heavy lifting on a sorted/z-ordered layout, cf.
    zorder_layout); the aggregate is one partial per partition + a
    1-row final — network traffic is O(partitions). The BETWEEN on a
    double column is exact here because the synthetic discounts are
    the two-decimal grid points themselves, compared identically by
    both engines."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_Q6_SQL)


_Q18_SQL = """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
"""


@query("sql_frontend_q18", layer="B", oracle=_Q18_SQL)
def sql_frontend_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): the IN-subquery /
    semi-join-against-an-aggregate pattern Q3/Q5/Q10 don't cover — the
    inner aggregate finds heavy orders, the outer three-way join
    regroups their line items per customer. Catalyst rewrites the IN
    as a left-semi join whose build side is the HAVING-filtered
    aggregate (small — ~5% of orders), so the fact table is cut
    before the customer join; top-100 compiles to
    TakeOrderedAndProject with the o_orderkey tiebreak keeping both
    engines' cut identical. The quantity sums ride the DECIMAL(18,6)
    discipline on BOTH sides (HAVING threshold and output), so the
    heavy-order set itself is cross-engine exact. At 100 TB the inner
    aggregate is the skew risk (one shuffle on l_orderkey — uniform,
    high-cardinality) and the semi-join broadcasts its filtered build
    side."""
    register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(_Q18_SQL)


_Q14_SQL = """
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6)) ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
"""


@query("sql_frontend_q14", layer="B", oracle=_Q14_SQL)
def sql_frontend_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): fact-dim join feeding a
    CONDITIONAL aggregate ratio — the one-number KPI shape (share of
    revenue from a category). The date window pushes to the lineitem
    scan, part broadcasts, and both sums ride one partial-aggregated
    exchange; the percentage is an unrounded quotient of two
    decimal-quantized sums scaled by an exact constant, so no
    rounding boundary exists cross-engine. At 100 TB: one pruned fact
    scan + broadcast join, network = O(partitions)."""
    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_Q14_SQL)


_Q19_SQL = """
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
"""


@query("sql_frontend_q19", layer="B", oracle=_Q19_SQL)
def sql_frontend_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): the DISJUNCTIVE-predicate join —
    an OR of three brand/size/quantity conjunction bands sharing one
    equi-key. The optimizer pattern this pins: Catalyst must extract
    the common p_partkey = l_partkey as the hash-join key (the OR
    becomes a post-join filter, with the per-side residuals — brand
    IN-list, size/quantity hulls — inferred and pushed to the scans),
    NEVER a BroadcastNestedLoopJoin over the raw OR. The plan test
    asserts exactly that. At 100 TB the inferred single-side filters
    are what keep the fact scan selective despite the disjunction."""
    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_Q19_SQL)


_TRY_MIXED = (
    "CASE WHEN l_linenumber % 3 = 0 THEN 'x' || CAST(l_orderkey AS VARCHAR) "
    "ELSE CAST(l_orderkey AS VARCHAR) END"
)
_TRY_DATE = "'2024-02-' || CAST(20 + 3 * l_linenumber AS VARCHAR)"


@query(
    "try_functions",
    layer="B",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           TRY_CAST({_TRY_MIXED} AS BIGINT) AS parsed_key,
           round(l_extendedprice / (l_linenumber - 1), 6) AS safe_ratio,
           TRY_CAST({_TRY_DATE} AS TIMESTAMP) AS maybe_ts
    FROM lineitem
    """,
)
def try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe function surface: try_cast over a mixed
    valid/corrupt key column, try_divide with an organic zero
    denominator, try_cast of partially-invalid date strings (Feb 23 /
    26 / 29 parse; 32+ null out). The row-level form of the
    reference's Either error channel (A20, api-runner.rkt:133-147):
    under ANSI SQL (Spark 4 default) a single corrupt cell would
    otherwise kill the whole job at 100 TB — try_* turns poison rows
    into NULLs that flow to the dead-letter filter instead. DuckDB's
    TRY_CAST and NULL-on-zero division state identical semantics, so
    the oracle hash-checks all three null patterns exactly.

    Perf: try_cast reports a failed parse by throwing-and-catching a
    JVM exception PER ROW — profiled at ~5x the whole query's cost
    when a third of rows fail (the r1 bench's 6.3 s outlier). Each
    try_cast therefore sits behind a cheap validity guard (digit
    regex / day-range check) that routes known-bad rows to NULL
    without entering the parser; try_cast still catches anything the
    guard misses, so semantics are unchanged while the hot path stays
    exception-free."""
    register_views(spark, sf_dir, ["lineitem"])
    spark_text = _TRY_MIXED.replace("VARCHAR", "STRING")
    spark_date = _TRY_DATE.replace("VARCHAR", "STRING")
    return spark.sql(
        f"""
        SELECT l_orderkey, l_linenumber,
               try_cast(CASE WHEN ({spark_text}) RLIKE '^[+-]?[0-9]+$'
                             THEN {spark_text} END AS BIGINT) AS parsed_key,
               round(try_divide(l_extendedprice, l_linenumber - 1), 6) AS safe_ratio,
               try_cast(CASE WHEN 20 + 3 * l_linenumber <= 29
                             THEN {spark_date} END AS TIMESTAMP) AS maybe_ts
        FROM lineitem
        """
    )


@query(
    "json_functions",
    layer="B",
    oracle="""
    WITH j AS (
        SELECT event_id, props,
               json_object('id', event_id,
                           'vals', [value, value * 2],
                           'u', json_object('user_id', user_id)) AS doc
        FROM events
    )
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(doc, '$.u.user_id') AS BIGINT) AS uid,
           CAST(json_array_length(doc, '$.vals') AS BIGINT) AS n_vals,
           round(CAST(json_extract(doc, '$.vals[0]') AS DOUBLE), 6) AS v0
    FROM j
    """,
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON function surface: serialize a nested struct+array to a JSON
    document (to_json), then path-extract scalars, nested fields, and
    array lengths back out — the round-trip every semi-structured
    pipeline does at its edges (A2/A10/A21 parity beyond the plain
    get_json_object of nested_json_extract). Path evaluation is
    JVM-side on a narrow projection: zero shuffles, codegen throughout.
    Numbers cross the JSON boundary as CAST(... AS BIGINT/DOUBLE), not
    strings, so float formatting differences between the two engines'
    serializers never reach the hash."""
    ev = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.array(F.col("value"), F.col("value") * 2).alias("vals"),
            F.struct(F.col("user_id")).alias("u"),
        )
    )
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.get_json_object(doc, "$.u.user_id").cast("long").alias("uid"),
        F.json_array_length(F.get_json_object(doc, "$.vals")).cast("long").alias("n_vals"),
        F.round(F.get_json_object(doc, "$.vals[0]").cast("double"), 6).alias("v0"),
    )


@query(
    "map_functions",
    layer="B",
    oracle="""
    WITH m AS (
        SELECT event_id, map(['base', 'double'], [value, value * 2]) AS km
        FROM events
    )
    SELECT event_id,
           array_to_string(map_keys(km), ',') AS ks_csv,
           round(element_at(km, 'base')[1], 6) AS v_base,
           round(element_at(km, 'double')[1], 6) AS v_double,
           CAST(cardinality(km) AS INTEGER) AS n_entries
    FROM m
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build a map from key/value arrays,
    read it back via map_keys / map_values / element_at / cardinality —
    the typed dictionary column under feature bundles and sparse
    attributes (the engine's sink-side map_from_entries re-nesting,
    nest_events_per_key, is this surface's aggregation sibling). Export
    contract: construct maps freely, but EXPORT only scalars — keys
    array_join-ed to a csv string, values pulled out via element_at —
    because maps hash unstably across engines' dict ordering and the
    verification canonicalizer cannot sort array/map-typed columns at
    all (pandas sort_values throws on lists; r3 driver failure).
    Narrow projection, zero shuffles."""
    ev = load_table(spark, sf_dir, "events")
    km = F.map_from_arrays(
        F.array(F.lit("base"), F.lit("double")),
        F.array(F.col("value"), F.col("value") * 2),
    )
    t = ev.select("event_id", km.alias("km"))
    return t.select(
        "event_id",
        F.array_join(F.map_keys("km"), ",").alias("ks_csv"),
        F.round(F.element_at("km", F.lit("base")), 6).alias("v_base"),
        F.round(F.element_at("km", F.lit("double")), 6).alias("v_double"),
        F.size("km").alias("n_entries"),
    )


def _locf_sql(ignore_nulls_inside: bool) -> str:
    # DuckDB spells it last_value(v IGNORE NULLS); Spark spells it
    # last_value(v) IGNORE NULLS — same ANSI semantics, one token moved.
    lv = (
        "last_value(v IGNORE NULLS)"
        if ignore_nulls_inside
        else "last_value(v) IGNORE NULLS"
    )
    return f"""
    WITH marked AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    )
    SELECT event_id, user_id, ts, v AS raw_value,
           coalesce(v, {lv} OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS filled_value,
           (v IS NULL) AS was_imputed
    FROM marked
    """


@query("locf_impute", layer="B", oracle=_locf_sql(ignore_nulls_inside=True))
def locf_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last-observation-carried-forward) imputation: error events
    are treated as missing readings and filled from the user's most
    recent valid value — the standard gap-repair step for sensor /
    metric streams before feature extraction (a user's leading errors
    stay NULL: nothing to carry). One window over (user_id | ts) via
    last_value(IGNORE NULLS) on the strictly-preceding frame — one
    shuffle, one sorted pass, same cost class as any lag. The
    `was_imputed` flag is the lineage column an auditable pipeline
    keeps. The SQL differs between engines by one token position
    (IGNORE NULLS placement, see _locf_sql)."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_locf_sql(ignore_nulls_inside=False))


_RANKING_SQL = """
    SELECT event_id, event_type,
           CAST(floor(value / 10) AS BIGINT) AS value_band,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(row_number() OVER (PARTITION BY event_type
                 ORDER BY floor(value / 10) DESC, event_id) AS BIGINT) AS rn
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY floor(value / 10) DESC)
"""


@query("ranking_functions", layer="B", oracle=_RANKING_SQL)
def ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function surface under real TIES: rank (gapped),
    dense_rank (gapless), row_number (tie-broken) over banded values —
    the three give different answers exactly when ties exist, which is
    what this pins (banding value into deciles manufactures heavy
    ties). Computed scale-safe: NO `OVER (PARTITION BY event_type)`
    anywhere (a ~5-value key would sort each type's whole corpus in
    one task at 100 TB — the test_no_low_card_ordered_windows funnel).

    Derivation from the two-phase distributed rank rn over the strict
    total order (value_band DESC, event_id) within event_type:
      - row_number = rn itself (the order already carries the
        event_id tiebreak).
      - rank = min(rn) of the row's (event_type, value_band) tie
        group — rank() points every tied row at the group's first
        position. One tiny aggregate (O(types x bands) rows) joined
        back; broadcast because bands = distinct floor(value/10).
      - dense_rank = the band's own 1-based position among the type's
        distinct bands (DESC) — the SAME two-phase rank applied to the
        band aggregate (O(bands) rows, but the plan guard judges
        shapes, not sizes — so it gets the sanctioned shape too).
    All BIGINT end-to-end; cost is one range shuffle over events + two
    O(bands) broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    banded = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") / 10).cast("long").alias("value_band"),
    )
    ranked = two_phase_rank(
        spark,
        banded,
        "event_type",
        [F.desc("value_band"), F.col("event_id")],
    ).withColumnRenamed("rn", "row_n")
    bands = ranked.groupBy("event_type", "value_band").agg(
        F.min("row_n").alias("rnk")
    )
    dense = two_phase_rank(
        spark, bands, "event_type", [F.desc("value_band")]
    ).select(
        "event_type",
        "value_band",
        "rnk",
        F.col("rn").alias("drnk"),
    )
    return ranked.join(
        F.broadcast(dense), ["event_type", "value_band"]
    ).select(
        "event_id",
        "event_type",
        "value_band",
        "rnk",
        "drnk",
        F.col("row_n").alias("rn"),
    )


def _rolling_sql(median_fn: str) -> str:
    # Spark spells the exact-median aggregate `percentile`; DuckDB
    # spells it `quantile_cont` — same linear interpolation.
    return f"""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
           round({median_fn}(value, 0.5) OVER w, 6) AS med5,
           round(min(value) OVER w, 6) AS lo5,
           round(max(value) OVER w, 6) AS hi5
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """


@query("rolling_median", layer="B", oracle=_rolling_sql("quantile_cont"))
def rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling robust statistics: trailing-5-event median / min / max
    per user — the outlier-resistant smoothing band (median filters
    shrug off the single fat-finger spike that wrecks a rolling mean,
    which is why monitoring baselines prefer them). An exact aggregate
    evaluated as a WINDOW over a bounded ROWS frame: one shuffle on
    user_id, one sorted pass, all three statistics sharing the frame.
    The frame is O(1) rows, so — unlike whole-partition exact
    percentiles — this stays cheap at any scale; the engines' median
    functions differ in name only (percentile vs quantile_cont), both
    linear-interpolating."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_rolling_sql("percentile"))


def _resample_sql(epoch_ms_fn: str) -> str:
    b = "CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 15 MINUTE * CAST(floor(minute(ts) / 15) + 1 AS INTEGER)"
    return f"""
    WITH nxt AS (
        SELECT user_id, ts, value,
               lead(ts)    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nts,
               lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nval,
               {b} AS grid_ts
        FROM events
    )
    SELECT user_id, grid_ts,
           round(value + (nval - value)
                 * CAST({epoch_ms_fn}(grid_ts) - {epoch_ms_fn}(ts) AS DOUBLE)
                 / CAST({epoch_ms_fn}(nts) - {epoch_ms_fn}(ts) AS DOUBLE),
                 6) AS interp_value
    FROM nxt
    WHERE nts > grid_ts AND nts <> ts
    """


@query("resample_interpolate", layer="B", oracle=_resample_sql("epoch_ms"))
def resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid resampling with linear interpolation: each user's irregular
    event stream sampled onto the next quarter-hour boundary — when two
    consecutive events straddle a grid point, the value AT the grid
    point is linearly interpolated between them. The alignment step
    before any cross-series arithmetic (correlating streams sampled at
    different times requires a common clock); LOCF (locf_impute) is the
    step-function sibling, this is the continuous one.

    One lead() window on user_id — interpolation needs only the
    straddling pair, never a generate_series explosion per user.
    Determinism: slopes are computed from exact integer epoch-millis
    deltas in one fixed double expression, round 6 — both engines
    produce identical IEEE results (Spark spells epoch-millis
    unix_millis, DuckDB epoch_ms; the text differs in that token).
    """
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_resample_sql("unix_millis"))


_FULL_OUTER_SQL = """
    WITH u AS (
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY user_id
    )
    SELECT coalesce(u.user_id, c.c_custkey) AS entity_id,
           u.n_events, u.total_value, c.c_name, c.c_acctbal,
           (u.user_id IS NOT NULL AND c.c_custkey IS NOT NULL) AS in_both,
           CASE WHEN c.c_custkey IS NULL THEN 'events_only'
                WHEN u.user_id   IS NULL THEN 'customer_only'
                ELSE 'matched' END AS presence
    FROM u
    FULL OUTER JOIN customer c ON u.user_id = c.c_custkey
"""


@query("full_outer_join", layer="B", oracle=_FULL_OUTER_SQL)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with coalesced key and presence tagging — the
    reconciliation join (activity stream vs account master) where BOTH
    unmatched sides must survive: event traffic from unknown accounts
    AND dormant accounts with no traffic are each findings, not rows to
    drop. Completes the join matrix next to inner/broadcast/semi/anti/
    left-outer/as-of/range/interval. Full outer cannot broadcast
    (either side may need to emit unmatched rows), so it plans as a
    shuffle join on the key — at 100 TB you pre-aggregate the fact side
    first (done here: one group-by shrinks events to one row per user
    BEFORE the join), which is the difference between joining 100 TB
    and joining gigabytes."""
    register_views(spark, sf_dir, ["events", "customer"])
    return spark.sql(_FULL_OUTER_SQL)


_NOT_IN_SQL = """
    SELECT
        (SELECT COUNT(*) FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders)) AS n_in,
        (SELECT COUNT(*) FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS n_not_in,
        (SELECT COUNT(*) FROM customer
         WHERE c_custkey NOT IN
             (SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
                          ELSE o_custkey END
              FROM orders)) AS n_not_in_with_nulls,
        (SELECT COUNT(*) FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 400000)) AS n_exists_big,
        (SELECT COUNT(*) FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey)) AS n_not_exists
"""


@query("subquery_semantics", layer="B", oracle=_NOT_IN_SQL)
def subquery_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN / EXISTS / NOT EXISTS subquery semantics in one row —
    including the ANSI trap this query exists to pin: NOT IN against a
    list containing a NULL returns ZERO rows (x <> NULL is unknown for
    every x), while the equivalent NOT EXISTS keeps working. Engines
    that "fix" this break standard semantics; both Spark and DuckDB
    implement it faithfully, and n_not_in_with_nulls = 0 is the
    hash-checked witness. Catalyst rewrites each predicate to the same
    physical shapes as semi_anti_join (left-semi / null-aware left-anti
    broadcast joins) — the null-aware anti join is the expensive one at
    scale, which is why production schemas keep join keys NOT NULL and
    pipelines prefer NOT EXISTS."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_NOT_IN_SQL)


_SKETCH_UNION_ORACLE = """
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_global,
           TRUE AS union_est_within_5pct,
           CAST(5 AS BIGINT) AS n_groups,
           TRUE AS group_ests_within_5pct
    FROM events
"""


@query("sketch_union", layer="B", oracle=_SKETCH_UNION_ORACLE)
def sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch MERGEABILITY (Spark 4 hll_sketch_agg / hll_union_agg
    / hll_sketch_estimate): per-group distinct-user sketches are built
    once, then the GLOBAL distinct count comes from unioning the five
    group sketches — no second scan of the data. This is the property
    that makes sketch columns materializable: store a sketch per
    partition/day, answer any rollup's distinct count by merging
    sketches, never re-reading 100 TB. Checked as error-bound
    properties (same pattern as distinct_approx): the union estimate
    and every per-group estimate must land within 5% of exact, stated
    as TRUE by the oracle."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        WITH sk AS (
            SELECT event_type,
                   hll_sketch_agg(user_id) AS s,
                   COUNT(DISTINCT user_id) AS exact_g
            FROM events GROUP BY event_type
        ),
        per_group AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
                   every(abs(hll_sketch_estimate(s) - exact_g) * 20
                         <= exact_g) AS group_ests_within_5pct
            FROM sk
        ),
        merged AS (
            SELECT hll_sketch_estimate(hll_union_agg(s)) AS est_global FROM sk
        ),
        ex AS (
            SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_global
            FROM events
        )
        SELECT ex.exact_global,
               abs(merged.est_global - ex.exact_global) * 20
                   <= ex.exact_global AS union_est_within_5pct,
               per_group.n_groups,
               per_group.group_ests_within_5pct
        FROM ex, merged, per_group
        """
    )


_TARGET_ENCODE_SQL = """
    WITH g AS (
        SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS global_mean
        FROM events
    ),
    c AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
        FROM events GROUP BY event_type
    )
    SELECT c.event_type, c.n,
           round(c.s / c.n, 6) AS raw_mean,
           round((c.s + 50 * g.global_mean) / (c.n + 50), 6) AS encoded,
           round(g.global_mean, 6) AS global_mean
    FROM c CROSS JOIN g
"""


@query("target_encode", layer="B", oracle=_TARGET_ENCODE_SQL)
def target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding: each category's value replaced by a
    shrinkage blend of its own mean and the global mean,
    (sum + m*global)/(n + m) with m=50 — the standard high-cardinality
    categorical encoder (rare categories collapse toward the prior
    instead of memorizing noise; frequent ones keep their own signal).
    Two aggregations (per-category and global) + a 1-row cross join —
    both map-side-partial single shuffles; at 100 TB the encoder table
    is categories-sized and broadcasts back onto the training scan.
    Decimal partial sums keep both means exact, so the blend is one
    fixed double expression, round 6."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_TARGET_ENCODE_SQL)


_BINNING_SQL = """
    WITH b AS (
        SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS bin
        FROM events
    )
    SELECT bin, COUNT(*) AS n,
           round(MIN(value), 6) AS lo,
           round(MAX(value), 6) AS hi,
           round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS bin_mean
    FROM b GROUP BY bin
"""


@query("feature_binning", layer="B", oracle=_BINNING_SQL)
def feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quantile) binning: values ntile'd into 10
    equal-count bins, each reported with its boundaries and mean — the
    discretization transform behind gradient-boosting histograms, WoE
    encoding, and drift dashboards (equal-WIDTH bins are
    histogram_bins; equal-frequency adapts to the distribution). The
    event_id tiebreak makes tied values assign deterministically on
    both engines.

    The global rank is DISTRIBUTED (never a single-task
    Window.orderBy): range-repartition on the sort key so partitions
    tile the total order, lift one per-partition count row to the
    driver, and each partition ranks within itself plus its exclusive
    offset — the same two-phase pattern as token_budget_trim. The
    exact-NTILE bucket then falls out of the closed form (first n%k
    buckets take ceil(n/k) rows), so the plan stays fully parallel at
    any corpus size while matching ntile() row-for-row."""
    ev = load_table(spark, sf_dir, "events").select("value", "event_id")
    nparts = spark.sparkContext.defaultParallelism
    part = (
        ev.repartitionByRange(nparts, "value", "event_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    subs = sorted(
        (r["pid"], r["count"]) for r in part.groupBy("pid").count().collect()
    )
    offsets, acc = [], 0
    for pid, cnt in subs:
        offsets.append((pid, acc))
        acc += cnt
    n, k = acc, 10
    q, r = divmod(n, k)
    off_df = spark.createDataFrame(offsets, "pid int, off bigint")
    w = Window.partitionBy("pid").orderBy("value", "event_id")
    rn = (F.row_number().over(w) + F.col("off")).alias("rn")
    # Exact ntile(k) from the global row number: the first r buckets
    # hold q+1 rows, the rest q.
    binned = part.join(F.broadcast(off_df), "pid").select("value", rn)
    bucket = (
        F.when(F.col("rn") <= r * (q + 1), F.ceil(F.col("rn") / (q + 1)))
        .otherwise(r + F.ceil((F.col("rn") - r * (q + 1)) / F.greatest(F.lit(q), F.lit(1))))
        .cast("int")
        .alias("bin")
    )
    return (
        binned.select("value", bucket)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
            F.round(
                (dec_sum(F.col("value")) / F.count(F.lit(1))).cast("double"), 6
            ).alias("bin_mean"),
        )
    )


_SNAPSHOT_DIFF_SQL = """
    WITH snap_a AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 97 <> 0
    ),
    snap_b AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 89 = 0
                    THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
               o_orderpriority
        FROM orders WHERE o_orderkey % 101 <> 0
    )
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'added'
                WHEN b.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM snap_a a
    FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR md5(concat_ws('|', a.o_custkey, round(a.o_totalprice, 2),
                        a.o_orderpriority))
          <> md5(concat_ws('|', b.o_custkey, round(b.o_totalprice, 2),
                           b.o_orderpriority))
"""


@query("snapshot_diff", layer="B", oracle=_SNAPSHOT_DIFF_SQL)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two versions of a table into
    added / removed / changed rows — the detection side of CDC
    (cdc_merge APPLIES a change log; this DERIVES one when the source
    can't emit it: nightly vendor dumps, backfill audits, replication
    checks). Snapshots are simulated deterministically (every 97th key
    missing from A, every 101st from B, every 89th price bumped in B).

    The comparison is hash-based: each side reduces its non-key columns
    to ONE md5 over a canonical string, so the full-outer join compares
    a single value regardless of schema width — at 100 TB the row-hash
    is precomputed at write time (a `row_hash` column), making the
    nightly diff one join on the key with a one-column payload instead
    of a whole-row comparison. Unchanged pairs are filtered before the
    output, so the result is findings-only."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(_SNAPSHOT_DIFF_SQL)


_PATH_SQL = """
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                               OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)
                         <= 1800000000
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    ),
    ranked AS (
        SELECT user_id, session_no, event_type,
               row_number() OVER (PARTITION BY user_id, session_no
                                  ORDER BY ts, event_id) AS step
        FROM sessions
    ),
    paths AS (
        SELECT user_id, session_no,
               string_agg(event_type, '>' ORDER BY step) AS path
        FROM ranked WHERE step <= 3
        GROUP BY user_id, session_no
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path HAVING COUNT(*) >= 5
"""


@query("path_analysis", layer="B", oracle=_PATH_SQL)
def path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path analysis: each session's first three event
    types joined into an ordered path string, counted across sessions —
    the Sankey-diagram / funnel-discovery query (which entry paths
    dominate, where do sessions diverge). Stacks the engine's
    primitives end-to-end: gaps-and-islands sessionization (lag +
    running sum), per-session step ranking, ORDER BY-aggregated
    string_agg, then a path-grain count. All windows and the final
    aggregations share the user_id exchange until the last path-count
    shuffle — two exchanges total at any scale. Spark states the
    ordered string_agg as sorted-struct collect + array_join (the
    string_agg_ordered pattern); the oracle uses DuckDB's native
    string_agg(... ORDER BY).

    The session gap compares at MICROSECOND precision on both sides
    (unix_micros vs epoch_us): the original cast-to-long gap compared
    second-TRUNCATED timestamps against the oracle's exact interval,
    and the sf1 gate wild-caught the boundary class — gaps whose
    floored-second difference straddles 1800 s differently from their
    true microsecond difference flipped 17 session splits at 1M
    events (invisible at the driver's 100k-row scale)."""
    ev = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w_order)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap <= 1_800_000_000, F.lit(0)).otherwise(F.lit(1)),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(
            w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_step = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    ranked = sessions.withColumn("step", F.row_number().over(w_step)).filter(
        F.col("step") <= 3
    )
    pair = F.struct(F.col("step"), F.col("event_type"))
    paths = ranked.groupBy("user_id", "session_no").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["event_type"]),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= 5)
    )


_TIME_ROLLUP_SQL = """
    SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (CAST(date_trunc('week', ts) AS TIMESTAMP),
                     CAST(date_trunc('day', ts) AS TIMESTAMP),
                     CAST(date_trunc('hour', ts) AS TIMESTAMP))
"""


@query("time_rollup", layer="B", oracle=_TIME_ROLLUP_SQL)
def time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-hierarchy ROLLUP: hour, day, week and grand totals in
    ONE pass — the time-axis OLAP cube every metrics dashboard
    renders, where agg_rollup's dimension hierarchy (region->nation)
    becomes the natural week->day->hour containment. The grouping-set
    expansion happens before the single exchange, so one shuffle
    yields all four granularities; at 100 TB the alternative — four
    separate date_trunc aggregations — is four scans of the fact
    table. Identical SQL text on both engines (date_trunc('week')
    starts Monday in both)."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(_TIME_ROLLUP_SQL)


@query(
    "incremental_rollup",
    layer="B",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0
                AS DOUBLE) AS total_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
)
def incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a daily rollup: the HISTORY
    batch and the DELTA batch are aggregated SEPARATELY into algebraic
    partials (count, integer-micro sum, min, max) and then MERGED by
    summing counts/sums and re-min/max-ing — never re-scanning
    history. The oracle is the full recompute over the whole table:
    merged-partials == full is the algebraic-aggregate contract that
    makes 100 TB rollups maintainable (yesterday's partials are a
    materialized table; each day merges only the new partition in).
    The batch boundary here is an event_id hash split standing in for
    the history/today partition cut — merge correctness is boundary-
    independent, which is exactly the property being demonstrated.

    Exactness across the merge: the value sum is carried through the
    partials as INTEGER MICROS (round(value*1e6) summed as long), so
    partial+merge is exact long addition in any order and the final
    /1e6 matches the oracle's quantized sum bit-for-bit; min/max are
    idempotent merges. Plan: two pushed-filter scans -> two partial
    aggregations -> one merge aggregation on the bounded (day, type)
    key space — the merge shuffle is KBs regardless of corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    is_hist = F.col("event_id") % 16 < 13

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("s_micros"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    merged = (
        partial(ev.filter(is_hist))
        .unionByName(partial(ev.filter(~is_hist)))
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("s_micros") / F.lit(1e6)).alias("total_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
    )
    return merged


# --- TPC-H back-nine: the remaining spec queries the test schema supports ---
# The testdata schema (TESTDATA.md) omits partsupp, l_shipmode,
# l_commitdate/l_receiptdate, c_phone and p_container, so q2/q11/q16/q20
# cannot run as-spec and q4/q9/q12/q17/q22 carry documented adaptations
# that preserve the query's OPERATOR shape (the thing this engine is
# graded on), substituting available columns for missing ones.

_Q4_SQL = """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""


@query("sql_frontend_q4", layer="B", oracle=_Q4_SQL)
def sql_frontend_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking), adapted: the spec's
    l_commitdate < l_receiptdate late-delivery test becomes
    l_shipdate > o_orderdate + 30 days (the schema carries neither
    commit nor receipt dates) — a CORRELATED EXISTS whose inner
    predicate references the outer row's non-key column, the shape
    q18's uncorrelated IN doesn't cover. Catalyst decorrelates it
    into a left-semi hash join on l_orderkey with the +30-day
    comparison as the join residual; the quarter window prunes the
    orders scan first. At 100 TB: one semi-join shuffle on a uniform
    high-cardinality key, no nested loop (plan-pinned)."""
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_Q4_SQL)


_Q7_SQL = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
               CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey  = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey  = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
            OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                               AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@query("sql_frontend_q7", layer="B", oracle=_Q7_SQL)
def sql_frontend_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping), faithful: bilateral trade between
    two nations by year. The join-graph stress Q5 doesn't have: the
    SAME dimension table (nation) joins TWICE under different aliases
    with a cross-alias disjunction that can only be evaluated after
    both joins. Catalyst broadcasts both nation sides and the
    supplier/customer dims, leaving lineitem-orders as the sole
    shuffle pair; the nation disjunction cannot push below either
    single join but its per-alias IN('NATION_3','NATION_9') hulls ARE
    inferred onto each nation scan. Volume rides the DECIMAL(18,6)
    discipline; l_year is INTEGER-cast in the shared text so both
    engines agree on the type. At 100 TB the shipdate window is the
    partition-pruning predicate."""
    register_views(
        spark, sf_dir, ["supplier", "lineitem", "orders", "customer", "nation"]
    )
    return spark.sql(_Q7_SQL)


_Q8_SQL = """
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey  = l.l_partkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey  = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey  = s.s_suppkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                AND TIMESTAMP '1997-12-31'
          AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
"""


@query("sql_frontend_q8", layer="B", oracle=_Q8_SQL)
def sql_frontend_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share), faithful: the deepest join in
    the suite — an 8-table chain (fact + 7 dims, nation twice) feeding
    a conditional-share aggregate. Every dim broadcasts after its
    filter (region=ASIA cuts nation n1 to 1/5th before the customer
    join; p_type cuts part to 1/6th); the share is an unrounded
    quotient of two decimal-quantized sums over the SAME rows, so
    numerator and denominator are bit-identical cross-engine and the
    division is deterministic. At 100 TB this is the query where join
    ORDER matters most — Catalyst's size-based reordering plus AQE
    keeps the fact table from being joined against an unfiltered
    dim."""
    register_views(
        spark, sf_dir,
        ["part", "lineitem", "orders", "customer", "nation", "region", "supplier"],
    )
    return spark.sql(_Q8_SQL)


_Q9_SQL = """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_revenue
    FROM (
        SELECT n.n_name AS nation,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey  = l.l_partkey
        JOIN supplier s ON s.s_suppkey  = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""


@query("sql_frontend_q9", layer="B", oracle=_Q9_SQL)
def sql_frontend_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: profit =
    l_extendedprice*(1-l_discount) without the ps_supplycost*l_quantity
    subtrahend (no partsupp table in the schema). What survives is the
    operator shape: a CONTAINS-pattern dim filter (p_name LIKE
    '%bolt%' — not prefix, so it can't become a range scan and must
    evaluate per-row INSIDE the parquet reader's row-group filter),
    a 5-table join, and a (nation, year) rollup reading EVERY year of
    the fact table — the no-date-pruning worst case. At 100 TB this
    is deliberately the full-scan member of the suite: the plan's
    merit is the 1/6th part-side cut broadcast into the fact scan via
    DPP/runtime filters, not partition pruning."""
    register_views(
        spark, sf_dir, ["part", "lineitem", "supplier", "orders", "nation"]
    )
    return spark.sql(_Q9_SQL)


_Q12_SQL = """
    SELECT l.l_returnflag AS ship_class,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
"""


@query("sql_frontend_q12", layer="B", oracle=_Q12_SQL)
def sql_frontend_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / order priority), adapted: the
    grouping column is l_returnflag standing in for the absent
    l_shipmode, and the year window rides l_shipdate for the absent
    l_receiptdate — the conditional-count pivot over a fact-fact join
    is unchanged. COUNT(CASE WHEN..THEN 1 END) instead of SUM keeps
    the output BIGINT on BOTH engines (DuckDB's SUM(INTEGER) widens
    to HUGEINT, which would flip the schema hash). Plan: pruned
    lineitem scan, one shuffle join on o_orderkey (both sides large),
    one aggregation exchange on the 3-value flag — the flag's low
    cardinality is safe BECAUSE partial aggregation collapses each
    task to ≤3 rows before the exchange."""
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_Q12_SQL)


_Q13_SQL = """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey AS c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@query("sql_frontend_q13", layer="B", oracle=_Q13_SQL)
def sql_frontend_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution), faithful modulo the filter
    column (o_orderpriority <> '5-LOW' for the absent o_comment NOT
    LIKE): the double-aggregation histogram — outer-join a fact to
    its dimension WITH a non-join predicate inside the ON clause
    (pre-join filter on the preserved side's partner, NOT a WHERE —
    moving it to WHERE would turn the left join inner and drop
    zero-order customers, the rows q13 exists to count). First agg
    shuffles on c_custkey (high cardinality, safe), second on the
    tiny c_count domain (safe after partial agg). COUNT keeps both
    engines in BIGINT."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_Q13_SQL)


_Q15_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
"""


@query("sql_frontend_q15", layer="B", oracle=_Q15_SQL)
def sql_frontend_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier), faithful (CTE in place of the spec's
    CREATE VIEW): a derived aggregate consumed TWICE — once as the
    join input, once reduced to a scalar MAX — selecting the argmax
    row(s). The double-as-equality is safe here because total_revenue
    on both engines is the same decimal-exact sum cast once to
    double: bit-identical operands, bit-identical comparison. Spark
    inlines the CTE into both consumers (two pruned scans of the
    quarter window) and broadcasts the scalar; at 100 TB one would
    materialize the revenue CTE (cache/checkpoint) to scan once —
    both plans keep the argmax a broadcast filter, never a sort of
    suppliers."""
    register_views(spark, sf_dir, ["supplier", "lineitem"])
    return spark.sql(_Q15_SQL)


_Q17_SQL = """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND p.p_size < 25
      AND l.l_quantity < (
          SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 / (2.0 * COUNT(*))
          FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
"""


@query("sql_frontend_q17", layer="B", oracle=_Q17_SQL)
def sql_frontend_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted: brand+size
    band replaces the absent p_container, and the correlated
    threshold is half the per-part mean quantity (the spec's 0.2
    factor trips the decimal discipline: 0.2*avg is an inexact
    binary multiply, sum/(2.0*count) is a single division of a
    decimal-exact sum by an exact small-int product — deterministic
    cross-engine). The shape under test: a correlated scalar
    aggregate subquery over the FACT table itself. Catalyst
    decorrelates it to a per-partkey aggregate joined back to the
    filtered fact — two scans of lineitem, one shuffle each, no
    per-row re-execution; the plan pin asserts no nested loop
    survives. At 100 TB the rewrite is the difference between 2
    passes and |parts| passes."""
    register_views(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(_Q17_SQL)


_Q22_SQL = """
    SELECT cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM (
        SELECT CAST(c.c_nationkey % 5 AS INTEGER) AS cntrycode, c.c_acctbal
        FROM customer c
        WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          AND c.c_acctbal > (
              SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(*)
              FROM customer c2
              WHERE c2.c_acctbal > 0.0
                AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          )
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
"""


@query("sql_frontend_q22", layer="B", oracle=_Q22_SQL)
def sql_frontend_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: country code =
    c_nationkey % 5 (no c_phone to substring) and the dormancy test
    is "no order since 2000" (every customer has SOME order in this
    data, so the spec's strict NOT EXISTS selects nothing). Three
    subquery flavors in one query — an uncorrelated scalar threshold
    (above-average balance, computed as sum/count of identical
    decimal-exact operands so the double threshold is bit-identical
    cross-engine), a correlated NOT EXISTS (anti-join), and the
    outer aggregate. Catalyst broadcasts the scalar, plans the NOT
    EXISTS as a left-anti hash join on o_custkey with the date cut
    pushed into the orders scan. At 100 TB the anti-join build side
    is the date-pruned orders slice, not the full history."""
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_Q22_SQL)


# --- partsupp-surrogate TPC-H shapes (q2, q11, q16, q20) ---
# The schema has no partsupp table; these four rebuild its role from
# lineitem (the observed supplier-part relation: who actually supplied
# which part, at what unit price, in what volume). The OPERATOR shapes
# under test — q2's correlated min-over-a-join, q11's HAVING-vs-global
# scalar, q16's count-distinct + NOT IN, q20's doubly-nested IN with a
# correlated threshold — are the spec's; the surrogate only changes
# the column provenance.

_Q2_SQL = """
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(l_extendedprice / l_quantity) AS ps_supplycost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
           s.s_suppkey
    FROM part p
    JOIN ps         ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size <= 10 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
          SELECT MIN(ps2.ps_supplycost)
          FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey, s.s_suppkey
    LIMIT 100
"""


@query("sql_frontend_q2", layer="B", oracle=_Q2_SQL)
def sql_frontend_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), partsupp-surrogate: unit cost
    = MIN(l_extendedprice/l_quantity) per observed supplier-part pair.
    The shape: a correlated scalar MIN whose subquery carries its OWN
    three-dimension join stack, evaluated per outer part. Catalyst
    decorrelates to one region-filtered min-cost-per-part aggregate
    joined back on (partkey, cost) — the surrogate CTE is built once
    per consumer, each a single lineitem shuffle. The double equality
    is safe: both engines derive cost from identical IEEE divisions
    and MIN picks an element, not a sum. LIMIT rides a total ORDER BY
    (acctbal DESC then four key tiebreaks) so the cut is
    deterministic. At 100 TB the win is the same as q15: the argmax
    is a broadcast semi-filter, never a global sort of suppliers."""
    register_views(
        spark, sf_dir, ["lineitem", "part", "supplier", "nation", "region"]
    )
    return spark.sql(_Q2_SQL)


_Q11_SQL = """
    WITH natps AS (
        SELECT l.l_partkey AS ps_partkey,
               CAST(l.l_extendedprice AS DECIMAL(18,6)) AS val
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT ps_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
    FROM natps
    GROUP BY ps_partkey
    HAVING CAST(SUM(val) AS DOUBLE) > (
        SELECT 1.2 * CAST(SUM(val) AS DOUBLE) / COUNT(DISTINCT ps_partkey)
        FROM natps
    )
    ORDER BY part_value DESC, ps_partkey
"""


@query("sql_frontend_q11", layer="B", oracle=_Q11_SQL)
def sql_frontend_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), partsupp-surrogate: part value =
    total traded l_extendedprice through EUROPE suppliers (the spec's
    supplycost*availqty product would need a double->decimal cast
    whose half-boundary rounding differs between engines; a
    decimal-exact SUM has no such boundary). The shape: a grouped
    aggregate filtered against a SCALAR AGGREGATE OF THE SAME
    RELATION — the threshold subquery re-reads natps, and the spec's
    fixed fraction is replaced by 1.2x the mean part value so the
    predicate is scale-free (a fixed fraction empties at larger SF as
    part count grows). Both HAVING operands derive from decimal-exact
    sums and exact counts, so the cut is deterministic cross-engine.
    Catalyst broadcasts the scalar; two shuffles total (group-by +
    the subquery's global agg). At 100 TB one would materialize natps
    once; the plan's merit is the threshold never becoming a join."""
    register_views(spark, sf_dir, ["lineitem", "supplier", "nation", "region"])
    return spark.sql(_Q11_SQL)


_Q16_SQL = """
    WITH ps AS (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND ps.ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@query("sql_frontend_q16", layer="B", oracle=_Q16_SQL)
def sql_frontend_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), partsupp-surrogate
    (DISTINCT supplier-part pairs from lineitem; negative account
    balance stands in for the absent complaint-comment filter). The
    shape: COUNT(DISTINCT) over a NOT-IN-filtered join — NOT IN is
    the null-AWARE anti-join (one NULL in the subquery would void
    every row, so Catalyst must plan NullAwareAntiJoin/broadcast
    rather than a plain LeftAnti; s_suppkey is non-null here but the
    OPERATOR must handle it). Distinct-count shuffles twice (expand on
    (group, suppkey), then regroup) — the standard two-exchange plan,
    skew-safe because brand/type/size groups are bounded. At 100 TB
    the DISTINCT pair derivation is the expensive half: one
    deduplicating shuffle of the (partkey, suppkey) projection,
    columns pruned at the scan."""
    register_views(spark, sf_dir, ["lineitem", "part", "supplier"])
    return spark.sql(_Q16_SQL)


_Q20_SQL = """
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               SUM(l_quantity) AS ps_availqty
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_suppkey IN (
          SELECT ps.ps_suppkey
          FROM ps
          WHERE ps.ps_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
          )
          AND ps.ps_availqty > (
              SELECT SUM(l.l_quantity) * 2.0
              FROM lineitem l
              WHERE l.l_partkey = ps.ps_partkey
                AND l.l_suppkey = ps.ps_suppkey
                AND l.l_shipdate >= TIMESTAMP '1996-01-01'
                AND l.l_shipdate <  TIMESTAMP '1997-01-01'
          )
      )
    ORDER BY s.s_name
"""


@query("sql_frontend_q20", layer="B", oracle=_Q20_SQL)
def sql_frontend_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), partsupp-surrogate:
    availqty = all-time shipped quantity; a supplier qualifies when
    1996 shipments of a 'red%' part were under half their all-time
    volume. The deepest subquery nesting in the suite: IN( ps WHERE
    partkey IN(prefix-filtered part) AND availqty > correlated scalar
    over lineitem ) — three levels, the inner one correlated on TWO
    columns. Catalyst decorrelates inside-out: the scalar becomes a
    date-pruned (partkey, suppkey) aggregate left-joined to ps, the
    part IN a broadcast semi-join (prefix LIKE stays a pushable
    range-ish filter), the outer IN a semi-join to suppliers. All
    quantity comparisons are exact: quantities are integral doubles,
    so sums and the *2.0 are exact integers on both engines — no
    boundary residual. No nested loop survives (plan-pinned)."""
    register_views(
        spark, sf_dir, ["lineitem", "part", "supplier", "nation", "region"]
    )
    return spark.sql(_Q20_SQL)


_Q21_SQL = """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND n.n_regionkey = 2
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
"""


@query("sql_frontend_q21", layer="B", oracle=_Q21_SQL)
def sql_frontend_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" =
    shipped more than 60 days after the order date (the schema has no
    commit/receipt dates), everything else spec-shape — the hardest
    subquery pattern in the suite: an EXISTS and a NOT EXISTS against
    the SAME fact table as the outer query, both correlated on the
    outer row's order key with a <>-inequality on supplier, and the
    NOT EXISTS additionally referencing a SECOND outer table's column
    (o.o_orderdate) inside its predicate. The semantics: find the
    sole-late supplier of multi-supplier finished orders. Catalyst
    decorrelates both into hash joins on l_orderkey (LeftSemi then
    LeftAnti, the <> and date terms as join residuals — plan-pinned,
    no nested loop), so lineitem is scanned three times, each keyed
    shuffle on the uniform order key; the l1-side filters (status,
    lateness, nation) cut the probe before either subquery join. At
    100 TB, q21 is the canonical "three passes over the fact table
    beat one correlated loop by 10^6" demonstration."""
    register_views(spark, sf_dir, ["supplier", "lineitem", "orders", "nation"])
    return spark.sql(_Q21_SQL)
