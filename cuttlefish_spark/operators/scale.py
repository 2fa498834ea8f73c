"""Scale-pattern operators: the shuffle-discipline techniques a 100 TB
deployment leans on, each expressed so the small-SF oracle can verify
the *semantics* while the plan shape demonstrates the *scale path*.

- range join via bucket-explode + equi-join (no BroadcastNestedLoop)
- skewed aggregation via two-stage salting (partial agg on salted key)
- GROUPING SETS in one pass (generalizes rollup/cube, A25-style
  multi-granularity accounting)
- native session windows (F.session_window — the batch twin of the
  streaming sessionizer in cuttlefish_spark.streaming.pipeline)

Reference anchors: the reference has no joins/aggs (SURVEY.md §2.B);
these are Layer-B capabilities mandated by the build brief. The salting
pattern is the standard remedy for the reference's real skew exposure:
its chunker balances by row *count* only (chunk-list.rkt:6-18), which
at scale collapses under per-key payload skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuttlefish_spark.functions import dec_sum, hash60
from cuttlefish_spark.io import load_table
from cuttlefish_spark.registry import query


@query(
    "range_join_bucketed",
    layer="B",
    oracle="""
    SELECT o.o_orderkey,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM orders o
    JOIN events e
      ON e.ts >= o.o_orderdate
     AND e.ts < o.o_orderdate + INTERVAL 3 DAY
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY o.o_orderkey
    """,
)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (event ts within [orderdate, orderdate+3d)) executed
    as an equi-join: explode each order into its 3 covered day-buckets,
    join events on their day-bucket, then apply the residual range
    predicate. A naive inequality join plans as BroadcastNestedLoop —
    O(n*m) compares; bucketing makes it a hash join on day keys, which
    scales linearly and shuffles only on the bucket key.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.explode(
                F.sequence(
                    F.date_trunc("day", F.col("o_orderdate")),
                    F.date_trunc("day", F.col("o_orderdate") + F.expr("INTERVAL 2 DAY")),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("bucket"),
        )
    )
    events = load_table(spark, sf_dir, "events").select(
        "ts", "value", F.date_trunc("day", F.col("ts")).alias("bucket")
    )
    joined = orders.join(events, "bucket").filter(
        (F.col("ts") >= F.col("o_orderdate"))
        & (F.col("ts") < F.col("o_orderdate") + F.expr("INTERVAL 3 DAY"))
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum(F.col("value"), alias="sum_value"),
    )


@query(
    "range_join_events",
    layer="B",
    oracle="""
    WITH purch AS (
        SELECT event_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT ts AS ts_c, value,
               date_trunc('minute', ts) AS bucket
        FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT event_id, ts,
               unnest(generate_series(
                   date_trunc('minute', ts - INTERVAL 2 MINUTE),
                   date_trunc('minute', ts),
                   INTERVAL 1 MINUTE)) AS bucket
        FROM purch
    )
    SELECT p.event_id AS purchase_id,
           CAST(count(*) AS BIGINT) AS n_clicks,
           CAST(SUM(CAST(c.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM p JOIN clicks c USING (bucket)
    WHERE c.ts_c >= p.ts - INTERVAL 2 MINUTE AND c.ts_c < p.ts
    GROUP BY p.event_id
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure time-range join on OVERLAPPING streams — the value-tested
    twin of range_join_bucketed (r11 ADVICE: the orders/events date
    spans in the driver corpus are disjoint, so that query's output is
    empty at every sf and its residual predicate was plan-pinned but
    never value-exercised; both streams here come from the events
    table, overlapping by construction): each purchase is matched to
    every click in the preceding 2 minutes — no user key, time is the
    ONLY join dimension, which is what makes it a range join rather
    than the interval joins' equi+range shape.

    Same executed plan as range_join_bucketed: the range predicate
    becomes an equi-join by exploding each purchase into its 3 covered
    minute-buckets and keying clicks by their minute, with the exact
    [ts-2min, ts) residual applied after the hash join — a naive
    inequality join plans as BroadcastNestedLoop, O(n*m). Aggregates
    ride DECIMAL(18,6) (dec_sum) so the per-purchase sums are
    order-independent across engines and partitionings.

    Scale shape: one explode (3x the purchase stream, narrow), one
    hash join on minute keys (uniform, high-cardinality over a real
    time range), map-side-partial aggregation on purchase ids. Bucket
    granularity is the knob: pick it so avg rows/bucket stays O(events
    per window), which keeps candidate volume linear in output."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "ts",
        F.explode(
            F.sequence(
                F.date_trunc("minute", F.col("ts") - F.expr("INTERVAL 2 MINUTE")),
                F.date_trunc("minute", F.col("ts")),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("bucket"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("ts_c"),
        "value",
        F.date_trunc("minute", F.col("ts")).alias("bucket"),
    )
    joined = purch.join(clicks, "bucket").filter(
        (F.col("ts_c") >= F.col("ts") - F.expr("INTERVAL 2 MINUTE"))
        & (F.col("ts_c") < F.col("ts"))
    )
    return joined.groupBy(F.col("event_id").alias("purchase_id")).agg(
        F.count(F.lit(1)).alias("n_clicks"),
        dec_sum(F.col("value"), alias="sum_value"),
    )


@query(
    "skew_salted_agg",
    layer="B",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a low-cardinality (hence
    skew-prone) key: stage 1 aggregates on (event_type, salt) so every
    core gets a shard of each hot key; stage 2 combines the 16 shards
    per key. Decomposable aggs (count/sum) recombine exactly;
    count-distinct recombines via stage-1 distinct on (key, salt,
    user_id). Same result as the direct groupBy, but the heaviest key
    can no longer pin a single reducer at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.xxhash64("user_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("n_part"),
        F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("sum_part"),
        F.collect_set("user_id").alias("users_part"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("n_part").alias("n"),
            (F.sum("sum_part") / F.lit(1e6)).alias("sum_value"),
            F.size(F.array_distinct(F.flatten(F.collect_list("users_part")))).alias("n_users"),
        )
        .select("event_type", "n", "sum_value", F.col("n_users").cast("long").alias("n_users"))
    )


@query(
    "grouping_sets_agg",
    layer="B",
    oracle="""
    SELECT n_name, c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: nation-level, segment-level, and grand totals in
    ONE shuffle (grouping-set expansion happens before the exchange),
    vs three separate aggregations = three scans + three shuffles.
    Nation (25 rows) broadcasts to the customer side.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    joined.createOrReplaceTempView("_gs_cust_nation")
    return spark.sql(
        """
        SELECT n_name, c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
        FROM _gs_cust_nation
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        """
    )


@query(
    "session_window_native",
    layer="B",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    islands AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM islands
    GROUP BY user_id, session_no
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (F.session_window, 30-minute gap): one
    shuffle on user_id, sessions merged inside the aggregation — the
    exact batch twin of streaming.pipeline.session_stream, and the
    Spark-native form of the manual lag+cumsum sessionizer
    (operators.relational.sessionize). Spark defines session_end =
    last_event + gap; the oracle replays that definition via
    gaps-and-islands SQL.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum(F.col("value"), alias="sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


N_JOIN_SALTS = 8


@query(
    "skew_salted_join",
    layer="B",
    oracle="""
    WITH dim AS (
        SELECT event_type, COUNT(*) AS type_total
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(d.type_total) AS BIGINT) AS type_total,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: the fact side joins a per-type dimension on
    event_type — a 5-value key, the canonical pathological join key
    (every row of a type lands on ONE reducer in a plain shuffle
    join). The salt fix, stated explicitly: the fact side adds
    salt = hash(row) % N, the dim side explodes N replicas, and the
    join runs on (key, salt) — fan-in per task drops N-fold, by
    construction rather than by AQE heuristic. The final re-aggregate
    on the bare key is over |keys| x N partial rows, i.e. nothing.

    (With a truly dim-sized right side a broadcast join sidesteps
    skew entirely — the salt pattern is for when BOTH sides are too
    big to broadcast; the dim here stands in for that case, and the
    broadcast-join variant is pinned separately by broadcast_join.)
    Results are identical to the unsalted join, which is what the
    oracle states."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_total"))
    salted_fact = ev.select(
        "event_type",
        "value",
        (F.pmod(F.xxhash64("event_id"), F.lit(N_JOIN_SALTS))).alias("salt"),
    )
    salted_dim = dim.select(
        "event_type",
        "type_total",
        F.explode(F.array(*[F.lit(i) for i in range(N_JOIN_SALTS)])).alias("salt"),
    )
    joined = salted_fact.hint("shuffle_hash").join(
        salted_dim, ["event_type", "salt"]
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("type_total").alias("type_total"),
        dec_sum(F.col("value"), alias="sum_value"),
    )


_Z_BITS = 8
_Z_BUCKET_SHIFT = 8  # 16-bit z >> 8 = 256 layout buckets


def _interleave_expr(qx: str, qy: str, shift_fn) -> str:
    """Morton interleave of two {_Z_BITS}-bit ints as a pure-arithmetic
    expression (portable: no engine bit-concat needed): x takes even
    bit positions, y odd."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"({shift_fn(qx, i)} & 1) * {1 << (2 * i)}")
        terms.append(f"({shift_fn(qy, i)} & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_Z_SPARK = _interleave_expr("qx", "qy", lambda c, i: f"shiftright({c}, {i})")
_Z_DUCK = _interleave_expr("qx", "qy", lambda c, i: f"({c} >> {i})")


@query(
    "zorder_layout",
    layer="B",
    oracle=f"""
    WITH b AS (
        SELECT MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
               MIN(date_diff('day', DATE '1970-01-01', o_orderdate)) AS min_dy,
               MAX(date_diff('day', DATE '1970-01-01', o_orderdate)) AS max_dy
        FROM orders
    ),
    q AS (
        SELECT o_custkey AS ck,
               date_diff('day', DATE '1970-01-01', o_orderdate) AS dy,
               ((o_custkey - b.min_ck) * {(1 << _Z_BITS) - 1})
                   // (b.max_ck - b.min_ck) AS qx,
               ((date_diff('day', DATE '1970-01-01', o_orderdate) - b.min_dy)
                   * {(1 << _Z_BITS) - 1}) // (b.max_dy - b.min_dy) AS qy
        FROM orders, b
    ),
    z AS (SELECT ck, dy, CAST(({_Z_DUCK}) AS BIGINT) AS zval FROM q)
    SELECT CAST(zval // {1 << _Z_BUCKET_SHIFT} AS BIGINT) AS bucket_id,
           COUNT(*) AS n_rows,
           CAST(MIN(ck) AS BIGINT) AS min_ck, CAST(MAX(ck) AS BIGINT) AS max_ck,
           CAST(MIN(dy) AS BIGINT) AS min_day, CAST(MAX(dy) AS BIGINT) AS max_day
    FROM z GROUP BY 1
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout planning over orders on the
    (o_custkey, o_orderdate) pair — the multi-dimensional clustering
    that makes parquet min/max pruning work for EITHER predicate
    column: each dim is quantized to {_Z_BITS} bits against its global
    bounds (pure integer arithmetic — exact in both engines), bits are
    interleaved into a Morton code, and rows bucket by the code's high
    bits. The emitted table is each layout bucket's bounding box
    (min/max of BOTH dims) — tight boxes on both axes are the whole
    point; a single-column sort gives tight custkey boxes but
    full-range date boxes. The write path this plans for is
    `repartitionByRange(zval).sortWithinPartitions(zval)` into
    parquet, where footer min/max indexes then prune 2-D box queries
    on either column; the reference has no layout control at all (its
    chunker balances row counts only, chunk-list.rkt:6-18).

    Plan: a 4-value global bounds aggregate broadcast onto the scan
    (one tiny exchange), the z-code computed as a narrow arithmetic
    map, and ONE bounded aggregation on the {1 << (16 - _Z_BUCKET_SHIFT)}-key
    bucket id. All integer ops — no float quantization drift, no
    Python.
    """
    o = load_table(spark, sf_dir, "orders")
    epoch_day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    bounds = o.agg(
        F.min("o_custkey").alias("min_ck"),
        F.max("o_custkey").alias("max_ck"),
        F.min(epoch_day).alias("min_dy"),
        F.max(epoch_day).alias("max_dy"),
    )
    mx = (1 << _Z_BITS) - 1
    q = (
        o.select(F.col("o_custkey").alias("ck"), epoch_day.alias("dy"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "ck",
            "dy",
            F.expr(f"((ck - min_ck) * {mx}) div (max_ck - min_ck)").alias("qx"),
            F.expr(f"((dy - min_dy) * {mx}) div (max_dy - min_dy)").alias("qy"),
        )
    )
    z = q.select("ck", "dy", F.expr(f"CAST(({_Z_SPARK}) AS BIGINT)").alias("zval"))
    return z.groupBy(
        F.expr(f"zval div {1 << _Z_BUCKET_SHIFT}").cast("long").alias("bucket_id")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ck").cast("long").alias("min_ck"),
        F.max("ck").cast("long").alias("max_ck"),
        F.min("dy").cast("long").alias("min_day"),
        F.max("dy").cast("long").alias("max_day"),
    )


_BUCKETS = 8

# Session-scoped memo of the written bucketed tables (io.memo_key
# discipline): the point of the layout is write-ONCE-shuffle-never, so
# repeat invocations in a session must pay the join, not the write.
_bucket_memo: dict = {}


@query(
    "bucketed_join_layout",
    layer="B",
    oracle=f"""
    SELECT o.o_orderstatus AS order_status,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) * 1000000
                     AS BIGINT) AS DOUBLE) / 1000000 AS sum_price,
           CAST(0 AS BIGINT) AS n_exchanges_bucketed,
           CAST(2 AS BIGINT) AS n_exchanges_shuffled,
           CAST({_BUCKETS} AS BIGINT) AS n_buckets
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def bucketed_join_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed-layout co-located join as a DRIVER-VERIFIABLE query
    (r11 VERDICT item 5 — `tests/test_bucketing.py` proved the
    write-once-shuffle-never plan, but no declared query pinned it):
    lineitem and orders are written hash-bucketed AND bucket-sorted on
    the join key into {_BUCKETS} buckets (io.write_bucketed), then the
    fact-to-fact join runs as a SortMergeJoin with ZERO Exchange
    operators — the shuffle happened once at write time and amortizes
    over every subsequent join, the storage-layout play a 100 TB
    deployment relies on for repeated l_orderkey = o_orderkey joins
    where neither side broadcasts.

    The PLAN CONTRACT is part of the verified output, zorder_layout
    style: n_exchanges_bucketed / n_exchanges_shuffled are measured
    from the two physical plans (count of Exchange nodes in the
    bucketed join vs the plain shuffled SMJ on the raw parquet) and
    the oracle states them as the literals 0 and 2 — if bucketing ever
    stops eliminating the shuffle under the driver's vanilla session,
    the hash gate fails. The analytic columns (per-order-status row
    count, dec_sum qty/price over the joined rows) prove the join
    RESULT equals the plain join's, which is what the oracle computes.

    Write cost is paid once per (session, corpus) via the memo_key
    discipline — the second invocation reads the bucketed layout only,
    which is exactly the amortization story. Scale shape: the join is
    a zipper merge of co-bucketed sorted runs ({_BUCKETS} tasks here;
    thousands at scale), no network at all; the final 3-key aggregate
    is a map-side-partial groupBy."""
    import hashlib
    import os
    import tempfile

    from cuttlefish_spark.io import memo_key, write_bucketed
    from cuttlefish_spark.plans import checks

    def proj_li(df):
        return df.select("l_orderkey", "l_quantity", "l_extendedprice")

    def proj_o(df):
        return df.select("o_orderkey", "o_orderstatus")

    key = memo_key(spark, sf_dir, "lineitem") + memo_key(spark, sf_dir, "orders")
    names = _bucket_memo.get(key)
    if names is None:
        # Path is keyed by (corpus, applicationId), not corpus alone:
        # two concurrent sessions on one host would otherwise race on
        # the same directory — one session's mode('overwrite') rewrite
        # deleting parquet files the other's catalog entry still reads.
        app_id = spark.sparkContext.applicationId
        sfx = hashlib.md5(f"{sf_dir}|{app_id}".encode()).hexdigest()[:8]
        li_name, o_name = f"bkt_lineitem_{sfx}", f"bkt_orders_{sfx}"
        base = os.path.join(tempfile.gettempdir(), f"cuttlefish_bucketed_{sfx}")
        write_bucketed(
            proj_li(load_table(spark, sf_dir, "lineitem")),
            li_name, os.path.join(base, "lineitem"), "l_orderkey",
            buckets=_BUCKETS,
        )
        write_bucketed(
            proj_o(load_table(spark, sf_dir, "orders")),
            o_name, os.path.join(base, "orders"), "o_orderkey",
            buckets=_BUCKETS,
        )
        _bucket_memo[key] = names = (li_name, o_name)

    bl, bo = spark.table(names[0]), spark.table(names[1])
    joined = bl.hint("merge").join(bo, bl.l_orderkey == bo.o_orderkey)
    li0, o0 = (
        proj_li(load_table(spark, sf_dir, "lineitem")),
        proj_o(load_table(spark, sf_dir, "orders")),
    )
    plain = li0.hint("merge").join(o0, li0.l_orderkey == o0.o_orderkey)
    n_ex_bucketed = checks.count_exchanges(joined)
    n_ex_shuffled = checks.count_exchanges(plain)
    return (
        joined.groupBy(F.col("o_orderstatus").alias("order_status"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dec_sum(F.col("l_quantity"), alias="sum_qty"),
            dec_sum(F.col("l_extendedprice"), alias="sum_price"),
        )
        .select(
            "*",
            F.lit(n_ex_bucketed).cast("long").alias("n_exchanges_bucketed"),
            F.lit(n_ex_shuffled).cast("long").alias("n_exchanges_shuffled"),
            F.lit(_BUCKETS).cast("long").alias("n_buckets"),
        )
    )


# Bloom-filter join pruning: k hash functions; m sized at
# _BLOOM_BITS_PER_KEY * k bits per member key. 2 bits/key/hash is
# DELIBERATELY undersized (production uses ~10 bits/key for ~1% FP)
# so the false-positive channel is populated and the audit measures
# a real rate instead of a degenerate zero.
_BLOOM_K = 3
_BLOOM_BITS_PER_KEY = 2
_BLOOM_WORD_BITS = 32  # bigint words, 32 bits used => shifts stay sign-safe


@query(
    "bloom_filter_join",
    layer="B",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT s_suppkey AS k FROM supplier WHERE s_nationkey < 5
    ),
    params AS (
        SELECT COUNT(*) AS n_keys,
               {_BLOOM_BITS_PER_KEY * _BLOOM_K} * COUNT(*) AS m_bits
        FROM members
    ),
    mpos AS (
        SELECT DISTINCT
               CAST('0x' || substr(md5('bf' || CAST(j AS VARCHAR) || '#'
                                       || CAST(k AS VARCHAR)), 1, 15)
                    AS BIGINT) % m_bits AS pos
        FROM members, params,
             (SELECT unnest(range({_BLOOM_K})) AS j)
    ),
    words AS (
        SELECT pos // {_BLOOM_WORD_BITS} AS word,
               bit_or(CAST(1 AS BIGINT)
                      << CAST(pos % {_BLOOM_WORD_BITS} AS INTEGER)) AS mask
        FROM mpos GROUP BY 1
    ),
    probe_keys AS (SELECT DISTINCT l_suppkey AS k FROM lineitem),
    probe_pos AS (
        SELECT p.k,
               CAST('0x' || substr(md5('bf' || CAST(j AS VARCHAR) || '#'
                                       || CAST(p.k AS VARCHAR)), 1, 15)
                    AS BIGINT) % m_bits AS pos
        FROM probe_keys p, params,
             (SELECT unnest(range({_BLOOM_K})) AS j)
    ),
    verdicts AS (
        SELECT pp.k,
               (COUNT(*) FILTER (
                   WHERE (w.mask >> CAST(pp.pos % {_BLOOM_WORD_BITS} AS INTEGER))
                         & 1 = 1) = {_BLOOM_K}) AS pass,
               MAX(CASE WHEN m.k IS NOT NULL THEN 1 ELSE 0 END) = 1 AS member
        FROM probe_pos pp
        LEFT JOIN words w ON w.word = pp.pos // {_BLOOM_WORD_BITS}
        LEFT JOIN members m ON m.k = pp.k
        GROUP BY pp.k
    ),
    rows_cls AS (
        SELECT v.pass, v.member FROM lineitem l
        JOIN verdicts v ON v.k = l.l_suppkey
    )
    SELECT (SELECT m_bits FROM params) AS m_bits,
           (SELECT CAST(SUM(bit_count(mask)) AS BIGINT) FROM words) AS bits_set,
           (SELECT n_keys FROM params) AS n_member_keys,
           (SELECT COUNT(*) FROM verdicts) AS n_probe_keys,
           (SELECT COUNT(*) FROM verdicts WHERE pass AND NOT member)
               AS n_fp_keys,
           round((SELECT COUNT(*) FROM verdicts WHERE pass AND NOT member)
                 / CAST(nullif((SELECT COUNT(*) FROM verdicts
                                WHERE NOT member), 0) AS DOUBLE), 6)
               AS key_fp_rate,
           (SELECT COUNT(*) FROM rows_cls) AS n_rows,
           (SELECT COUNT(*) FROM rows_cls WHERE pass) AS rows_pass,
           (SELECT COUNT(*) FROM rows_cls WHERE member) AS rows_true,
           (SELECT COUNT(*) FROM rows_cls WHERE pass AND NOT member)
               AS rows_fp,
           round(1.0 - (SELECT COUNT(*) FROM rows_cls WHERE pass)
                 / CAST((SELECT COUNT(*) FROM rows_cls) AS DOUBLE), 6)
               AS pruned_frac
    """,
)
def bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning, made explicit and auditable: build a
    {_BLOOM_K}-hash Bloom filter over the member keys (suppliers of
    nations 0-4), probe every lineitem supplier key against it, and
    report the filter's effectiveness — rows pruned before the join
    would shuffle, true matches kept (a Bloom filter NEVER drops a
    member: rows_true rows all pass), and the measured false-positive
    channel (key_fp_rate vs the (1-e^(-kn/m))^k theory line; m is
    deliberately undersized at {_BLOOM_BITS_PER_KEY} bits/key/hash so
    the channel is populated — production sizes ~10 bits/key for ~1%).

    This is the technique behind Spark's own runtime row-level filters
    (spark.sql.optimizer.runtime.bloomFilter.enabled) and every
    shuffle-join pre-filter at 100 TB: the filter is O(m) bits built
    from one pass over the SMALL side, ships as a broadcast, and
    eliminates (1 - fp) of the non-matching big side BEFORE the
    exchange — the shuffle that dominates a 100 TB join shrinks by the
    selectivity of the semi-join, at the cost of a bitmap lookup per
    row. All hashing is the portable 60-bit md5 (functions.hash60), the
    bitmap is bigint words filled with bit_or / tested with shifts —
    exact integer arithmetic, so DuckDB replays the filter bit-for-bit.

    Plan shape: members -> {_BLOOM_K}-way position explode -> groupBy
    word (bounded: m/{_BLOOM_WORD_BITS} rows) builds the filter; the
    probe side classifies its key DICTIONARY (ndv keys, not rows) with
    a broadcast join on word, then the per-key verdicts broadcast back
    onto the fact rows — the big table is scanned once, never exploded.
    """
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")

    members = sup.filter(F.col("s_nationkey") < 5).select(
        F.col("s_suppkey").alias("k")
    ).distinct()
    params = members.agg(
        F.count(F.lit(1)).alias("n_keys"),
        (F.lit(_BLOOM_BITS_PER_KEY * _BLOOM_K) * F.count(F.lit(1))).alias("m_bits"),
    )

    js = F.explode(F.array(*[F.lit(j) for j in range(_BLOOM_K)])).alias("j")

    def positions(df: DataFrame) -> DataFrame:
        """(k, pos) pairs: the {_BLOOM_K} filter positions of each key."""
        return (
            df.select("k", js)
            .crossJoin(F.broadcast(params.select("m_bits")))
            .select(
                "k",
                (
                    hash60(
                        F.concat(
                            F.lit("bf"),
                            F.col("j").cast("string"),
                            F.lit("#"),
                            F.col("k").cast("string"),
                        )
                    )
                    % F.col("m_bits")
                ).alias("pos"),
            )
        )

    words = (
        positions(members)
        .select("pos")
        .distinct()
        .groupBy(F.expr(f"pos div {_BLOOM_WORD_BITS}").alias("word"))
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(1L, CAST(pos % {_BLOOM_WORD_BITS} AS INT))")
            ).alias("mask")
        )
    )

    probe_keys = li.select(F.col("l_suppkey").alias("k")).distinct()
    verdicts = (
        positions(probe_keys)
        .join(
            F.broadcast(words),
            F.expr(f"pos div {_BLOOM_WORD_BITS}") == F.col("word"),
            "left",
        )
        .join(
            F.broadcast(members.withColumn("is_m", F.lit(1))),
            "k",
            "left",
        )
        .groupBy("k")
        .agg(
            (
                F.sum(
                    F.when(
                        F.expr(
                            f"shiftright(mask, CAST(pos % {_BLOOM_WORD_BITS}"
                            " AS INT)) & 1"
                        )
                        == 1,
                        1,
                    ).otherwise(0)
                )
                == _BLOOM_K
            ).alias("pass"),
            (F.max(F.coalesce(F.col("is_m"), F.lit(0))) == 1).alias("member"),
        )
    )

    rows_cls = li.select(F.col("l_suppkey").alias("k")).join(
        F.broadcast(verdicts), "k"
    )

    filter_stats = words.agg(
        F.sum(F.bit_count("mask")).cast("long").alias("bits_set")
    )
    key_stats = verdicts.agg(
        F.count(F.lit(1)).alias("n_probe_keys"),
        F.sum(F.when(F.col("pass") & ~F.col("member"), 1).otherwise(0)).alias(
            "n_fp_keys"
        ),
        F.sum(F.when(~F.col("member"), 1).otherwise(0)).alias("n_nonmember_keys"),
    )
    row_stats = rows_cls.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0)).alias("rows_pass"),
        F.sum(F.when(F.col("member"), 1).otherwise(0)).alias("rows_true"),
        F.sum(F.when(F.col("pass") & ~F.col("member"), 1).otherwise(0)).alias(
            "rows_fp"
        ),
    )
    return (
        params.crossJoin(filter_stats)
        .crossJoin(key_stats)
        .crossJoin(row_stats)
        .select(
            F.col("m_bits").cast("long").alias("m_bits"),
            "bits_set",
            F.col("n_keys").cast("long").alias("n_member_keys"),
            F.col("n_probe_keys").cast("long").alias("n_probe_keys"),
            F.col("n_fp_keys").cast("long").alias("n_fp_keys"),
            F.round(
                F.col("n_fp_keys")
                / F.nullif(F.col("n_nonmember_keys"), F.lit(0)).cast("double"),
                6,
            ).alias("key_fp_rate"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("rows_pass").cast("long").alias("rows_pass"),
            F.col("rows_true").cast("long").alias("rows_true"),
            F.col("rows_fp").cast("long").alias("rows_fp"),
            F.round(
                F.lit(1.0) - F.col("rows_pass") / F.col("n_rows").cast("double"), 6
            ).alias("pruned_frac"),
        )
    )


_SHUFFLE_SHARDS = 8


@query(
    "training_shuffle",
    layer="C",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                   AS BIGINT) AS hv
        FROM documents
    )
    SELECT doc_id,
           hv % {_SHUFFLE_SHARDS} AS shard,
           CAST(row_number() OVER (
               PARTITION BY hv % {_SHUFFLE_SHARDS}
               ORDER BY hv, doc_id) AS BIGINT) AS pos
    FROM h
    """,
)
def training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle WITHOUT a global
    sort: every doc gets a portable 60-bit hash, shard = hash % S, and
    position-within-shard = rank by (hash, doc_id) inside the shard.
    Reading shards round-robin replays one fixed pseudo-random
    permutation of the corpus — the reproducible epoch-order a
    training pipeline needs (same order on every engine/run/cluster,
    unlike df.orderBy(rand())), and adding documents perturbs only
    their own hash positions.

    Scale shape: ONE shuffle on the shard key, then a per-shard ordered
    window — no empty-partition-spec global window anywhere (the
    test_no_global_ordered_windows pin applies). S is 8 here so the
    oracle is readable; production sets S ~ 10x executor count (each
    shard = one output file, each window sorts corpus/S rows), which
    keeps the per-task sort in memory at any corpus size. The md5-hash
    order is uniform, so shards are balanced within sqrt-noise."""
    from pyspark.sql import Window

    from cuttlefish_spark.functions import hash60
    from cuttlefish_spark.io import spread

    d = spread(spark, load_table(spark, sf_dir, "documents"))
    h = d.select(
        "doc_id", hash60(F.col("doc_id").cast("string")).alias("hv")
    ).withColumn("shard", F.col("hv") % _SHUFFLE_SHARDS)
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )
