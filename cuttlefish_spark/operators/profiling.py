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

    One branch per column, unioned: each branch is groupBy(col) ->
    tiny second aggregate over the distinct values (null count rides
    along as the null group's count; n_distinct = the non-null group
    count; min/max over the already-distinct values). On columnar
    parquet the five "scans" each read ONE column, so total bytes
    read equal a single all-column scan — but every branch stays a
    two-phase HashAggregate. The all-in-one-agg() alternative
    (multi-COUNT(DISTINCT) in one pass) plans as a 5x Expand through
    SortAggregate — measured 3-5x slower at sf0.1 and strictly worse
    at 100 TB, where the Expand multiplies shuffle volume by the
    column count while the per-column branches shuffle only distinct
    values. Numeric min/max are computed on the native type and cast
    to string after, preserving numeric (not lexicographic)
    ordering."""
    from functools import reduce

    o = load_table(spark, sf_dir, "orders")
    parts = []
    for c in _PROFILE_COLS:
        g = o.groupBy(c).agg(F.count(F.lit(1)).alias("cnt"))
        parts.append(
            g.agg(
                F.lit(c).alias("column_name"),
                F.coalesce(
                    F.sum(F.when(F.col(c).isNull(), F.col("cnt"))), F.lit(0)
                ).alias("n_nulls"),
                F.count(F.when(F.col(c).isNotNull(), 1)).alias("n_distinct"),
                F.min(c).cast("string").alias("min_value"),
                F.max(c).cast("string").alias("max_value"),
            )
        )
    return reduce(lambda a, b: a.unionAll(b), parts)


_FK_EDGES = [
    ("orders.o_custkey -> customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_orderkey -> orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey -> part.p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
]


def _fk_oracle(label: str, child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{label}' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS n_child_rows,
           CAST(COUNT(*) FILTER (WHERE p.{pk} IS NULL) AS BIGINT) AS n_orphans
    FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
      ON c.{fk} = p.{pk}
    """


@query(
    "fk_integrity_audit",
    layer="B",
    oracle=" UNION ALL ".join(_fk_oracle(*e) for e in _FK_EDGES),
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: for each declared FK edge, the
    child row count and the number of orphans (child keys with no
    parent) — the join-safety precondition every pipeline should
    assert before trusting inner joins, since an orphaned FK silently
    DROPS rows from an inner join.

    Each edge is a left join against the DISTINCT parent keys: the
    parent side collapses to its key column (broadcast-sized for dims
    even at 100 TB — customer keys, not customer rows), and the audit
    aggregate is a 1-row-per-edge union. Orphan counting via
    IS NULL on the parent key after the left join keeps the whole
    check one equi-join per edge, no subquery-per-row."""
    from functools import reduce

    parts = []
    for label, child, fk, parent, pk in _FK_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(fk).alias("fk_val"))
        p = load_table(spark, sf_dir, parent).select(
            F.col(pk).alias("pk_val")
        ).distinct()
        joined = c.join(F.broadcast(p), c.fk_val == p.pk_val, "left")
        parts.append(
            joined.agg(
                F.lit(label).alias("fk_edge"),
                F.count(F.lit(1)).alias("n_child_rows"),
                F.count(F.when(F.col("pk_val").isNull(), 1)).alias("n_orphans"),
            )
        )
    return reduce(lambda a, b: a.unionAll(b), parts)


_SKEW_COLS = ["user_id", "event_type"]


def _skew_oracle(c: str) -> str:
    return f"""
    SELECT '{c}' AS key_col,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           SUM(cnt) * 1.0 / COUNT(*) AS mean_per_key,
           round(quantile_cont(cnt, 0.5), 6) AS p50_per_key,
           round(quantile_cont(cnt, 0.99), 6) AS p99_per_key,
           CAST(MAX(cnt) AS BIGINT) AS max_per_key,
           MAX(cnt) * 1.0 / SUM(cnt) AS top_share,
           MAX(cnt) * 1.0 * COUNT(*) / SUM(cnt) AS skew_ratio
    FROM (SELECT {c}, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY {c})
    """


@query(
    "skew_profile",
    layer="B",
    oracle=" UNION ALL ".join(_skew_oracle(c) for c in _SKEW_COLS),
)
def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew diagnostics for prospective shuffle keys — the
    measurement that decides between a plain hash shuffle, AQE skew
    handling, and explicit salting (skew_salted_agg/join are the
    treatments; this is the diagnosis). Per candidate key column of
    `events`: row/key counts, per-key mean and p50/p99, the hottest
    key's absolute count and share, and skew_ratio = max/mean — the
    single number a 1000-executor shuffle lives or dies by (a ratio
    near 1 means balanced reducers; event_type's ~n_keys-sized ratio
    means one reducer would own ~1/n_keys of 100 TB).

    Plan per column: one count aggregation on the key (map-side
    partials make even the skewed key safe — partials shrink each hot
    key to one row per map task) into a single tiny percentile
    aggregate; branches union. Cross-engine exactness: counts are
    longs; mean/share/ratio are divisions of exact longs emitted
    UNROUNDED (IEEE division of identical integers is bit-identical in
    both engines, while round(,6) of an integer quotient has a ~1/q
    chance of landing on a half boundary the engines round differently
    — PLANS.md Notes); percentiles use the shared continuous-
    interpolation definition (Spark percentile == DuckDB
    quantile_cont) over exact long counts, rounded to 6.
    """
    ev = load_table(spark, sf_dir, "events")
    parts = []
    for c in _SKEW_COLS:
        cnts = ev.groupBy(c).agg(F.count(F.lit(1)).alias("cnt"))
        parts.append(
            cnts.agg(
                F.lit(c).alias("key_col"),
                F.sum("cnt").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                (F.sum("cnt") / F.count(F.lit(1))).alias("mean_per_key"),
                F.round(F.expr("percentile(cnt, 0.5)"), 6).alias("p50_per_key"),
                F.round(F.expr("percentile(cnt, 0.99)"), 6).alias("p99_per_key"),
                F.max("cnt").alias("max_per_key"),
                (F.max("cnt") / F.sum("cnt")).alias("top_share"),
                (F.max("cnt") * F.count(F.lit(1)) / F.sum("cnt")).alias(
                    "skew_ratio"
                ),
            )
        )
    from functools import reduce as _reduce

    return _reduce(lambda a, b: a.unionAll(b), parts)


# ---------------------------------------------------------------------------
# distribution_drift_psi — population-stability-index drift monitor
# ---------------------------------------------------------------------------

_PSI_BUCKETS = 10
_PSI_WIDTH = 64  # n_chars bucket width; bucket = min(9, n_chars div 64)

_PSI_SQL = f"""
    WITH b AS (
        SELECT source,
               least({_PSI_BUCKETS - 1}, n_chars // {_PSI_WIDTH}) AS bucket
        FROM documents
    ),
    spine AS (
        SELECT s.source, g.bucket
        FROM (SELECT DISTINCT source FROM b) s
        CROSS JOIN (SELECT unnest(range({_PSI_BUCKETS})) AS bucket) g
    ),
    src AS (
        SELECT spine.source, spine.bucket,
               CAST(count(b.source) AS BIGINT) AS c
        FROM spine LEFT JOIN b
          ON b.source = spine.source AND b.bucket = spine.bucket
        GROUP BY spine.source, spine.bucket
    ),
    gcnt AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS g FROM b GROUP BY bucket
    ),
    n AS (
        SELECT CAST(count(*) AS BIGINT) AS n_total FROM b
    ),
    terms AS (
        SELECT src.source, src.bucket, sn.sn,
               (src.c + 1.0) / (sn.sn + {_PSI_BUCKETS}) AS p,
               (coalesce(gcnt.g, 0) + 1.0) / (n.n_total + {_PSI_BUCKETS}) AS q
        FROM src
        JOIN (SELECT source, CAST(sum(c) AS BIGINT) AS sn
              FROM src GROUP BY source) sn USING (source)
        LEFT JOIN gcnt ON gcnt.bucket = src.bucket
        CROSS JOIN n
    )
    SELECT source,
           CAST(MAX(sn) AS BIGINT) AS n_docs,
           round(CAST(SUM(CAST(round((p - q) * ln(p / q), 9)
                                AS DECIMAL(28,9))) AS DOUBLE), 6) AS psi
    FROM terms
    GROUP BY source
"""

@query("distribution_drift_psi", layer="C", oracle=_PSI_SQL)
def distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per source against the corpus-wide
    distribution — the standard data-drift monitor a production
    pipeline runs on every new snapshot/source before mixing it in
    (PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 investigate):
    PSI = sum_buckets (p_i - q_i) * ln(p_i / q_i) over a fixed
    {_PSI_BUCKETS}-bucket histogram of document length, with Laplace
    (+1) smoothing so empty buckets contribute finite terms instead of
    an epsilon hack — the smoothed p/q are exact rationals of integer
    counts, so both engines compute identical IEEE terms.

    Determinism: each bucket term is round((p-q)*ln(p/q), 9) folded
    through DECIMAL(28,9) — the order-independent-sum contract — and
    the final PSI rounds to 6. The bucket spine is a static
    {_PSI_BUCKETS}-row cross join so every (source, bucket) pair
    exists even when empty (LEFT-join + coalesce, never a missing
    term).

    Scale shape: one scan -> groupBy(source, bucket) with map-side
    partials (bounded: sources x {_PSI_BUCKETS} rows), a broadcast of
    the {_PSI_BUCKETS}-row global histogram, and an O(sources) final
    aggregate. Monitoring one more snapshot at 100 TB is one more
    bounded aggregation, never a re-shuffle of history.
    """
    d = load_table(spark, sf_dir, "documents")
    b = d.select(
        "source",
        F.least(
            F.lit(_PSI_BUCKETS - 1), F.expr(f"n_chars div {_PSI_WIDTH}")
        ).alias("bucket"),
    )
    counts = b.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("c"))
    return psi_from_counts(spark, counts)


def psi_from_counts(spark: SparkSession, counts: DataFrame) -> DataFrame:
    """The PSI arithmetic from a (source, bucket, c) histogram — shared
    by distribution_drift_psi (batch scan) and streaming_drift_psi
    (histogram accumulated on the streaming engine, PSI finished on the
    drained monitoring table). All inputs are integer counts, so the
    Laplace-smoothed p/q rationals and the decimal-folded term sum are
    engine-identical regardless of which engine built the histogram."""
    b = counts.select("source", "bucket", "c")
    spine = (
        b.select("source")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(_PSI_BUCKETS).select(F.col("id").alias("bucket"))
            )
        )
    )
    src = (
        spine.join(counts, ["source", "bucket"], "left")
        .select("source", "bucket", F.coalesce("c", F.lit(0)).alias("c"))
    )
    sn = src.groupBy("source").agg(F.sum("c").alias("sn"))
    glob = b.groupBy("bucket").agg(F.sum("c").alias("g"))
    n = b.agg(F.sum("c").alias("n_total"))
    p = (F.col("c") + F.lit(1.0)) / (F.col("sn") + F.lit(float(_PSI_BUCKETS)))
    q = (F.coalesce(F.col("g"), F.lit(0)) + F.lit(1.0)) / (
        F.col("n_total") + F.lit(float(_PSI_BUCKETS))
    )
    terms = (
        src.join(F.broadcast(sn), "source")
        .join(F.broadcast(glob), "bucket", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "sn",
            F.round((p - q) * F.log(p / q), 9).cast("decimal(28,9)").alias("term"),
        )
    )
    return terms.groupBy("source").agg(
        F.max("sn").cast("long").alias("n_docs"),
        F.round(F.sum("term").cast("double"), 6).alias("psi"),
    )
