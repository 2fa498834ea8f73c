"""Layer A — the reference's own operator semantics, re-expressed as
declarative DataFrame plans over the `events` table.

Reference pipeline (SURVEY.md §3.1): read chapters -> fan out by
adapter -> fetch -> normalize to the canonical event schema -> validate
-> Either split -> per-key JSON sink + accounting. Each query below
exercises one of those operators on the driver's `events` table
(event_id, ts, user_id, event_type, value, props-json), where
`event_type` stands in for the adapter key and `props` for the nested
payload.

Scale posture: every query is a narrow projection/filter or a single
keyed shuffle; filters/projections push to the parquet scan, and the
window dedup shuffles once on its partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cuttlefish_spark.functions import dec_sum, get_in
from cuttlefish_spark.io import load_table
from cuttlefish_spark.registry import query


@query(
    "scan_project",
    layer="A",
    oracle="""
    SELECT event_id,
           CAST(ts AS TIMESTAMP) AS time,
           event_type AS adapter,
           user_id AS chapter_key,
           'https://events.example/' || CAST(event_id AS VARCHAR) AS url,
           value AS metric
    FROM events
    """,
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical projection + rename + URL synthesis.

    Parity: meetup.rkt:39-59 renames raw fields into the canonical
    record (link->url, name->title, ...) and facebook.rkt:41
    synthesizes the url from the id. Pure narrow map — no shuffle; the
    projection prunes the parquet scan to the 5 referenced columns.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.col("ts").alias("time"),
        F.col("event_type").alias("adapter"),
        F.col("user_id").alias("chapter_key"),
        F.concat(F.lit("https://events.example/"), F.col("event_id").cast("string")).alias("url"),
        F.col("value").alias("metric"),
    )


@query(
    "nested_json_extract",
    layer="A",
    oracle="""
    SELECT event_id,
           COALESCE(CAST(props ->> 'k' AS BIGINT), -1) AS k_val,
           COALESCE(props ->> 'missing', 'none') AS missing_val
    FROM events
    """,
)
def nested_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-path extraction with default-on-miss.

    Parity: hash.rkt:30-35 (`get-in` returns a default when any key in
    the path is absent); meetup.rkt:47-54 uses it to null-default venue
    fields. JSON path evaluation happens JVM-side (get_json_object);
    no shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        F.coalesce(get_in("props", "$.k").cast("long"), F.lit(-1)).alias("k_val"),
        get_in("props", "$.missing", default="none").alias("missing_val"),
    )


@query(
    "ts_normalize",
    layer="A",
    oracle="""
    SELECT event_id,
           epoch_ms(ts) AS epoch_ms,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(hour(ts) AS INTEGER) AS hour_utc,
           epoch_ms(ts) - (-18000000) AS local_shifted_ms
    FROM events
    """,
)
def ts_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp normalization to epoch-millis UTC + offset arithmetic.

    Parity: the reference's three normalization paths all end in
    (epoch_millis_utc, offset_millis) — facebook.rkt:22-28 (ISO8601
    with +-HHMM offset), eventbrite.rkt:54-66 (naive local + IANA zone),
    meetup.rkt:43-44 (epoch pass-through). -18000000 is the sample
    offset from data_formats.md:22. Narrow map, no shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    offset_ms = F.lit(-18000000).cast("long")
    return ev.select(
        F.col("event_id"),
        F.unix_millis("ts").alias("epoch_ms"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.hour("ts").alias("hour_utc"),
        (F.unix_millis("ts") - offset_ms).alias("local_shifted_ms"),
    )


@query(
    "dispatch_union",
    layer="A",
    oracle="""
    SELECT event_id, 'click' AS adapter, value * 2.0 AS metric
    FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, 'purchase' AS adapter, value * 1.5 AS metric
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, 'other' AS adapter, value AS metric
    FROM events WHERE event_type NOT IN ('click', 'purchase')
    """,
)
def dispatch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter dispatch: route rows by key to per-source transforms,
    then union the branches back.

    Parity: api-runner.rkt:19-22 + 129-147 routes each chapter to its
    adapter's worker fn; unknown adapters fall to a default branch
    (api-runner.rkt:144-147). In Spark this is filter-per-branch +
    unionByName — Catalyst collapses it into one scan per branch with
    pushed predicates; no shuffle.
    """
    ev = load_table(spark, sf_dir, "events")

    def branch(pred, adapter: str, metric):
        return ev.filter(pred).select(
            F.col("event_id"), F.lit(adapter).alias("adapter"), metric.alias("metric")
        )

    click = branch(F.col("event_type") == "click", "click", F.col("value") * 2.0)
    purchase = branch(F.col("event_type") == "purchase", "purchase", F.col("value") * 1.5)
    other = branch(~F.col("event_type").isin("click", "purchase"), "other", F.col("value"))
    return click.unionByName(purchase).unionByName(other)


@query(
    "dedup_lastwrite",
    layer="A",
    oracle="""
    SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC
    ) = 1
    """,
)
def dedup_lastwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins dedup by key.

    Parity: re-keying events into a hash by id keeps the last write
    (meetup.rkt:40-41, facebook.rkt:37-40). The reference's Eventbrite
    path keys by timestamp and silently drops collisions
    (eventbrite.rkt:68) — a data-loss bug we deliberately do NOT
    replicate: the tie-break here is total (ts DESC, event_id DESC).
    One shuffle on the partition key; at 100 TB this is the standard
    window-dedup pattern (AQE handles key skew).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@query(
    "error_split",
    layer="A",
    oracle="""
    SELECT event_id,
           user_id,
           CASE WHEN event_type = 'error' OR value < 0
                THEN 'ERROR' ELSE 'OK' END AS status,
           CASE WHEN event_type = 'error' OR value < 0
                THEN 'worker failed for event ' || CAST(event_id AS VARCHAR)
                ELSE NULL END AS error_msg
    FROM events
    """,
)
def error_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Either-style result tagging: success vs dead-letter.

    Parity: workers return `(id payload)` or `('ERROR msg)`
    (README.md:30-42; error construction at meetup.rkt:74-81,
    api-runner.rkt:133-140). The engine models the Either as status +
    error_msg columns; downstream `.filter(status='ERROR')` routes the
    dead-letter stream exactly like the reference's error channel
    (api-runner.rkt:55-61). Narrow map, no shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    is_err = (F.col("event_type") == "error") | (F.col("value") < 0)
    return ev.select(
        F.col("event_id"),
        F.col("user_id"),
        F.when(is_err, "ERROR").otherwise("OK").alias("status"),
        F.when(
            is_err,
            F.concat(F.lit("worker failed for event "), F.col("event_id").cast("string")),
        ).alias("error_msg"),
    )


@query(
    "keyed_output_counts",
    layer="A",
    oracle="""
    SELECT event_type,
           count(*) AS n_written,
           count(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def keyed_output_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key fan-out accounting (the WROTE:/ERROR: audit).

    Parity: the result thread counts and logs one WROTE: line per
    chapter key (api-runner.rkt:80-89); the sink writes one object per
    key (api-runner.rkt:39-52). Single keyed shuffle with map-side
    partial aggregation; the decimal-sum keeps the total
    order-independent across partitions (and so identical at any
    executor count).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_written"),
        F.countDistinct("user_id").alias("n_users"),
        dec_sum(F.col("value"), alias="total_value"),
    )


@query(
    "nest_events_per_key",
    layer="A",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)
               AS event_ids_csv
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def nest_events_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-nesting at the output boundary: collect each key's events
    back into one record — the reference keys its output map by id
    before the JSON sink (A14, meetup.rkt:40-41; sink re-nest at
    api-runner.rkt:39-52). collect_list is safe ONLY under an explicit
    sort (sort_array) — unordered collect is partition-order-dependent
    and would break result determinism at any scale; serialized as CSV
    so the cross-engine comparison stays repr-independent. One shuffle
    on user_id."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("event_id")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("event_ids_csv"),
    )
