"""Ingestion queries: the reference's end-to-end pipeline (fixture
replay) and the markdown pandas_udf, declared as rows-only checks
(neither is DuckDB-expressible: one replays adapter fixtures, the
other calls a Python renderer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuttlefish_spark.functions.markdown import markdown_to_html
from cuttlefish_spark.io import load_table
from cuttlefish_spark.registry import query
from cuttlefish_spark.sources.adapters import dispatch_replay


@query("ingest_normalize", layer="A", oracle=None)
def ingest_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole pipeline as one declarative plan: chapters
    work-list -> adapter dispatch -> fetch (fixture replay) ->
    per-source normalization to the canonical event schema -> union +
    Either status split (SURVEY.md §3.1 restatement).

    Ignores sf_dir: inputs are the inline golden fixtures
    (sources.fixtures), mirroring eventbrite.rkt:123-146."""
    return _flat_canonical(dispatch_replay(spark))


def _flat_canonical(out: DataFrame) -> DataFrame:
    """Flatten the venue struct for a stable, hash-friendly shape; keep
    nested photos (as a count) to exercise array<struct> end-to-end."""
    return out.select(
        "chapter_id",
        "event_id",
        "url",
        "time",
        F.col("utcOffset").alias("utc_offset"),
        "title",
        "description",
        F.col("venue.city").alias("venue_city"),
        F.col("venue.postalCode").alias("venue_postal"),
        F.col("venue.lon").alias("venue_lon"),
        F.col("venue.lat").alias("venue_lat"),
        F.size(F.coalesce(F.col("photos"), F.array())).alias("n_photos"),
        "status",
        "error",
    )


@query("ingest_datasource", layer="A", oracle=None)
def ingest_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pipeline as ingest_normalize, but the fetch step is a real
    Spark 4 Python DataSource (`cuttlefish_replay`): one input
    partition per chapter, so Spark's scheduler owns the fan-out the
    reference hand-built as a 3-thread pool (api-runner.rkt:118-168;
    SURVEY.md §4 custom-work item 1). Raw payloads are parsed with
    from_json per adapter and normalized by the same declarative
    converters as replay mode — fetch and convert stay split exactly
    like worker-* vs convert-json in the reference."""
    from pyspark.sql import types as T

    from cuttlefish_spark.sources import adapters as ad
    from cuttlefish_spark.sources.datasource import register

    register(spark)
    # Fetch ONCE, then branch: the three adapter branches + error split
    # all read this frame, and without a persist each one re-executes
    # the source (= re-fetches every API at scale). Caching the raw
    # fetch before fan-out is the scale-correct contract (the reference
    # likewise fetches once per chapter, api-runner.rkt:129-143).
    raw = spark.read.format("cuttlefish_replay").load().persist()
    schemas = {
        "meetup": ad._MEETUP_RAW_SCHEMA,
        "facebook": ad._FACEBOOK_RAW_SCHEMA,
        "eventbrite": ad._EVENTBRITE_RAW_SCHEMA,
    }
    cols = [f.name for f in ad.CANONICAL_SCHEMA.fields] + ["status", "error"]
    frames = []
    for adapter, schema in schemas.items():
        parsed = (
            raw.filter((F.col("adapter") == adapter) & (F.col("status") == "OK"))
            .select("chapter_id", F.from_json("payload", schema).alias("r"))
            .select("chapter_id", "r.*")
        )
        frames.append(
            ad.NORMALIZERS[adapter](parsed)
            .withColumn("status", F.lit("OK"))
            .withColumn("error", F.lit(None).cast("string"))
            .select(cols)
        )
    err = raw.filter(F.col("status") == "ERROR").select(
        "chapter_id",
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in ad.CANONICAL_SCHEMA.fields
            if f.name != "chapter_id"
        ],
        "status",
        "error",
    ).select(cols)
    out = frames[0]
    for fr in frames[1:] + [err]:
        out = out.unionByName(fr)
    return _flat_canonical(out)


@query("markdown_html", layer="A", oracle=None)
def markdown_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown -> HTML over document texts via the vectorized
    pandas_udf (facebook.rkt:30-32 parity; Arrow-batched, not per-row).
    Rows-only check."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        markdown_to_html(F.substring("text", 1, 200)).alias("html"),
    )
