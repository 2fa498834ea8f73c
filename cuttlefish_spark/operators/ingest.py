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
    out = dispatch_replay(spark)
    # Flatten the venue struct for a stable, hash-friendly shape; keep
    # nested photos to exercise array<struct> end-to-end.
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
