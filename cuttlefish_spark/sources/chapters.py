"""Chapters work-list ingestion: the reference's JSON config-table scan
and map->rows explode, as Spark operators.

Parity anchors (/root/reference/private):
- A2 JSON table scan, crash-out on missing path  api-runner.rkt:171-178
- A3 id-keyed hash -> list of (id, payload) rows api-runner.rkt:152-155
- chapters file shape (36 rows, id -> {title, dataService:{adapter,
  id[, organization]}})                          data/chapters.json:1-255,
                                                 data/data_formats.md:1-13

The chapters file is a JSON *map* keyed by dynamic chapter ids, so a
plain spark.read.json would infer one COLUMN per chapter. The faithful
relational form reads the document whole and explodes
map_entries(from_json(..., MapType)) into rows — dynamic keys become a
key column, which is the A3 hash->list semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHAPTER_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField(
            "dataService",
            T.StructType(
                [
                    T.StructField("adapter", T.StringType()),
                    T.StructField("id", T.StringType()),
                    T.StructField("organization", T.StringType()),
                ]
            ),
        ),
    ]
)


def read_chapters_json(spark: SparkSession, path: str) -> DataFrame:
    """Read a chapters config file into the canonical work-list frame
    [chapter_id, title, adapter, service_id, organization].

    Missing path raises (AnalysisException) — the reference crashes out
    likewise (api-runner.rkt:174-178). Unknown/missing nested fields
    degrade to null, matching the reference's lenient path access
    (hash.rkt:30-35)."""
    doc = spark.read.text(path, wholetext=True)
    entries = doc.select(
        F.explode(
            F.map_entries(
                F.from_json(
                    F.col("value"), T.MapType(T.StringType(), CHAPTER_PAYLOAD_SCHEMA)
                )
            )
        ).alias("e")
    )
    return entries.select(
        F.col("e.key").alias("chapter_id"),
        F.col("e.value.title").alias("title"),
        F.col("e.value.dataService.adapter").alias("adapter"),
        F.col("e.value.dataService.id").alias("service_id"),
        F.col("e.value.dataService.organization").alias("organization"),
    )


def worklist(chapters: DataFrame) -> list[tuple]:
    """Collect the chapters frame to the driver-side work list consumed
    by dispatch_replay. The chapters table is *config*, not data (36
    rows in the shipped reference file) — driver-residency mirrors the
    reference broadcasting config to its workers (api-runner.rkt:196-199)
    and is the one sanctioned collect in the engine."""
    return [
        (r.chapter_id, r.title, r.adapter, r.service_id, r.organization)
        for r in chapters.collect()
    ]


def convert_chapters_yaml(spark: SparkSession, yaml_path: str,
                          default_adapter: str = "meetup") -> DataFrame:
    """YAML chapters -> canonical work-list frame, injecting the
    default adapter where absent (A26 parity,
    utils/convert-chapters-yaml.rkt:29-38). Driver-side yaml parse of a
    config-sized file, then createDataFrame — same driver-residency
    rationale as worklist()."""
    import yaml  # baked into this container; config-sized input only

    with open(yaml_path) as fh:
        doc = yaml.safe_load(fh) or {}
    rows = []
    for chapter_id, payload in doc.items():
        payload = payload or {}
        svc = payload.get("dataService") or {}
        rows.append(
            {
                "chapter_id": str(chapter_id),
                "title": payload.get("title"),
                "adapter": svc.get("adapter") or default_adapter,
                "service_id": svc.get("id"),
                "organization": svc.get("organization"),
            }
        )
    schema = T.StructType(
        [
            T.StructField("chapter_id", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("adapter", T.StringType()),
            T.StructField("service_id", T.StringType()),
            T.StructField("organization", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
