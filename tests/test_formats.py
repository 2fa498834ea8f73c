"""File-format surface (SURVEY.md §2.B row 1): the engine reads
parquet natively everywhere; this proves the CSV and JSON-lines read
paths carry the SAME rows and schema through a round-trip — the
"beyond JSON" formats the reference lacks come free from spark.read,
but only if schemas are pinned explicitly (header-inferred CSV types
and sampled JSON schemas are not reproducible contracts at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cuttlefish_spark.io import load_table

CSV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _sample(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .filter(F.col("event_id") < 500)
    )


def _assert_same(df_a, df_b):
    assert [f.simpleString() for f in df_a.schema.fields] == [
        f.simpleString() for f in df_b.schema.fields
    ]
    a = df_a.toPandas().sort_values("event_id").reset_index(drop=True)
    b = df_b.toPandas().sort_values("event_id").reset_index(drop=True)
    assert a.equals(b)


def test_csv_round_trip(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    out = str(tmp_path / "events_csv")
    src.write.option("header", True).csv(out)
    back = spark.read.schema(CSV_SCHEMA).option("header", True).csv(out)
    _assert_same(src, back)


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    out = str(tmp_path / "events_jsonl")
    src.write.json(out)
    back = spark.read.schema(CSV_SCHEMA).json(out)
    _assert_same(src, back)


def test_ntz_parquet_normalized(spark, tmp_path):
    """Regression: parquet timestamp[us] with isAdjustedToUTC=false
    (what pandas/pyarrow write by default) must load as TIMESTAMP, not
    TIMESTAMP_NTZ — round 2 lost 8 queries when the test data switched
    to this encoding. The load contract is: any ts-bearing table works
    with unix_millis() regardless of the writer's timestamp flavor."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(
                pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:00:00"]),
                pa.timestamp("us"),  # no tz => isAdjustedToUTC=false
            ),
        }
    )
    d = tmp_path / "ntz_sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    df = load_table(spark, str(d), "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    got = df.select(F.unix_millis("ts").alias("ms")).orderBy("ms").collect()
    assert [r["ms"] for r in got] == [1704067200000, 1704070800000]


def test_multiline_json_read(spark, sf_dir, tmp_path):
    """multiLine=True is the A2 parity mode (one JSON document per
    file, the reference's chapters.json shape, api-runner.rkt:171-178)."""
    import json

    rows = [{"id": "alpha", "adapter": "meetup"}, {"id": "beta", "adapter": "facebook"}]
    p = tmp_path / "chapters.json"
    p.write_text(json.dumps(rows))
    df = spark.read.option("multiLine", True).json(str(p))
    got = sorted((r["id"], r["adapter"]) for r in df.collect())
    assert got == [("alpha", "meetup"), ("beta", "facebook")]
