"""Streaming == batch: drain the events table through the watermarked
streaming plans and compare with the batch queries on identical input.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cuttlefish_spark.registry import load_all
from cuttlefish_spark.streaming.pipeline import (
    read_events_stream,
    run_available_now,
    session_stream,
    tumbling_stream,
)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_tumbling_stream_matches_batch(spark, sf_dir, stream_dir):
    stream = tumbling_stream(read_events_stream(spark, stream_dir))
    run_available_now(stream, "tumbling_mem")
    got = (
        spark.sql("SELECT * FROM tumbling_mem")
        .toPandas()
        .sort_values(["hour_start", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        load_all()["tumbling_window"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values(["hour_start", "event_type"])
        .reset_index(drop=True)
    )
    assert got.equals(want[got.columns])


def test_session_stream_plausible(spark, stream_dir, sf_dir):
    """Session windows: same session count as the batch sessionizer and
    no session shorter than its event count allows."""
    stream = session_stream(read_events_stream(spark, stream_dir))
    run_available_now(stream, "sessions_mem")
    got = spark.sql("SELECT * FROM sessions_mem").toPandas()
    batch = load_all()["sessionize"].fn(spark, sf_dir).toPandas()
    assert len(got) == len(batch)
    assert int(got["n_events"].sum()) == int(batch["n_events"].sum())


def test_rate_limited_ingest(spark, stream_dir):
    """maxFilesPerTrigger bounds per-batch intake (A22 analogue)."""
    stream = tumbling_stream(read_events_stream(spark, stream_dir, max_files_per_trigger=1))
    q = run_available_now(stream, "tumbling_rl")
    assert q.lastProgress is not None
    assert spark.sql("SELECT count(*) FROM tumbling_rl").first()[0] > 0


def test_dedup_stream_first_seen(spark, sf_dir, tmp_path):
    """Stateful streaming dedup: the input dir holds the same events
    file TWICE; across micro-batches every event_id must come out
    exactly once (state survives between triggers)."""
    import shutil

    from cuttlefish_spark.io import load_table
    from cuttlefish_spark.streaming.pipeline import dedup_stream

    d = tmp_path / "dup_stream"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-001.parquet")

    stream = dedup_stream(
        read_events_stream(spark, str(d), max_files_per_trigger=1)
    )
    run_available_now(stream, "dedup_mem", mode="append")
    got = spark.sql("SELECT count(*) n, count(DISTINCT event_id) d FROM dedup_mem").first()
    n_ids = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert got["n"] == got["d"] == n_ids


def test_interval_join_stream_matches_batch(spark, sf_dir, stream_dir):
    """Stream-stream interval join == the equivalent batch range join
    on identical input (purchases x same-user clicks within 1h)."""
    from cuttlefish_spark.io import load_table
    from cuttlefish_spark.streaming.pipeline import interval_join_stream

    stream = interval_join_stream(read_events_stream(spark, stream_dir))
    run_available_now(stream, "ij_mem", mode="append")
    got = spark.sql("SELECT * FROM ij_mem")

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").selectExpr(
        "user_id c_user", "ts click_ts", "event_id click_id"
    )
    purchases = ev.filter("event_type = 'purchase'").selectExpr(
        "user_id p_user", "ts purchase_ts", "event_id purchase_id", "value purchase_value"
    )
    want = purchases.join(
        clicks,
        (purchases.p_user == clicks.c_user)
        & (clicks.click_ts <= purchases.purchase_ts)
        & (clicks.click_ts >= purchases.purchase_ts - F.expr("INTERVAL 60 MINUTES")),
    )
    assert got.count() == want.count() > 0
    a = sorted(tuple(r) for r in got.select("purchase_id", "click_id").collect())
    b = sorted(tuple(r) for r in want.select("purchase_id", "click_id").collect())
    assert a == b
