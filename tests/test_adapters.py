"""Adapter normalization tests — the golden-fixture strategy of the
reference (eventbrite.rkt:123-146: run convert-json on a captured
payload, assert canonical shape), extended with the DST cases the
reference never tested.
"""

from __future__ import annotations

from cuttlefish_spark.sinks.json_sink import audit_counts
from cuttlefish_spark.sources.adapters import (
    CANONICAL_SCHEMA,
    dispatch_replay,
)

CANONICAL_KEYS = {
    "chapter_id", "event_id", "url", "time", "utcOffset", "title",
    "description", "venue", "photos",
}
VENUE_KEYS = {"name", "address1", "address2", "country", "city", "postalCode", "lon", "lat"}


def test_canonical_shape(spark):
    """Shape parity with the reference's golden test
    (eventbrite.rkt:136-146): canonical key set + venue key set."""
    out = dispatch_replay(spark)
    assert set(f.name for f in CANONICAL_SCHEMA.fields) == CANONICAL_KEYS
    fields = {f.name: f for f in out.schema.fields}
    assert CANONICAL_KEYS <= set(fields)
    assert {f.name for f in fields["venue"].dataType.fields} == VENUE_KEYS


def test_meetup_normalization(spark):
    rows = {r["event_id"]: r for r in dispatch_replay(spark).filter("chapter_id='newyork'").collect()}
    e = rows["zvbxrpl2"]
    assert e["url"].startswith("https://www.meetup.com/")  # link -> url rename
    assert e["time"] == 1526425200000 and e["utcOffset"] == -14400000  # epoch pass-through
    assert e["venue"]["postalCode"] == "10013"  # zip -> postalCode
    assert [p["url"] for p in e["photos"]] == [
        "https://photos.meetupstatic.com/p1.jpeg",
        "https://photos.meetupstatic.com/p2.jpeg",
    ]
    assert e["photos"][0]["width"] is None  # null-defaulted (meetup.rkt:55-58)
    # default-on-miss: absent venue/photo_album degrade to nulls/empty
    m = rows["qxw9yzl3"]
    assert m["venue"]["name"] is None and m["photos"] == []


def test_facebook_offset_and_markdown(spark):
    rows = {r["event_id"]: r for r in dispatch_replay(spark).filter("chapter_id='stlouis'").collect()}
    e = rows["186112975332637"]
    # 2018-05-15T19:00:00-0500 == 2018-05-16T00:00:00Z
    assert e["time"] == 1526428800000
    assert e["utcOffset"] == -18000000  # -05:00 in millis (facebook.rkt:22-28)
    assert e["url"] == "https://facebook.com/186112975332637"  # url synthesis
    assert e["description"].startswith('<div class="event-api-content">')
    assert "<strong>" in e["description"]  # markdown rendered
    assert e["photos"] is None  # facebook.rkt:55


def test_eventbrite_dst_offsets(spark):
    rows = {r["event_id"]: r for r in dispatch_replay(spark).filter("chapter_id='london'").collect()}
    # Europe/London before DST: offset 0
    assert rows["44544109937"]["utcOffset"] == 0
    assert rows["44544109937"]["time"] == 1520533800000  # == fixture utc
    # Europe/London after DST: +1h
    assert rows["44544109938"]["utcOffset"] == 3600000
    assert rows["44544109938"]["time"] == 1523554200000
    # America/New_York on the DST transition day: EDT -4h
    assert rows["44544109939"]["utcOffset"] == -14400000
    assert rows["44544109939"]["time"] == 1520791200000
    # stringified lat/lon cast to double
    assert abs(rows["44544109937"]["venue"]["lat"] - 51.5229) < 1e-9


def test_unknown_adapter_dead_letter(spark):
    """Unknown adapter -> ERROR row (api-runner.rkt:144-147)."""
    out = dispatch_replay(spark)
    errs = out.filter("status = 'ERROR'").collect()
    assert len(errs) == 1
    assert errs[0]["chapter_id"] == "atlantis"
    assert "carrierpigeon" in errs[0]["error"]
    assert out.filter("status = 'OK'").count() == 7  # 2 meetup + 2 fb + 3 eb


def test_audit_counts(spark):
    audit = {
        (r["chapter_id"], r["status"]): (r["n_events"], r["log_line"])
        for r in audit_counts(dispatch_replay(spark)).collect()
    }
    assert audit[("newyork", "OK")][0] == 2
    assert audit[("newyork", "OK")][1] == "WROTE: newyork"
    assert audit[("atlantis", "ERROR")][1] == "ERROR: atlantis"


def test_datasource_matches_replay(spark, sf_dir):
    """The Spark-4 Python DataSource fetch path (one input partition
    per chapter, scheduler-owned fan-out) must produce byte-identical
    canonical rows to the driver-side replay path."""
    from cuttlefish_spark.operators.ingest import ingest_datasource, ingest_normalize

    a = sorted(tuple(r) for r in ingest_datasource(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in ingest_normalize(spark, sf_dir).collect())
    assert a == b
    assert len(a) == 8


def test_datasource_partitions_per_chapter(spark):
    """Fan-out parity with the reference's work-list chunking: the
    source exposes one input partition per chapter (A5 superseded by
    task scheduling)."""
    from cuttlefish_spark.sources.datasource import register

    register(spark)
    raw = spark.read.format("cuttlefish_replay").load()
    assert raw.rdd.getNumPartitions() == 4


def test_read_chapters_json(spark, tmp_path):
    """A2/A3 parity: map-shaped chapters JSON -> one row per chapter
    with dynamic keys as a column; missing nested fields -> null;
    missing file -> error."""
    import json

    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    from cuttlefish_spark.sources.chapters import read_chapters_json, worklist

    doc = {
        "newyork": {"title": "New York",
                    "dataService": {"adapter": "meetup", "id": "papers-we-love"}},
        "london": {"title": "London",
                   "dataService": {"adapter": "eventbrite",
                                   "id": "pwl-london", "organization": "2417467656"}},
        "ghost": {"title": "No Service"},
    }
    p = tmp_path / "chapters.json"
    p.write_text(json.dumps(doc))

    rows = {r.chapter_id: r for r in read_chapters_json(spark, str(p)).collect()}
    assert set(rows) == {"newyork", "london", "ghost"}
    assert rows["newyork"].adapter == "meetup" and rows["newyork"].organization is None
    assert rows["london"].organization == "2417467656"
    assert rows["ghost"].adapter is None  # lenient path access

    wl = worklist(read_chapters_json(spark, str(p)))
    assert ("london", "London", "eventbrite", "pwl-london", "2417467656") in wl

    with pytest.raises(AnalysisException):
        read_chapters_json(spark, str(tmp_path / "missing.json")).collect()


def test_chapters_drive_dispatch(spark, tmp_path):
    """End-to-end config->pipeline: a chapters file drives
    dispatch_replay exactly like the inline fixture work-list."""
    import json

    from cuttlefish_spark.sources.chapters import read_chapters_json, worklist

    doc = {"newyork": {"title": "New York",
                       "dataService": {"adapter": "meetup", "id": "papers-we-love"}}}
    p = tmp_path / "chapters.json"
    p.write_text(json.dumps(doc))
    out = dispatch_replay(spark, worklist(read_chapters_json(spark, str(p))))
    assert out.filter("status = 'OK'").count() == 2  # the two meetup fixture events


def test_convert_chapters_yaml(spark, tmp_path):
    """A26 parity: YAML -> work-list rows with the default adapter
    injected where absent."""
    from cuttlefish_spark.sources.chapters import convert_chapters_yaml

    p = tmp_path / "chapters.yml"
    p.write_text(
        "newyork:\n  title: New York\n  dataService:\n    id: papers-we-love\n"
        "london:\n  title: London\n  dataService:\n    adapter: eventbrite\n    id: pwl\n"
    )
    rows = {r.chapter_id: r for r in convert_chapters_yaml(spark, str(p)).collect()}
    assert rows["newyork"].adapter == "meetup"  # injected default
    assert rows["london"].adapter == "eventbrite"
