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


def test_fetch_events_ok_and_throttle_update():
    """fetch_events drives the full worker body (meetup.rkt:66-95):
    bucket acquired per request, headers fed back to the throttle,
    envelope unwrapped per adapter."""
    from cuttlefish_spark.sources.fetch import FixtureTransport, fetch_events
    from cuttlefish_spark.sources.throttle import TokenBucket

    naps = []
    clock_now = [0.0]

    def clock():
        return clock_now[0]

    def sleep(s):
        naps.append(s)
        clock_now[0] += s

    # remaining below min_remaining => next acquire backs off reset+2s
    transport = FixtureTransport(ratelimit_remaining=1, ratelimit_reset=5.0)
    bucket = TokenBucket(rate_per_sec=1000.0, clock=clock, sleep=sleep)
    events, error = fetch_events(
        "meetup", "papers-we-love", None, transport=transport, bucket=bucket
    )
    assert error is None and len(events) > 0
    (url, params), = transport.calls
    assert url == "https://api.meetup.com/papers-we-love/events"
    assert params["status"] == "upcoming,past"  # meetup.rkt:31-36
    bucket.acquire()
    assert naps and abs(sum(naps) - 7.0) < 1e-9  # reset(5) + 2


def test_fetch_events_404_and_read_error():
    """HTTP error -> \"Couldn't fetch id: 404\" (README.md:66-72);
    transport raise -> read-error message (meetup.rkt:76-80)."""
    from cuttlefish_spark.sources.fetch import FixtureTransport, fetch_events
    from cuttlefish_spark.sources.throttle import TokenBucket

    events, error = fetch_events(
        "meetup", "no-such-chapter", None,
        transport=FixtureTransport(), bucket=TokenBucket(rate_per_sec=1000.0),
    )
    assert events is None and error == "Couldn't fetch no-such-chapter: 404"

    def broken(url, params):
        raise OSError("connection reset")

    events, error = fetch_events(
        "meetup", "x", None, transport=broken, bucket=TokenBucket(rate_per_sec=1000.0)
    )
    assert events is None and error == "Could not read data for x"


def test_fetch_events_bad_json():
    from cuttlefish_spark.sources.fetch import fetch_events
    from cuttlefish_spark.sources.throttle import TokenBucket

    def junk(url, params):
        return 200, {}, "not json {"

    events, error = fetch_events(
        "facebook", "svc", None, transport=junk, bucket=TokenBucket(rate_per_sec=1000.0)
    )
    assert events is None and error == "Couldn't format svc into correct JSON"


def test_fetch_request_shapes():
    """facebook/eventbrite URL + param parity (facebook.rkt:67-83,
    eventbrite.rkt:98-114), config-driven tokens."""
    from cuttlefish_spark.sources.fetch import build_request

    url, params = build_request(
        "facebook", "svc1", None, {"facebook-access-token": "tok"}
    )
    assert url == "https://graph.facebook.com/v2.9/svc1/events"
    assert params == {"since": "132001640", "access_token": "tok"}
    url, params = build_request(
        "eventbrite", "svc2", "org9", {"eventbrite-access-tokens": {"svc2": "ebtok"}}
    )
    assert url == "https://www.eventbriteapi.com/v3/organizations/org9/events/"
    assert params == {"expand": "venue.address", "token": "ebtok"}


def test_datasource_404_rows_flow_to_error_channel(spark):
    """A chapter whose fixture is missing surfaces the HTTP 404 through
    the DataSource's Either columns instead of failing the job."""
    from cuttlefish_spark.sources.datasource import register

    register(spark)
    df = spark.read.format("cuttlefish_replay").load()
    errs = {
        r["error"] for r in df.filter("status = 'ERROR'").collect() if r["error"]
    }
    assert any("Couldn't fetch" in e or "No adapter found" in e for e in errs)


def test_runtime_config_defaults_and_override(spark, tmp_path):
    """A1 (main.rkt:35-62): missing rc file -> defaults; rc file keys
    override; resolved chapter-json-file drives the chapters scan."""
    import json as _json

    from cuttlefish_spark.sources.config import load_config, resolve_config_path

    cwd = str(tmp_path)
    cfg = load_config(cwd=cwd)
    assert cfg["json-out-path"] == "/tmp"
    assert cfg["chapter-json-file"] == str(tmp_path / "chapters.json")
    assert resolve_config_path(cwd=cwd) == tmp_path / ".cuttlefishrc"

    chapters = tmp_path / "my_chapters.json"
    chapters.write_text(_json.dumps({
        "boston": {"title": "Boston",
                   "dataService": {"adapter": "meetup", "id": "papers-we-love"}}
    }))
    (tmp_path / ".cuttlefishrc").write_text(_json.dumps({
        "chapter-json-file": str(chapters), "json-out-path": str(tmp_path / "out")
    }))
    cfg = load_config(cwd=cwd)
    assert cfg["chapter-json-file"] == str(chapters)   # overridden
    assert cfg["json-out-path"] == str(tmp_path / "out")
    assert cfg["logfile-path"] == str(tmp_path / "logs")  # default kept

    from cuttlefish_spark.sources.config import chapters_from_config

    rows = chapters_from_config(spark, cfg).collect()
    assert [(r["chapter_id"], r["adapter"], r["service_id"]) for r in rows] == [
        ("boston", "meetup", "papers-we-love")
    ]

    explicit = tmp_path / "alt.rc"
    explicit.write_text(_json.dumps({"json-out-path": "/data/out"}))
    assert load_config(arg=str(explicit), cwd=cwd)["json-out-path"] == "/data/out"


def test_run_pipeline_end_to_end(spark, tmp_path):
    """main.rkt twin: config -> chapters-driven DataSource fetch ->
    normalize -> per-chapter JSON files -> audit log. The rc file
    narrows the work-list to two chapters plus a dead-letter one."""
    import json as _json

    from cuttlefish_spark.run import run_pipeline
    from cuttlefish_spark.sources.config import load_config

    chapters = tmp_path / "chapters.json"
    chapters.write_text(_json.dumps({
        "newyork": {"title": "New York",
                    "dataService": {"adapter": "meetup", "id": "papers-we-love"}},
        "london": {"title": "London",
                   "dataService": {"adapter": "eventbrite",
                                   "id": "papers-we-love-london",
                                   "organization": "2417467656"}},
        "atlantis": {"title": "Atlantis",
                     "dataService": {"adapter": "carrierpigeon", "id": "deep-six"}},
    }))
    (tmp_path / ".cuttlefishrc").write_text(_json.dumps({
        "chapter-json-file": str(chapters),
        "json-out-path": str(tmp_path / "out"),
        "logfile-path": str(tmp_path / "logs"),
    }))
    audit = run_pipeline(spark, config=load_config(cwd=str(tmp_path)))
    rows = {(r["chapter_id"], r["status"]): r["n_events"] for r in audit.collect()}
    assert rows[("newyork", "OK")] == 2
    assert rows[("london", "OK")] == 3
    assert rows[("atlantis", "ERROR")] == 1

    out_files = sorted(p.name for p in (tmp_path / "out").iterdir())
    assert out_files == ["london.json", "newyork.json"]
    ny = _json.loads((tmp_path / "out" / "newyork.json").read_text())
    assert set(ny) == {"qxw9yzl3", "zvbxrpl2"}  # {event_id: record} shape

    log = (tmp_path / "logs" / "cuttlefish.log").read_text()
    assert "ERROR: atlantis" in log and "WROTE: newyork" in log


def test_log_rotation_daily(tmp_path):
    """A24 twin (logger.rkt:54-63): a log last written on an earlier
    day is rolled to cuttlefish-YYYY-MM-DD.log before the next append."""
    import datetime as dt
    import os

    from cuttlefish_spark.run import append_log

    d = str(tmp_path / "logs")
    append_log(d, ["WROTE: a (1)"])
    # age the current log file to yesterday
    y = dt.date.today() - dt.timedelta(days=1)
    old_mtime = dt.datetime.combine(y, dt.time(12)).timestamp()
    os.utime(os.path.join(d, "cuttlefish.log"), (old_mtime, old_mtime))
    append_log(d, ["WROTE: b (2)"])
    files = sorted(os.listdir(d))
    assert files == [f"cuttlefish-{y.isoformat()}.log", "cuttlefish.log"]
    assert (tmp_path / "logs" / "cuttlefish.log").read_text() == "WROTE: b (2)\n"


def test_run_pipeline_missing_chapters_raises(spark, tmp_path):
    """A misconfigured run must fail loudly, not silently replay the
    built-in fixture chapters (reference: an unreadable chapters table
    aborts the run). The fixture fallback needs the explicit flag."""
    import pytest as _pytest

    from cuttlefish_spark.run import run_pipeline

    config = {
        "chapter-json-file": str(tmp_path / "nope.json"),
        "json-out-path": str(tmp_path / "out"),
        "logfile-path": str(tmp_path / "logs"),
    }
    with _pytest.raises(FileNotFoundError, match="chapter-json-file"):
        run_pipeline(spark, config=config)
    audit = run_pipeline(spark, config=config, allow_fixture_chapters=True)
    assert audit.count() > 0


def test_dispatch_replay_bulk_equivalence(spark):
    """dispatch_replay_bulk must produce row-identical output to the
    per-chapter dispatch_replay on the same work-list (the bulk form is
    the O(protos)-plan twin the 10k-chapter gate runs), and must fan a
    synthesized work-list out by pure formula."""
    from cuttlefish_spark.operators.ingest import _flat_canonical
    from cuttlefish_spark.sources.adapters import (
        dispatch_replay,
        dispatch_replay_bulk,
    )
    from cuttlefish_spark.sources.fixtures import CHAPTERS, synth_chapters

    unit = _flat_canonical(dispatch_replay(spark)).toPandas()
    bulk = _flat_canonical(dispatch_replay_bulk(spark, CHAPTERS)).toPandas()
    key = sorted(unit.columns)
    u = unit[key].sort_values(key).reset_index(drop=True).astype(str)
    b = bulk[key].sort_values(key).reset_index(drop=True).astype(str)
    assert u.equals(b), "bulk replay diverges from per-chapter replay"

    n = 40  # 10 cycles of the 4 protos
    fan = _flat_canonical(dispatch_replay_bulk(spark, synth_chapters(n))).toPandas()
    # golden: 2 meetup + 2 facebook + 3 eventbrite + 1 error per cycle
    assert len(fan) == (n // 4) * 8
    assert fan["chapter_id"].nunique() == n
    assert (fan[fan["status"] == "ERROR"]["error"] == "No adapter found: carrierpigeon").all()


def test_datasource_chapter_batching_invariance(spark):
    """`chapters_per_partition` must change ONLY the partitioning, not
    the rows: the 4-chapter fixture work-list read at 1/partition and
    batched into a single partition must produce identical canonical
    output (and the expected partition counts)."""
    from cuttlefish_spark.operators.ingest import datasource_canonical
    from cuttlefish_spark.sources.datasource import ChapterReplayReader

    one = datasource_canonical(spark).toPandas()
    batched = datasource_canonical(spark, chapters_per_partition=7).toPandas()
    key = sorted(one.columns)
    a = one[key].sort_values(key).reset_index(drop=True).astype(str)
    b = batched[key].sort_values(key).reset_index(drop=True).astype(str)
    assert a.equals(b), "batched DataSource output diverges"

    assert len(ChapterReplayReader({}).partitions()) == 4
    assert len(
        ChapterReplayReader({"chapters_per_partition": 7}).partitions()
    ) == 1
    assert len(
        ChapterReplayReader({"chapters_per_partition": 3}).partitions()
    ) == 2


def test_datasource_replay_auto_batching(spark, tmp_path):
    """Replay transport auto-sizes batches to ~n/(3*parallelism) when
    no explicit chapters_per_partition is given (r9 VERDICT item 5 —
    a 10k-chapter replay at 1 task/chapter paid ~0.5 core-s of Python
    task setup per chapter); live transport keeps 1/partition so the
    scheduler owns per-item retry granularity; an explicit value always
    wins; and the auto-batched output is row-identical."""
    from cuttlefish_spark.operators.ingest import datasource_canonical
    from cuttlefish_spark.sources.datasource import ChapterReplayReader
    from cuttlefish_spark.sources.fixtures import write_chapters_json

    path = str(tmp_path / "chapters.json")
    write_chapters_json(1000, path)

    def n_parts(opts):
        return len(ChapterReplayReader(opts).partitions())

    # replay + parallelism 8: per = 1000 // 24 = 41 -> ceil(1000/41) = 25
    assert n_parts({"chapters_path": path, "auto_batch_parallelism": 8}) == 25
    # live ignores the auto knob
    assert n_parts(
        {"chapters_path": path, "auto_batch_parallelism": 8, "transport": "live"}
    ) == 1000
    # explicit beats auto
    assert n_parts(
        {"chapters_path": path, "auto_batch_parallelism": 8,
         "chapters_per_partition": 10}
    ) == 100
    # tiny work-lists never batch below 1/partition
    assert n_parts({"auto_batch_parallelism": 8}) == 4

    # Auto default (what ingest_datasource now runs) is row-identical
    # to explicit 1/partition on the same work-list.
    auto = datasource_canonical(spark, chapters_path=path).toPandas()
    one = datasource_canonical(
        spark, chapters_path=path, chapters_per_partition=1
    ).toPandas()
    key = sorted(auto.columns)
    a = auto[key].sort_values(key).reset_index(drop=True).astype(str)
    b = one[key].sort_values(key).reset_index(drop=True).astype(str)
    assert a.equals(b), "auto-batched DataSource output diverges"


def test_stream_reader_offsets_and_recovery():
    """The simpleStreamReader's offset walk: read() advances index by
    chapters_per_batch, an exhausted list returns an empty slice at a
    fixed offset (so processAllAvailable terminates), and
    readBetweenOffsets replays EXACTLY the rows the original read()
    served for the same offset range (the recovery contract)."""
    from cuttlefish_spark.sources.datasource import ChapterReplayStreamReader

    r = ChapterReplayStreamReader({"chapters_per_batch": 1})
    off = r.initialOffset()
    assert off == {"index": 0}
    all_rows, n_batches = [], 0
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if nxt == off:
            assert rows == []
            break
        assert nxt["index"] == off["index"] + 1
        replay = list(r.readBetweenOffsets(off, nxt))
        assert replay == rows, "recovery replay diverged from original read"
        all_rows.extend(rows)
        off = nxt
        n_batches += 1
    assert n_batches == len(r._items)
    assert len(all_rows) >= n_batches  # every chapter yields >= 1 row


def test_streaming_datasource_matches_batch(spark):
    """The drained stream's canonical frame equals the batch
    DataSource's — the streaming source held to its batch twin row
    for row (the driver holds both to the same golden oracle; this
    pins their mutual identity without DuckDB)."""
    from cuttlefish_spark.operators.ingest import (
        datasource_canonical,
        streaming_ingest_canonical,
    )

    a = streaming_ingest_canonical(spark)
    b = datasource_canonical(spark)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
