"""Spark 4 Python DataSource for the chapter-fetch step.

The reference's fetch layer is a worker pool: chapters are chunked,
each worker thread dispatches on the adapter key and performs an HTTPS
GET (api-runner.rkt:118-148, meetup.rkt:83-84). Spark's native analog
of that pool is a DataSource whose *input partitions* are the work
items: one partition per chapter means Spark's scheduler — not a
bespoke thread pool (A5) — owns fan-out, retry, and locality, and the
fetch scales to any executor count with zero code change.

`ChapterReplayDataSource` emits the *raw* payload rows (one JSON string
per event, Either-style status/error columns — README.md:30-42); the
normalization to the canonical schema stays declarative in the
DataFrame layer (sources.adapters), exactly like the reference splits
fetch (worker-*) from convert (convert-json). A per-partition
TokenBucket is acquired per request, placing the reference's adaptive
throttle (meetup.rkt:9-26) where it belongs at scale: one bucket per
task, not a global lock.

Both modes run the SAME fetch body (sources.fetch.fetch_events:
throttle -> GET -> header-driven throttle update -> Either errors);
only the transport differs. `transport=replay` (default) answers from
the golden fixtures through HTTP-shaped responses (the reference's own
test strategy, eventbrite.rkt:123-146); `transport=live` performs the
real urllib GET against the worker APIs (meetup.rkt:83-84,
facebook.rkt:82-83, eventbrite.rkt:114).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

RAW_FETCH_DDL = (
    "chapter_id string, adapter string, service_id string, "
    "payload string, status string, error string"
)


class ChapterPartition(InputPartition):
    def __init__(self, chapters: list[tuple]):
        self.chapters = chapters


def _load_items(options: dict) -> list[tuple]:
    """The chapter work-list (the reference's config-driven table,
    api-runner.rkt:171-178): `chapters_path` points at a chapters.json
    file; without it the golden fixture chapters drive the replay.
    Shared by the batch reader's partitions() and the streaming
    reader's offset space."""
    path = options.get("chapters_path")
    if path:
        with open(path, encoding="utf-8") as fh:
            doc = json.load(fh)
        return [
            (
                cid,
                payload.get("title"),
                (payload.get("dataService") or {}).get("adapter"),
                (payload.get("dataService") or {}).get("id"),
                (payload.get("dataService") or {}).get("organization"),
            )
            for cid, payload in doc.items()
        ]
    from cuttlefish_spark.sources import fixtures

    return list(fixtures.CHAPTERS)


def _fetch_rows(chapters: list[tuple], options: dict) -> Iterator[tuple]:
    """The shared fetch body (throttle -> GET -> Either rows), one
    TokenBucket per caller (a task for the batch reader, a microbatch
    slice for the streaming reader) — the reference's adaptive
    throttle placed per worker (meetup.rkt:9-26)."""
    from cuttlefish_spark.sources.fetch import (
        FixtureTransport,
        fetch_events,
        http_transport,
    )
    from cuttlefish_spark.sources.throttle import TokenBucket

    bucket = TokenBucket(
        rate_per_sec=float(options.get("rate_per_sec", 1000.0))
    )
    live = options.get("transport", "replay") == "live"
    for chapter in chapters:
        chapter_id, _title, adapter, service_id, organization = chapter
        if adapter not in ("meetup", "facebook", "eventbrite"):
            bucket.acquire()
            yield (chapter_id, adapter, service_id, None, "ERROR",
                   f"No adapter found: {adapter}")
            continue
        transport = http_transport if live else FixtureTransport()
        events, error = fetch_events(
            adapter,
            service_id,
            organization or service_id,
            transport=transport,
            bucket=bucket,
        )
        if error is not None:
            yield (chapter_id, adapter, service_id, None, "ERROR", error)
            continue
        for event in events:
            yield (
                chapter_id, adapter, service_id,
                json.dumps(event), "OK", None,
            )


class ChapterReplayReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self) -> Sequence[ChapterPartition]:
        # One work item per partition is the reference's chunk-list
        # (chunk-list.rkt:6-18) balanced by count; Spark balances by
        # task scheduling, which also absorbs per-key latency skew.
        # `chapters_per_partition` is the task-overhead amortization
        # knob: a Python DataSource task costs ~0.5 core-seconds of
        # setup (measured, PLANS.md Notes). DEFAULTS depend on the
        # transport (r9 VERDICT item 5):
        #   - live HTTP: 1/partition, so the scheduler owns retry and
        #     latency skew at item granularity (the documented
        #     rationale — a slow or failing endpoint must not stall a
        #     whole batch of unrelated chapters);
        #   - replay/cache-backed: auto-sized to
        #     max(1, n // (3 * parallelism)) — a 10k-chapter replay at
        #     1/partition paid ~0.5 core-s of task setup per chapter
        #     (177.8 s measured at the sf1 gate vs ~14 s batched); 3
        #     waves per core keep scheduler-level balancing without
        #     paying per-item setup. The caller passes parallelism via
        #     `auto_batch_parallelism` (partitions() runs without a
        #     live SparkSession; datasource_canonical wires it).
        # An explicit `chapters_per_partition` always wins.
        # `chapters_path` points at a chapters.json work-list (the
        # reference's config-driven table, api-runner.rkt:171-178);
        # without it the golden fixture chapters drive the replay.
        items = _load_items(self.options)
        explicit = self.options.get("chapters_per_partition")
        if explicit is not None:
            per = max(1, int(explicit))
        elif self.options.get("transport", "replay") == "live":
            per = 1
        else:
            par = int(self.options.get("auto_batch_parallelism", 0))
            per = max(1, len(items) // (3 * par)) if par > 0 else 1
        return [
            ChapterPartition(items[i : i + per])
            for i in range(0, len(items), per)
        ]

    def read(self, partition: ChapterPartition) -> Iterator[tuple]:
        # ONE bucket per task (the reference's adaptive throttle placed
        # at scale, meetup.rkt:9-26) — batched chapters in a partition
        # share it, exactly like a worker draining its channel.
        return _fetch_rows(partition.chapters, self.options)


class ChapterReplayStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the chapter-fetch DataSource (Spark 4
    simpleStreamReader — the extension rung the batch reader above
    doesn't touch): the chapter work-list becomes a RATE-LIMITED
    stream, each microbatch serving the next `chapters_per_batch`
    work items (offset = index into the list). This is the production
    shape of a polling ingest: a bounded slice of the upstream work
    per trigger, offsets checkpointed by the engine, recovery replay
    via readBetweenOffsets over the same deterministic fetch body
    (fixture replay IS deterministic — the reference's own test
    strategy, eventbrite.rkt:123-146).

    The simple API prefetches each slice DRIVER-side by design —
    bounded by chapters_per_batch, which is exactly the rate-limit
    contract of a polling source; bulk backfills use the batch
    reader's executor-side partitions instead. An exhausted list
    returns an empty slice at a fixed offset, so processAllAvailable
    terminates (availableNow on simple readers drains only ONE
    read() call — measured; the streaming_datasource_ingest query
    documents and works this engine contract)."""

    def __init__(self, options: dict):
        self.options = options
        self._items = _load_items(options)
        self._per = max(1, int(options.get("chapters_per_batch", 2)))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        i = int(start["index"])
        if i >= len(self._items):
            return iter([]), {"index": i}
        j = min(i + self._per, len(self._items))
        # list-iterator, not generator: the engine's prefetch cache
        # copy.copy()s the iterator it is handed, and generators don't
        # copy. The slice is bounded by chapters_per_batch — exactly
        # the documented driver-side prefetch budget.
        return iter(list(_fetch_rows(self._items[i:j], self.options))), {
            "index": j
        }

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        i, j = int(start["index"]), int(end["index"])
        return iter(list(_fetch_rows(self._items[i:j], self.options)))

    def commit(self, end: dict) -> None:
        pass


class ChapterReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cuttlefish_replay"

    def schema(self) -> str:
        return RAW_FETCH_DDL

    def reader(self, schema: StructType) -> ChapterReplayReader:
        return ChapterReplayReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> ChapterReplayStreamReader:
        return ChapterReplayStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ChapterReplayDataSource)
