"""Source adapters: per-service raw schemas, normalizers to the
canonical event schema, and the adapter-dispatch pipeline.

Reference parity map (all anchors in /root/reference/private):
- adapter registry / dispatch      api-runner.rkt:19-22, 92-95, 129-147
- meetup normalize                 workers/meetup.rkt:39-59
- facebook normalize               workers/facebook.rkt:35-55
- eventbrite normalize             workers/eventbrite.rkt:51-85
- ISO8601 +-HHMM offset split      workers/facebook.rkt:22-28
- IANA-zone offset resolution      workers/eventbrite.rkt:54-66
- epoch pass-through, url synth    workers/meetup.rkt:43-44, facebook.rkt:41
- default-on-missing-path          hash.rkt:30-35 (nullable-everything)
- Either error values              README.md:30-42, api-runner.rkt:133-147

Fetch modes: `replay` reads the inline fixtures (the reference's own
test strategy — golden capture, no network, eventbrite.rkt:123-146).
A production `http` mode belongs in mapInPandas with a per-partition
token-bucket throttle (meetup.rkt:9-26); it is deliberately not wired
to the network in this container.

NOTE (design divergence, SURVEY.md §7): the reference keys Eventbrite
events by computed timestamp, silently dropping simultaneous events
(eventbrite.rkt:68). We keep `event_id` as the key — documented
intentional non-bug-parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cuttlefish_spark.functions.markdown import markdown_to_html
from cuttlefish_spark.sources import fixtures

VENUE_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("address1", T.StringType()),
        T.StructField("address2", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("postalCode", T.StringType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]
)

PHOTO_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

# Canonical normalized event record (FIXTURES.md §1.2 /
# reference data_formats.md:15-44). All fields nullable — the
# reference defaults missing paths to null rather than erroring.
CANONICAL_SCHEMA = T.StructType(
    [
        T.StructField("chapter_id", T.StringType()),
        T.StructField("event_id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("time", T.LongType()),
        T.StructField("utcOffset", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("venue", VENUE_SCHEMA),
        T.StructField("photos", T.ArrayType(PHOTO_SCHEMA)),
    ]
)

_MEETUP_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("time", T.LongType()),
        T.StructField("utc_offset", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField(
            "venue",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("address_1", T.StringType()),
                    T.StructField("address_2", T.StringType()),
                    T.StructField("country", T.StringType()),
                    T.StructField("city", T.StringType()),
                    T.StructField("zip", T.StringType()),
                    T.StructField("lon", T.DoubleType()),
                    T.StructField("lat", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "photo_album",
            T.StructType(
                [
                    T.StructField(
                        "photo_sample",
                        T.ArrayType(
                            T.StructType([T.StructField("photo_link", T.StringType())])
                        ),
                    )
                ]
            ),
        ),
    ]
)

_FACEBOOK_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("start_time", T.StringType()),
        T.StructField(
            "place",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField(
                        "location",
                        T.StructType(
                            [
                                T.StructField("street", T.StringType()),
                                T.StructField("country", T.StringType()),
                                T.StructField("city", T.StringType()),
                                T.StructField("zip", T.StringType()),
                                T.StructField("longitude", T.DoubleType()),
                                T.StructField("latitude", T.DoubleType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)

_EVENTBRITE_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField(
            "name",
            T.StructType(
                [T.StructField("text", T.StringType()), T.StructField("html", T.StringType())]
            ),
        ),
        T.StructField(
            "description",
            T.StructType(
                [T.StructField("text", T.StringType()), T.StructField("html", T.StringType())]
            ),
        ),
        T.StructField(
            "start",
            T.StructType(
                [
                    T.StructField("timezone", T.StringType()),
                    T.StructField("local", T.StringType()),
                    T.StructField("utc", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "venue",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("latitude", T.StringType()),
                    T.StructField("longitude", T.StringType()),
                    T.StructField(
                        "address",
                        T.StructType(
                            [
                                T.StructField("address_1", T.StringType()),
                                T.StructField("address_2", T.StringType()),
                                T.StructField("city", T.StringType()),
                                T.StructField("region", T.StringType()),
                                T.StructField("postal_code", T.StringType()),
                                T.StructField("country", T.StringType()),
                                T.StructField("latitude", T.StringType()),
                                T.StructField("longitude", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def _passthrough(raw: DataFrame) -> list[Column]:
    """Keep row-level keys (chapter_id) through a normalizer when the
    input carries them — the DataSource fetch path emits chapter_id per
    row, while replay mode attaches it after normalization."""
    return [F.col("chapter_id")] if "chapter_id" in raw.columns else []


def _venue(name: Column, a1: Column, a2: Column, country: Column, city: Column,
           postal: Column, lon: Column, lat: Column) -> Column:
    return F.struct(
        name.alias("name"),
        a1.alias("address1"),
        a2.alias("address2"),
        country.alias("country"),
        city.alias("city"),
        postal.alias("postalCode"),
        lon.cast("double").alias("lon"),
        lat.cast("double").alias("lat"),
    )


def normalize_meetup(raw: DataFrame) -> DataFrame:
    """meetup.rkt:39-59: rename (link->url, name->title,
    utc_offset->utcOffset, venue.zip->postalCode), epoch pass-through
    (meetup.rkt:43-44), photo array transform (meetup.rkt:55-58,
    width/height null-defaulted)."""
    photos = F.transform(
        F.coalesce(F.col("photo_album.photo_sample"), F.array()),
        lambda p: F.struct(
            p["photo_link"].alias("url"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ),
    )
    return raw.select(
        *_passthrough(raw),
        F.col("id").alias("event_id"),
        F.col("link").alias("url"),
        F.col("time").cast("long").alias("time"),
        F.col("utc_offset").cast("long").alias("utcOffset"),
        F.col("name").alias("title"),
        F.col("description"),
        _venue(
            F.col("venue.name"), F.col("venue.address_1"), F.col("venue.address_2"),
            F.col("venue.country"), F.col("venue.city"), F.col("venue.zip"),
            F.col("venue.lon"), F.col("venue.lat"),
        ).alias("venue"),
        photos.alias("photos"),
    )


def normalize_facebook(raw: DataFrame) -> DataFrame:
    """facebook.rkt:35-55: ISO8601+-HHMM parse + offset split
    (facebook.rkt:22-28), url synthesis (facebook.rkt:41), markdown
    description -> HTML (facebook.rkt:30-32,45), photos always null
    (facebook.rkt:55)."""
    ts = F.to_timestamp(F.col("start_time"), "yyyy-MM-dd'T'HH:mm:ssxx")
    sign = F.when(F.regexp_extract("start_time", r"([+-])\d{4}$", 1) == "-", -1).otherwise(1)
    off_h = F.regexp_extract("start_time", r"[+-](\d{2})(\d{2})$", 1).cast("long")
    off_m = F.regexp_extract("start_time", r"[+-](\d{2})(\d{2})$", 2).cast("long")
    offset_ms = sign * (off_h * 3600 + off_m * 60) * 1000
    return raw.select(
        *_passthrough(raw),
        F.col("id").alias("event_id"),
        F.concat(F.lit("https://facebook.com/"), F.col("id")).alias("url"),
        F.unix_millis(ts).alias("time"),
        offset_ms.cast("long").alias("utcOffset"),
        F.col("name").alias("title"),
        markdown_to_html(F.col("description")).alias("description"),
        _venue(
            F.col("place.name"), F.col("place.location.street"),
            F.lit(None).cast("string"), F.col("place.location.country"),
            F.col("place.location.city"), F.col("place.location.zip"),
            F.col("place.location.longitude"), F.col("place.location.latitude"),
        ).alias("venue"),
        F.lit(None).cast(T.ArrayType(PHOTO_SCHEMA)).alias("photos"),
    )


def normalize_eventbrite(raw: DataFrame) -> DataFrame:
    """eventbrite.rkt:51-85: naive-local + IANA zone -> DST-aware UTC
    epoch millis and offset (eventbrite.rkt:54-66); stringified lat/lon
    cast to double; keyed by event_id (NOT by timestamp — divergence
    from the eventbrite.rkt:68 collision bug, see module docstring)."""
    local_ts = F.to_timestamp(F.col("start.local"))
    utc_ts = F.to_utc_timestamp(local_ts, F.col("start.timezone"))
    return raw.select(
        *_passthrough(raw),
        F.col("id").alias("event_id"),
        F.col("url"),
        F.unix_millis(utc_ts).alias("time"),
        (F.unix_millis(local_ts) - F.unix_millis(utc_ts)).cast("long").alias("utcOffset"),
        F.col("name.text").alias("title"),
        F.col("description.text").alias("description"),
        _venue(
            F.col("venue.name"), F.col("venue.address.address_1"),
            F.col("venue.address.address_2"), F.col("venue.address.country"),
            F.col("venue.address.city"), F.col("venue.address.postal_code"),
            F.col("venue.address.longitude"), F.col("venue.address.latitude"),
        ).alias("venue"),
        F.lit(None).cast(T.ArrayType(PHOTO_SCHEMA)).alias("photos"),
    )


def _replay_raw(spark: SparkSession, adapter: str, service_id: str,
                organization: str | None) -> DataFrame | None:
    """Fixture-replay fetch: return the raw per-service DataFrame, or
    None when the fixture has no payload (stands in for an HTTP miss).

    NOTE: no .coalesce(1) here — Coalesce over a parallelized local
    relation costs a flat ~5s/job on local mode (scheduler locality
    wait on the single merged task), measured 10x slower than leaving
    the tiny frame on default parallelism."""
    if adapter == "meetup":
        rows = fixtures.MEETUP_RAW.get(service_id)
        return None if rows is None else spark.createDataFrame(rows, _MEETUP_RAW_SCHEMA)
    if adapter == "facebook":
        env = fixtures.FACEBOOK_RAW.get(service_id)
        return None if env is None else spark.createDataFrame(env["data"], _FACEBOOK_RAW_SCHEMA)
    if adapter == "eventbrite":
        env = fixtures.EVENTBRITE_RAW.get(organization or service_id)
        return None if env is None else spark.createDataFrame(env["events"], _EVENTBRITE_RAW_SCHEMA)
    return None


NORMALIZERS = {
    "meetup": normalize_meetup,
    "facebook": normalize_facebook,
    "eventbrite": normalize_eventbrite,
}


def dispatch_replay(spark: SparkSession, chapters=None) -> DataFrame:
    """The full Layer-A pipeline in replay mode: chapters work-list ->
    per-adapter dispatch -> fetch(replay) -> normalize -> union, with
    Either-style status/error columns.

    The chapters list is *config*, not data (36 rows in the shipped
    reference file, api-runner.rkt:171-178), so driver-side iteration
    over it mirrors the reference's broadcast of config to workers
    (api-runner.rkt:196-199) and is scale-safe: per-chapter DataFrames
    are unioned into one distributed plan; only the work-list itself is
    driver-resident.
    """
    chapters = chapters if chapters is not None else fixtures.CHAPTERS
    frames: list[DataFrame] = []
    err_rows: list[dict] = []
    err_schema = T.StructType(
        list(CANONICAL_SCHEMA.fields)
        + [T.StructField("status", T.StringType()), T.StructField("error", T.StringType())]
    )
    for chapter_id, _title, adapter, service_id, organization in chapters:
        normalizer = NORMALIZERS.get(adapter)
        if normalizer is None:
            # unknown adapter -> error value (api-runner.rkt:144-147)
            err_rows.append(
                {
                    "chapter_id": chapter_id,
                    "status": "ERROR",
                    "error": f"No adapter found: {adapter}",
                }
            )
            continue
        raw = _replay_raw(spark, adapter, service_id, organization)
        if raw is None:
            # fetch failure -> error value (meetup.rkt:74-81)
            err_rows.append(
                {
                    "chapter_id": chapter_id,
                    "status": "ERROR",
                    "error": f"fetch failed for {service_id}",
                }
            )
            continue
        frames.append(
            normalizer(raw)
            .withColumn("chapter_id", F.lit(chapter_id))
            .withColumn("status", F.lit("OK"))
            .withColumn("error", F.lit(None).cast("string"))
            .select([f.name for f in err_schema.fields])
        )
    if err_rows:
        # One frame for ALL error rows — a per-row createDataFrame
        # would bloat the unioned plan with one scan per error.
        frames.append(spark.createDataFrame(err_rows, err_schema))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def dispatch_replay_bulk(spark: SparkSession, chapters) -> DataFrame:
    """SCALED replay: fetch + normalize ONCE per DISTINCT (adapter,
    service, organization) proto, then fan the chapter ids out
    declaratively through a broadcast join — the plan stays O(protos)
    no matter how long the work-list grows. dispatch_replay's
    frame-per-chapter union is the right shape for the reference's
    36-row config; at a 10k-chapter work-list the PLANNER (10k union
    branches) — not the data — becomes the bottleneck, and collapsing
    identical fetches is exactly what a production replay/cache layer
    does. Results are identical to dispatch_replay row-for-row."""
    seen: set[str] = set()
    protos: list[tuple] = []
    assign_rows = []
    for chapter_id, _title, adapter, service_id, organization in chapters:
        pk = f"{adapter}|{service_id}|{organization}"
        assign_rows.append((chapter_id, pk))
        if pk not in seen:
            seen.add(pk)
            protos.append((pk, adapter, service_id, organization))
    assign = spark.createDataFrame(
        assign_rows, "chapter_id string, pk string"
    )
    proto_schema = T.StructType(
        [T.StructField("pk", T.StringType())]
        + [f for f in CANONICAL_SCHEMA.fields if f.name != "chapter_id"]
        + [
            T.StructField("status", T.StringType()),
            T.StructField("error", T.StringType()),
        ]
    )
    cols = [f.name for f in proto_schema.fields]
    frames: list[DataFrame] = []
    err_rows: list[dict] = []
    for pk, adapter, service_id, organization in protos:
        normalizer = NORMALIZERS.get(adapter)
        if normalizer is None:
            err_rows.append(
                {"pk": pk, "status": "ERROR",
                 "error": f"No adapter found: {adapter}"}
            )
            continue
        raw = _replay_raw(spark, adapter, service_id, organization)
        if raw is None:
            err_rows.append(
                {"pk": pk, "status": "ERROR",
                 "error": f"fetch failed for {service_id}"}
            )
            continue
        frames.append(
            normalizer(raw)
            .withColumn("pk", F.lit(pk))
            .withColumn("status", F.lit("OK"))
            .withColumn("error", F.lit(None).cast("string"))
            .select(cols)
        )
    if err_rows:
        frames.append(spark.createDataFrame(err_rows, proto_schema).select(cols))
    if not frames:
        # Empty work-list: an empty canonical frame, not an IndexError
        # (a dynamically derived chapters.json can legitimately filter
        # down to zero items).
        frames.append(spark.createDataFrame([], proto_schema).select(cols))
    proto_df = frames[0]
    for f in frames[1:]:
        proto_df = proto_df.unionByName(f)
    return assign.join(F.broadcast(proto_df), "pk").drop("pk")
