"""Multimodal-column operators: typed metadata around opaque binary
payloads, and the Spark-side plumbing (schema, batching, UDF signature)
for decode/feature-extraction.

The reference's closest analogue is the photos array-of-struct column
(/root/reference/private/workers/meetup.rkt:55-58,
data_formats.md:35-41) — media referenced by URL with typed metadata.
Here the payload itself rides along as a `binary` column.

The decode step is a deterministic FAKE (image/audio libs are not in
this container): `_fake_decode` stands in for e.g. a PIL/torchaudio
decode inside mapInPandas. The Spark-side contract — Arrow-batched
iterator, explicit output schema, per-batch vectorized numpy — is the
real production shape; only the pixel math is stubbed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cuttlefish_spark.functions import dot
from cuttlefish_spark.io import load_table
from cuttlefish_spark.registry import query


@query(
    "multimodal_meta",
    layer="C",
    oracle="""
    SELECT d.doc_id, e.label, d.lang, d.source, d.n_chars,
           CAST(len(e.embedding) AS BIGINT) AS dim,
           round(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                       CAST(e.embedding AS DOUBLE[]))), 6) AS l2_norm
    FROM embeddings e
    JOIN documents d ON e.vec_id = d.doc_id
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata join across modalities: documents (text) x
    embeddings (vector), with struct construction + array stats.

    Builds a `meta` struct then re-projects its fields — the canonical
    nested-schema round-trip (venue struct parity, meetup.rkt:47-54).
    Broadcast-able join on the id key.
    """
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    v = F.col("embedding").cast("array<double>")
    joined = e.join(d, e.vec_id == d.doc_id).select(
        "doc_id",
        "label",
        F.struct("lang", "source", "n_chars").alias("meta"),
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.sqrt(dot(v, v)), 6).alias("l2_norm"),
    )
    return joined.select(
        "doc_id",
        "label",
        F.col("meta.lang").alias("lang"),
        F.col("meta.source").alias("source"),
        F.col("meta.n_chars").alias("n_chars"),
        "dim",
        "l2_norm",
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("head_hex", StringType()),
        # Feature vector exported as a csv string of integral values:
        # the verification canonicalizer cannot sort array-typed output
        # columns (pandas sort_values throws on lists), so the array
        # stays internal (float32 numpy batch) and crosses the query
        # boundary scalarized.
        StructField("features_csv", StringType()),
    ]
)


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder (deterministic fake): real deployments replace the
    body with PIL / libsndfile / ffmpeg frame sampling. Consumes Arrow
    batches of (doc_id, media_type, payload: bytes), emits fixed-shape
    feature rows. Raises NotImplementedError for media types a real
    decoder would need but the container lacks."""
    for pdf in batches:
        if not (pdf["media_type"] == "text/plain").all():
            raise NotImplementedError(
                "non-text media decode requires image/audio libs not in this container"
            )
        payloads = pdf["payload"]
        lens = payloads.str.len().astype("int64")
        feats = [
            np.array(
                [ln % 251, (ln // 251) % 251, len(set(p[:64])), p[0] if ln else 0],
                dtype=np.float32,
            )
            for p, ln in zip(payloads, lens)
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_len": lens,
                "head_hex": [p[:4].hex() for p in payloads],
                "features_csv": [
                    ",".join(str(int(x)) for x in f) for f in feats
                ],
            }
        )


@query(
    "multimodal_decode",
    layer="C",
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           lower(hex(encode(substr(text, 1, 4)))) AS head_hex,
           array_to_string(
               [CAST(octet_length(encode(text)) % 251 AS BIGINT),
                CAST((octet_length(encode(text)) // 251) % 251 AS BIGINT),
                CAST(len(list_distinct(list_transform(
                     range(1, least(length(text), 64) + 1),
                     i -> text[i]))) AS BIGINT),
                CAST(ascii(substr(text, 1, 1)) AS BIGINT)], ',') AS features_csv
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing: text -> binary payload + typed
    metadata, then an Arrow-batched mapInPandas feature extractor.

    The decode itself is the deterministic stub (_fake_decode), so the
    oracle can restate its byte math in SQL over the SAME payload bytes
    (the corpus is ASCII, so DuckDB's char ops equal the Python-side
    byte ops; the integral feature values survive the float32 Arrow
    schema exactly). The partitioning story at scale: payloads stay
    with their rows (no shuffle), batches stream through Arrow, and the
    output schema is fixed so downstream plans are fully typed.
    """
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    return with_payload.mapInPandas(_fake_decode, schema=_DECODE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_head", StringType()),
    ]
)

_FRAME_SIZE = 256  # stub "frame" = fixed-size byte window
_SAMPLE_EVERY = 4  # keep every 4th frame


def _fake_frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame sampler: real deployments replace the chunking with
    ffmpeg/OpenCV keyframe extraction. The Spark-side contract is the
    real shape — one input row fans out to N frame rows inside the
    task (no shuffle), batch in/batch out via Arrow."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": [],
                                "frame_head": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = (len(payload) + _FRAME_SIZE - 1) // _FRAME_SIZE
            for i in range(0, n_frames, _SAMPLE_EVERY):
                chunk = payload[i * _FRAME_SIZE : (i + 1) * _FRAME_SIZE]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_bytes"].append(len(chunk))
                out["frame_head"].append(chunk[:2].hex())
        yield pd.DataFrame(out)


@query(
    "multimodal_framesample",
    layer="C",
    oracle="""
    WITH frames AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               unnest(range(0, CAST(ceil(octet_length(encode(text)) / 256.0)
                                    AS BIGINT), 4)) AS frame_idx
        FROM documents
    )
    SELECT doc_id, frame_idx,
           LEAST(CAST(256 AS BIGINT), n_bytes - frame_idx * 256) AS frame_bytes
    FROM frames
    """,
)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque binary column: every 4th
    fixed-size window of the payload becomes a frame row (stub for
    video keyframe extraction — the fan-out happens inside the task,
    Arrow-batched, no shuffle). The oracle replays the chunk
    arithmetic on byte lengths; frame_head is Python-only so the
    checked projection stops at (doc_id, frame_idx, frame_bytes)."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    frames = with_payload.mapInPandas(_fake_frame_sample, schema=_FRAME_SCHEMA)
    return frames.select("doc_id", "frame_idx", "frame_bytes")


N_AUDIO_SAMPLES = 256
AUDIO_CHUNK = 64


@query(
    "multimodal_audio_features",
    layer="C",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, i,
               (doc_id * 31 + i * 17) % 1000 - 500 AS k
        FROM documents, (SELECT unnest(range(0, {N_AUDIO_SAMPLES})) AS i)
    ),
    c AS (
        SELECT doc_id, CAST(i // {AUDIO_CHUNK} AS BIGINT) AS chunk, i, k,
               lag(k) OVER (PARTITION BY doc_id, i // {AUDIO_CHUNK}
                            ORDER BY i) AS pk
        FROM s
    )
    SELECT doc_id, chunk,
           round(sqrt(SUM(k * k) / (250000.0 * {AUDIO_CHUNK})), 6) AS rms,
           CAST(COUNT(*) FILTER (WHERE pk IS NOT NULL
                                 AND (k >= 0) <> (pk >= 0)) AS BIGINT)
               AS n_zero_crossings
    FROM c GROUP BY doc_id, chunk
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over an opaque payload: decode PCM,
    window into fixed chunks, emit per-chunk RMS energy and
    zero-crossing counts — the torchaudio/librosa front of a speech
    pipeline. The DECODE is a deterministic fake (the container has no
    audio libs): "samples" are an integer stream derived from doc_id
    ((doc_id*31 + i*17) % 1000 - 500, scaled to [-1, 1)), standing in
    for the codec exactly like multimodal_decode's pixel stub.

    Spark-side shape is the real production contract: Arrow-batched
    mapInPandas, one numpy reshape (n_chunks x chunk_len) per document,
    vectorized energy/crossing math, typed long/double output schema —
    zero shuffles, so 100 TB of audio costs one scan plus CPU. The
    exactness trick making a *signal-processing* op oracle-checkable:
    the RMS numerator stays an exact INTEGER sum of squares on both
    engines; only the final divide + sqrt run in floating point
    (identical single IEEE ops), then round(6)."""
    d = load_table(spark, sf_dir, "documents")

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(N_AUDIO_SAMPLES, dtype=np.int64)
        n_chunks = N_AUDIO_SAMPLES // AUDIO_CHUNK
        denom = 250000.0 * AUDIO_CHUNK
        for pdf in batches:
            out = {"doc_id": [], "chunk": [], "rms": [], "n_zero_crossings": []}
            for doc_id in pdf["doc_id"]:
                k = ((doc_id * 31 + idx * 17) % 1000 - 500).reshape(
                    n_chunks, AUDIO_CHUNK
                )
                sum_k2 = (k * k).sum(axis=1)  # exact integer
                rms = np.round(np.sqrt(sum_k2 / denom), 6)
                nonneg = k >= 0
                zcr = (nonneg[:, 1:] != nonneg[:, :-1]).sum(axis=1)
                out["doc_id"].extend([doc_id] * n_chunks)
                out["chunk"].extend(range(n_chunks))
                out["rms"].extend(rms)
                out["n_zero_crossings"].extend(zcr)
            yield pd.DataFrame(out)

    return d.select("doc_id").mapInPandas(
        _features,
        schema="doc_id bigint, chunk bigint, rms double, n_zero_crossings bigint",
    )


_RESIZE_STRIDE = 4  # stub "resize": keep every 4th byte (downsample)

_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("orig_bytes", LongType()),
        StructField("resized_bytes", LongType()),
        StructField("resized_head", StringType()),
        StructField("resized_checksum", LongType()),
    ]
)


def _fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resizer: real deployments replace the byte stride with a
    PIL `thumbnail()` / ffmpeg scale filter. The Spark-side contract
    is the production shape — payload in, smaller payload's typed
    summary out, row-local (no shuffle), Arrow-batched.

    ASCII-only guard (ADVICE r5): the DuckDB oracle strides CHAR
    indices over octet_length, which equals this byte stride only for
    pure-ASCII text. A non-ASCII payload would silently hash-diff, so
    fail loudly here instead — the stub's stand-in corpus contract, not
    a production constraint (a real resizer is byte-oriented and needs
    no oracle symmetry)."""
    for pdf in batches:
        rows: dict[str, list] = {
            "doc_id": [], "orig_bytes": [], "resized_bytes": [],
            "resized_head": [], "resized_checksum": [],
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rows["doc_id"].append(doc_id)
            if payload is None:
                # NULL payload -> NULL summary, mirroring the oracle's
                # NULL propagation through encode/octet_length.
                rows["orig_bytes"].append(None)
                rows["resized_bytes"].append(None)
                rows["resized_head"].append(None)
                rows["resized_checksum"].append(None)
                continue
            if not bytes(payload).isascii():
                raise ValueError(
                    f"multimodal_resize stub: doc_id={doc_id} payload is "
                    "non-ASCII; the DuckDB char-stride oracle is only "
                    "byte-equivalent on ASCII text — extend the oracle "
                    "to byte level before admitting this corpus"
                )
            small = payload[::_RESIZE_STRIDE]
            rows["orig_bytes"].append(len(payload))
            rows["resized_bytes"].append(len(small))
            rows["resized_head"].append(small[:4].hex())
            # Empty payload: DuckDB list_sum([]) is NULL, so the
            # checksum is None (not 0) to stay hash-identical.
            rows["resized_checksum"].append(
                sum(small) % 2_147_483_647 if small else None
            )
        yield pd.DataFrame(rows)


@query(
    "multimodal_resize",
    layer="C",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               octet_length(encode(text)) AS orig_bytes,
               list_transform(
                   range(1, octet_length(encode(text)) + 1, {_RESIZE_STRIDE}),
                   i -> text[i]) AS sampled
        FROM documents
    )
    SELECT doc_id, orig_bytes,
           CAST(len(sampled) AS BIGINT) AS resized_bytes,
           lower(hex(encode(array_to_string(sampled[1:4], ''))))
               AS resized_head,
           CAST(list_sum(list_transform(sampled, c -> ascii(c)))
                % 2147483647 AS BIGINT) AS resized_checksum
    FROM s
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample plumbing over an opaque binary column — the
    remaining member of the decode / feature-extract / resize /
    frame-sample quartet: payload in, RESIZED payload summarized out
    (new size, head bytes, checksum). The stub strides every
    {_RESIZE_STRIDE}th byte where production calls the image scaler;
    the oracle replays the identical stride on the same bytes (ASCII
    corpus, so DuckDB char ops equal Python byte ops — the same
    equivalence multimodal_decode leans on). Row-local mapInPandas:
    no shuffle, payloads never leave their partition, output is a
    fixed typed schema so downstream plans (e.g. filtering oversized
    media before an expensive decode) stay fully columnar. At 100 TB
    resize-before-decode is the standard bandwidth saver — this
    operator is where that filter lives."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return with_payload.mapInPandas(_fake_resize, schema=_RESIZE_SCHEMA)
