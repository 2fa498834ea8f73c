"""Query registry — the single source of truth for the engine's
declared operator surface (SURVEY.md §2.C).

Every operator is registered here with:
  - a Spark implementation  fn(spark, sf_dir) -> DataFrame
  - an optional DuckDB oracle SQL string (None => rows-only check)

`__spark_entry__.py` and the test-suite both read this registry, so a
query is "declared" in exactly one place.

This mirrors the reference's named-function registry pattern: the
WORKERS hash mapping adapter-name -> worker fn at
/root/reference/private/api-runner.rkt:19-22 is the reference's only
extension surface; here the registry maps query-name -> plan builder.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

_OPERATOR_MODULES = [
    "cuttlefish_spark.operators.layer_a",
    "cuttlefish_spark.operators.relational",
    "cuttlefish_spark.operators.relational_ext",
    "cuttlefish_spark.operators.behavioral",
    "cuttlefish_spark.operators.profiling",
    "cuttlefish_spark.operators.scale",
    "cuttlefish_spark.operators.text",
    "cuttlefish_spark.operators.curation",
    "cuttlefish_spark.operators.unigram",
    "cuttlefish_spark.operators.dedup",
    "cuttlefish_spark.operators.similarity",
    "cuttlefish_spark.operators.multimodal",
    "cuttlefish_spark.operators.ingest",
    "cuttlefish_spark.operators.udtf_ops",
    "cuttlefish_spark.operators.streaming_ops",
    "cuttlefish_spark.operators.preference",
]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    layer: str  # "A" (reference parity) | "B" (relational) | "C" (LLM pipeline)
    fn: QueryFn
    oracle: str | None
    doc: str = ""


def query(name: str, layer: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register `fn` as a declared query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, layer, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration)."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)


def source_hash(spec: QuerySpec) -> str:
    """Content hash of a query's IMPLEMENTATION as the driver verifies
    it: the registered function's source text (decorator lines included,
    so literal oracles are covered twice) plus the resolved oracle SQL
    (covering helper-built oracles). QUERY_HASHES.json records this per
    query per change-round; __spark_entry__ compares it against the
    committed manifest to force rewritten-since-verdict queries into the
    driver window (r9 VERDICT item 2). Limitation by design: a change
    inside a shared helper the function CALLS does not alter this hash —
    bump such queries with `gen_source_hashes.py --touch`."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(spec.fn)
    except OSError:  # source unavailable (REPL-defined fn in tests)
        src = spec.fn.__code__.co_code.hex()
    body = src + "\x00" + (spec.oracle or "")
    return hashlib.sha256(body.encode()).hexdigest()[:16]
