"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over cuttlefish_spark.registry — the single source of truth
for the declared operator surface (SURVEY.md §2.C). Each registered
QuerySpec carries the Spark plan builder and (where SQL-expressible)
the DuckDB oracle; rows-only ops register oracle=None.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from cuttlefish_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: keyed fan-out accounting over sf0.001 events — the
    reference's core read -> normalize -> key -> account loop
    (SURVEY.md §7 M0)."""
    specs = load_all()
    return specs["keyed_output_counts"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle}
