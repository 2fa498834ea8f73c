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


# The verification driver checks a bounded prefix of queries() (the
# first ~50 names in dict order, per round). Order the dict so coverage
# accrues across rounds AND green verdicts rotate by staleness:
#   1. queries whose LATEST committed driver verdict is a failure
#      (prove the fix first) — err == "no_oracle" is NOT a failure, it
#      is the driver's marker for a rows-only query with no SQL oracle;
#   2. queries with no driver row in any committed CORRECTNESS_r*.json
#      (close the coverage gap);
#   3. the green remainder, OLDEST verdict round first, so every green
#      row is eventually re-confirmed against later cross-cutting
#      rewrites instead of coasting on an r1/r2-era verdict.
# Derived from the committed files at import time so the ordering can
# never go stale between rounds.


def _driver_verdicts() -> dict[str, tuple[bool, int, bool]]:
    """name -> (latest pass/fail, round of that verdict, rows-only?).

    err == "no_oracle" counts as a pass at its declared verification
    level (rows-only by design), so it rotates with the greens rather
    than permanently pinning a failure slot.
    """
    import glob
    import json
    import re

    verdicts: dict[str, tuple[bool, int, bool]] = {}
    for path in sorted(glob.glob(str(Path(_REPO) / "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = (
                (row.get("err") is None or row.get("err") == "no_oracle")
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            rows_only = row.get("err") == "no_oracle"
            # later rounds override earlier ones
            verdicts[name] = (ok, rnd, rows_only)
    return verdicts


# Rewritten-since-verdict tier (r9 VERDICT item 2): QUERY_HASHES.json
# (maintained by scripts/gen_source_hashes.py at round close) records
# each query's implementation hash and the round its source last
# changed. A query enters the recheck tier — right after never-checked
# — when EITHER its current source hash differs from the manifest (a
# change newer than the last regen) OR its latest driver verdict round
# is <= its recorded change round. The <= is deliberate: round
# artifacts can be committed mid-round, so a round-N verdict may
# predate a later round-N change — the cost of the strict rule is one
# redundant window slot for one round, the cost of the loose rule is a
# semantic change the driver never re-proves. The tier SELF-CLEARS
# once a committed CORRECTNESS_r*.json from a strictly later round
# re-verifies the query.


def _change_manifest() -> dict[str, dict]:
    import json

    path = Path(_REPO) / "QUERY_HASHES.json"
    try:
        return json.loads(path.read_text())
    except (OSError, ValueError):
        return {}


def _order_names(
    names: list[str],
    verdicts: dict[str, tuple[bool, int, bool]],
    has_oracle: dict[str, bool],
    manifest: dict[str, dict],
    cur_hash: dict[str, str],
) -> list[str]:
    """Pure ordering rule (unit-tested in tests/test_rotation.py):
    failed -> never-checked -> rewritten-since-verdict -> green by
    staleness."""
    failed = [n for n in names if n in verdicts and not verdicts[n][0]]
    # "Never checked" includes verification-LEVEL upgrades: a query whose
    # latest driver verdict was rows-only ("no_oracle") but which now
    # declares a SQL oracle must be re-verified at the hash level, not
    # coast on the weaker pass (markdown_html after its r6 golden-hash
    # oracle is the motivating case).
    never_checked = [
        n for n in names if n not in verdicts or (verdicts[n][2] and has_oracle[n])
    ]
    pending = set(failed) | set(never_checked)
    recheck = [
        n
        for n in names
        if n in manifest
        and n not in pending
        and (
            cur_hash.get(n) != manifest[n]["hash"]
            or verdicts[n][1] <= manifest[n]["round"]
        )
    ]
    pending |= set(recheck)
    # Stalest green first; ties broken by registry order for stability.
    green = sorted(
        (n for n in names if n in verdicts and verdicts[n][0] and n not in pending),
        key=lambda n: (verdicts[n][1], names.index(n)),
    )
    return failed + never_checked + recheck + green


def _ordered_specs():
    from cuttlefish_spark.registry import source_hash

    specs = load_all()
    names = list(specs)
    order = _order_names(
        names,
        _driver_verdicts(),
        {n: specs[n].oracle is not None for n in names},
        _change_manifest(),
        {n: source_hash(specs[n]) for n in names},
    )
    return {name: specs[name] for name in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered_specs().items() if spec.oracle}
