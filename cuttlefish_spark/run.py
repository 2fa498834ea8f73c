"""End-to-end pipeline runner — the engine twin of `racket main.rkt
[configfile]` (reference main.rkt:27-62 + run-workers,
api-runner.rkt:118-168).

Flow: resolve runtime config (A1) -> chapters work-list drives the
fetch DataSource (one input partition per chapter, A2-A9) -> adapter
normalization to the canonical event schema (A10-A18) -> per-chapter
`{chapter}.json` files under the config's json-out-path (A21,
api-runner.rkt:39-52) -> WROTE:/ERROR: audit lines appended under
logfile-path (A23, api-runner.rkt:80-89). Returns the audit frame so
callers can assert on it; the CLI prints the log lines.

Usage: python -m cuttlefish_spark.run [configfile]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, SparkSession


def run_pipeline(
    spark: SparkSession,
    config: dict | None = None,
    config_arg: str | None = None,
    transport: str = "replay",
    allow_fixture_chapters: bool = False,
) -> DataFrame:
    """Run the whole reference pipeline under `config`; returns the
    per-chapter audit frame (chapter_id, status, n_events, log_line).

    A missing `chapter-json-file` is an ERROR, matching the reference
    (an unreadable chapters table aborts the run) — a misconfigured
    production run must not silently fetch demo data. The built-in
    golden-fixture chapters are reachable only behind the explicit
    `allow_fixture_chapters` replay/test flag."""
    from cuttlefish_spark.operators.ingest import datasource_canonical
    from cuttlefish_spark.sinks.json_sink import audit_counts, write_keyed_json
    from cuttlefish_spark.sources.config import load_config

    config = config or load_config(arg=config_arg)
    chapters_path = config["chapter-json-file"]
    if not os.path.exists(chapters_path):
        if not allow_fixture_chapters:
            raise FileNotFoundError(
                f"chapter-json-file not found: {chapters_path!r} "
                "(pass allow_fixture_chapters=True to replay the "
                "built-in fixture chapters in tests/demos)"
            )
        chapters_path = None
    out = datasource_canonical(
        spark,
        chapters_path=chapters_path,
        transport=transport,
    ).persist()

    ok = out.filter("status = 'OK'").drop("status", "error")
    write_keyed_json(ok, config["json-out-path"])

    audit = audit_counts(out)
    lines = [
        f"{r['log_line']} ({r['n_events']})"
        for r in audit.orderBy("chapter_id", "status").collect()
    ]
    append_log(config["logfile-path"], lines)
    out.unpersist()
    return audit


def append_log(log_dir: str, lines: list[str], today=None) -> None:
    """Append audit lines to `cuttlefish.log`, rotating daily (A24,
    reference logger.rkt:54-63: an hourly alarm restarts the log file
    at hour 0 — here the day boundary is checked on write, which is
    the driver-side equivalent without a daemon thread). A log last
    written on an earlier day is renamed `cuttlefish-YYYY-MM-DD.log`
    before the append starts the fresh file."""
    import datetime as _dt

    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, "cuttlefish.log")
    today = today or _dt.date.today()
    if os.path.exists(path):
        stamp = _dt.date.fromtimestamp(os.path.getmtime(path))
        if stamp < today:
            os.replace(path, os.path.join(log_dir, f"cuttlefish-{stamp.isoformat()}.log"))
    with open(path, "a", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")


def main() -> None:
    from cuttlefish_spark.session import get_spark

    spark = get_spark("cuttlefish-run")
    spark.sparkContext.setLogLevel("ERROR")
    audit = run_pipeline(spark, config_arg=sys.argv[1] if len(sys.argv) > 1 else None)
    for r in audit.orderBy("chapter_id", "status").collect():
        print(f"{r['log_line']} ({r['n_events']})")


if __name__ == "__main__":
    main()
