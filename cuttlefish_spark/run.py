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
) -> DataFrame:
    """Run the whole reference pipeline under `config`; returns the
    per-chapter audit frame (chapter_id, status, n_events, log_line)."""
    from cuttlefish_spark.operators.ingest import datasource_canonical
    from cuttlefish_spark.sinks.json_sink import audit_counts, write_keyed_json
    from cuttlefish_spark.sources.config import load_config

    config = config or load_config(arg=config_arg)
    chapters_path = config["chapter-json-file"]
    out = datasource_canonical(
        spark,
        chapters_path=chapters_path if os.path.exists(chapters_path) else None,
        transport=transport,
    ).persist()

    ok = out.filter("status = 'OK'").drop("status", "error")
    write_keyed_json(ok, config["json-out-path"])

    audit = audit_counts(out)
    log_dir = config["logfile-path"]
    os.makedirs(log_dir, exist_ok=True)
    lines = [
        f"{r['log_line']} ({r['n_events']})"
        for r in audit.orderBy("chapter_id", "status").collect()
    ]
    with open(os.path.join(log_dir, "cuttlefish.log"), "a", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    out.unpersist()
    return audit


def main() -> None:
    from cuttlefish_spark.session import get_spark

    spark = get_spark("cuttlefish-run")
    spark.sparkContext.setLogLevel("ERROR")
    audit = run_pipeline(spark, config_arg=sys.argv[1] if len(sys.argv) > 1 else None)
    for r in audit.orderBy("chapter_id", "status").collect():
        print(f"{r['log_line']} ({r['n_events']})")


if __name__ == "__main__":
    main()
