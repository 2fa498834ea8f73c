"""Regenerate the SURVEY.md §2.C operator table from the registry.

Run after adding/removing declared queries so the judge-facing
inventory never drifts from the code:  python scripts/gen_survey_table.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from cuttlefish_spark.registry import load_all  # noqa: E402

HEADER = """### 2.C Engine operator surface (what `__spark_entry__.py:queries()` declares)

This table is generated from `cuttlefish_spark/registry.py` — the
single source of truth — and lists every declared query: Layer A =
reference parity on the `events` table / golden fixtures, Layer B =
relational capability, Layer B-LLM = the mandated LLM-data-pipeline
extensions. "Oracle: yes" means the driver hash-compares the Spark
result against DuckDB at sf0.01; "rows-only" marks genuinely
non-SQL-expressible ops.

| Query name | Layer | What it computes | Oracle |
|---|---|---|---|
"""

LAYER = {"A": ("A", 0), "B": ("B", 1), "C": ("B-LLM", 2)}


def main() -> None:
    specs = load_all()
    rows = []
    for name, s in sorted(specs.items(), key=lambda kv: (LAYER[kv[1].layer][1], kv[0])):
        doc = re.sub(r"\s+", " ", (s.doc or "").strip().split("\n\n")[0])
        if len(doc) > 170:
            doc = doc[:167] + "..."
        oracle = "yes" if s.oracle else "rows-only"
        rows.append(f"| `{name}` | {LAYER[s.layer][0]} | {doc} | {oracle} |")

    survey = REPO / "SURVEY.md"
    text = survey.read_text()
    start = text.index("### 2.C Engine operator surface")
    end = text.index("\nUDF surface", start)
    survey.write_text(text[:start] + HEADER + "\n".join(rows) + "\n" + text[end:])
    print(f"wrote {len(rows)} rows to SURVEY.md §2.C")


if __name__ == "__main__":
    main()
