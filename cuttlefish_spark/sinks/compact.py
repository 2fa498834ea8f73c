"""Small-file compaction — the table-maintenance pass every long-lived
parquet lake needs: streaming sinks and fine-grained partitioned
writes accumulate thousands of KB-scale files, and at 100 TB the
resulting scan is metadata-bound (one footer read + one task per tiny
file) instead of IO-bound. Compaction rewrites a prefix/partition to
~target-sized files.

Reference anchor: the per-key JSON sink (api-runner.rkt:39-52) is
exactly the kind of writer that produces one-file-per-key output; this
is its long-run maintenance counterpart.

Scale posture: file count is computed from the ACTUAL byte size of the
input (not row counts — row width varies), and the rewrite is one
`repartition(n)` — a single round-robin shuffle that also fixes skewed
input file sizes, unlike `coalesce(n)` which merges co-located files
and preserves skew (and can starve cluster parallelism during the
write). Run per-partition-prefix in production so compaction of one
day never rewrites the table.
"""

from __future__ import annotations

import math
from pathlib import Path

from pyspark.sql import SparkSession


def parquet_bytes(path: str) -> int:
    """Total bytes of parquet data files under `path` (driver-side
    listing — compaction planning is a metadata operation)."""
    return sum(p.stat().st_size for p in Path(path).rglob("*.parquet"))


def plan_target_files(total_bytes: int, target_file_mb: int = 128) -> int:
    """Files needed so each lands near the target size (the parquet
    sweet spot: big enough to amortize footers/row-groups, small
    enough to split work).  Always >= 1."""
    return max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))


def compact_parquet(
    spark: SparkSession, src: str, dst: str, target_file_mb: int = 128
) -> int:
    """Rewrite the parquet dataset at `src` into `dst` with
    ~target_file_mb files. Returns the file count written."""
    n = plan_target_files(parquet_bytes(src), target_file_mb)
    spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(dst)
    return n
