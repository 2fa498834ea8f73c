"""Batched-BPE depth stress: run the dominance-batched training loop
(bpe_train_merges_batched's body) for 16 rounds over the sf1 corpus —
up to 64 merges in 16 driver syncs, vs bpe_train_merges' 64 syncs for
the same merge count (scripts/bpe_depth_stress.py) — to measure that
(a) per-round cost stays flat at depth like the sequential trainer's,
and (b) the batch actually stays full as merges accumulate (dominance
could in principle starve as the pair table concentrates).

Usage: python scripts/bpe_batched_depth_stress.py [--skip-gen]
Prints one JSON summary line for PLANS.md Notes.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts.scale_stress import SF1, generate  # noqa: E402

N_ROUNDS = 16


def main() -> int:
    from cuttlefish_spark.operators.curation import _bpe_train_batched
    from cuttlefish_spark.session import get_spark

    spark = get_spark(
        "bpe-batched-depth-stress", cpus=os.environ.get("SPARK_GRAFT_CPUS", 32)
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not ("--skip-gen" in sys.argv and os.path.exists(f"{SF1}/documents.parquet")):
        generate(spark)

    secs: list[float] = []
    merges = _bpe_train_batched(spark, SF1, N_ROUNDS, round_secs=secs).collect()
    rounds = [round(s, 3) for s in secs]
    per_round = {}
    for r in merges:
        per_round[r["round"]] = per_round.get(r["round"], 0) + 1
    q = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    summary = {
        "sf": 1,
        "rounds_timed": len(rounds),
        "total_merges": len(merges),
        "batch_sizes": [per_round.get(i, 0) for i in range(1, N_ROUNDS + 1)],
        "first4_median_s": round(q(rounds[:4]), 3),
        "last4_median_s": round(q(rounds[-4:]), 3),
        "max_s": max(rounds),
        "total_s": round(sum(rounds), 2),
        "per_round_s": rounds,
        "last_merge": list(merges[-1]) if merges else None,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
