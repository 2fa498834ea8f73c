"""Unigram-LM EM depth stress: run the unigram hard-EM loop for 8
rounds over the sf1 corpus (50k docs) and record per-round wall-clock,
to prove the O(vocabulary) claim where it matters — every E-step is
one Viterbi segmentation pass over the distinct-word table plus an
O(V) usage collect, so per-round cost must stay flat as the model
evolves (unlike BPE, the unigram vocabulary does not grow with depth;
the stress still has to show the map-literal rebuild and the fold
don't creep).

Usage: python scripts/unigram_depth_stress.py [--skip-gen]
Prints per-round seconds and a summary line for PLANS.md Notes.
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

N_ROUNDS = 8


def main() -> int:
    from cuttlefish_spark.operators.unigram import _ug_em
    from cuttlefish_spark.session import get_spark

    spark = get_spark(
        "unigram-depth-stress", cpus=os.environ.get("SPARK_GRAFT_CPUS", 32)
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not ("--skip-gen" in sys.argv and os.path.exists(f"{SF1}/documents.parquet")):
        generate(spark)

    secs: list[float] = []
    costs = _ug_em(spark, SF1, N_ROUNDS, round_secs=secs)
    rounds = [round(s, 3) for s in secs]
    q = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    final = costs[-1]
    summary = {
        "sf": 1,
        "rounds_timed": len(rounds),
        "first4_median_s": round(q(rounds[:4]), 3),
        "last4_median_s": round(q(rounds[-4:]), 3),
        "min_s": min(rounds),
        "max_s": max(rounds),
        "total_s": round(sum(rounds), 2),
        "per_round_s": rounds,
        "vocab_size": len(final),
        "converged": costs[-1] == costs[-2],
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
