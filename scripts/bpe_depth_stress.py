"""BPE training depth stress (r6 VERDICT item 7): run the
bpe_train_merges loop for 64 merges over the sf1 corpus (50k docs) and
record per-round wall-clock, to prove the O(vocab) claim where it
matters — the per-round cost must stay flat as merges accumulate and
symbols lengthen (each round is one explode + bounded-key count
shuffle + ONE argmax row to the driver; nothing in that shape grows
with the merge index, but only a measurement shows the fold's symbol
lengthening doesn't creep in).

Usage: python scripts/bpe_depth_stress.py [--skip-gen]
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

N_MERGES = 64


def main() -> int:
    from cuttlefish_spark.operators.curation import _bpe_train
    from cuttlefish_spark.session import get_spark

    spark = get_spark(
        "bpe-depth-stress", cpus=os.environ.get("SPARK_GRAFT_CPUS", 32)
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not ("--skip-gen" in sys.argv and os.path.exists(f"{SF1}/documents.parquet")):
        generate(spark)

    secs: list[float] = []
    merges = _bpe_train(spark, SF1, N_MERGES, round_secs=secs)[0].collect()
    rounds = [round(s, 3) for s in secs]
    q = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    summary = {
        "sf": 1,
        "n_merges": len(merges),
        "rounds_timed": len(rounds),
        "first8_median_s": round(q(rounds[:8]), 3),
        "last8_median_s": round(q(rounds[-8:]), 3),
        "min_s": min(rounds),
        "max_s": max(rounds),
        "total_s": round(sum(rounds), 2),
        "per_round_s": rounds,
        "last_merge": list(merges[-1]) if merges else None,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
