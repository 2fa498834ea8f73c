"""Maintain QUERY_HASHES.json — the rewritten-since-verdict manifest
(r9 VERDICT item 2).

Each entry is `name -> {"hash": <source_hash>, "round": N}` where N is
the build round in which the query's implementation LAST CHANGED (0 =
seeded before the manifest existed, i.e. "assume the latest committed
driver verdict describes this code"). __spark_entry__._ordered_specs
sorts queries whose latest driver verdict round <= their change round
(or whose CURRENT hash differs from the manifest — a change newer than
the last regen) ahead of the oldest-green tier, so a rewrite waits at
most one round for its driver re-hash instead of rotating by age.

Usage:
  python scripts/gen_source_hashes.py --round N [--touch name ...]

Run at round close (after the round's last query edit). `--touch`
force-bumps named queries whose behavior changed via a SHARED HELPER
the per-function hash cannot see (e.g. a _gopher_flags edit).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

MANIFEST = REPO / "QUERY_HASHES.json"


def main() -> int:
    from cuttlefish_spark.registry import load_all, source_hash

    args = sys.argv[1:]
    if "--round" not in args:
        sys.exit("usage: gen_source_hashes.py --round N [--touch name ...]")
    rnd = int(args[args.index("--round") + 1])
    touch = set(args[args.index("--touch") + 1 :]) if "--touch" in args else set()

    old: dict[str, dict] = {}
    seeded = not MANIFEST.exists()
    if not seeded:
        old = json.loads(MANIFEST.read_text())

    specs = load_all()
    unknown = touch - set(specs)
    if unknown:
        sys.exit(f"--touch names not in registry: {sorted(unknown)}")

    out: dict[str, dict] = {}
    changed, new = [], []
    for name, spec in specs.items():
        h = source_hash(spec)
        prev = old.get(name)
        if prev is None:
            # Seed round 0: "no change recorded" — new queries added in
            # round N land in the never-checked tier regardless.
            out[name] = {"hash": h, "round": 0 if seeded else rnd}
            new.append(name)
        elif prev["hash"] != h or name in touch:
            out[name] = {"hash": h, "round": rnd}
            changed.append(name)
        else:
            out[name] = prev
    # Dropped queries fall out of the manifest with their registration.
    MANIFEST.write_text(
        json.dumps(dict(sorted(out.items())), indent=1, sort_keys=True) + "\n"
    )
    # Stage the manifest AND this round's STAMPED artifacts (r11
    # VERDICT item 1: round-close scripts stage their own outputs so a
    # close-out can't forget them; the commit itself stays explicit).
    # Only files stamped _r{rnd} are swept — the un-stamped
    # BENCH_FULL.json is bench.py --record's to stage, so regenerating
    # this manifest mid-round can never drag unrelated local
    # modifications into the next commit (r12 ADVICE).
    import subprocess

    arts = [str(MANIFEST)] + [
        str(p)
        for pat in (
            f"CORRECTNESS_r{rnd}.json",
            f"BENCH_r{rnd}.json",
            f"BENCH_FULL_r{rnd}.json",
            f"FULLCHECK_r{rnd}.json",
        )
        for p in [REPO / pat]
        if p.exists()
    ]
    res = subprocess.run(["git", "-C", str(REPO), "add", *arts])
    if res.returncode != 0:
        print(f"WARNING: git add exited {res.returncode} — stage manually")
    print(f"staged: {[Path(a).name for a in arts]}")
    print(
        json.dumps(
            {
                "round": rnd,
                "total": len(out),
                "new": sorted(new),
                "changed_or_touched": sorted(changed),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
