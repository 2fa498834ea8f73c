"""Tokenizer O(vocabulary) stress on a REALISTIC vocabulary (r8
VERDICT item 3): the sf1 depth stresses ride on a ~31-word synthetic
vocab, where "per-round cost is O(vocab)" is trivially constant. This
script generates a 50k-doc corpus drawing from a ~50k-word ZIPFIAN
vocabulary (s = 1.1, word lengths 2-12 chars — the shape of a real
crawl's token distribution), then re-runs

  - bpe_train_merges' loop for 64 merges, and
  - the unigram hard-EM loop for 8 rounds,

recording per-round wall-clock AND the driver-side collect volumes.
What the architecture predicts (and this measures): the distributed
word/symbol tables grow ~1600x with the vocab, but they stay
DISTRIBUTED — per-round cost rises with table size yet stays flat in
the round index; driver traffic stays bounded (BPE: ONE argmax row
per merge; unigram: singles = alphabet size + top-120 multi-piece
candidates + O(model) usage rows — never the vocabulary itself).

Usage: python scripts/zipf_vocab_stress.py [--skip-gen]
Prints one JSON summary per trainer for PLANS.md Notes.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

ZIPF_DIR = os.environ.get("SPARK_GRAFT_ZIPF_DIR", "/tmp/cuttlefish_zipf")
DOCS_N = 50_000
VOCAB_N = 50_000
ZIPF_S = 1.1
SEED = 42
N_MERGES = 64
N_EM_ROUNDS = 8


def generate() -> None:
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    os.makedirs(ZIPF_DIR, exist_ok=True)

    # 50k distinct word types, lengths 2..12, letters a-z; collisions
    # de-duped with a base-26 suffix so the type count is exact.
    lengths = rng.integers(2, 13, size=VOCAB_N)
    letters = "abcdefghijklmnopqrstuvwxyz"
    seen: set[str] = set()
    vocab: list[str] = []
    for i, L in enumerate(lengths):
        w = "".join(letters[j] for j in rng.integers(0, 26, size=L))
        while w in seen:
            w += letters[i % 26]
        seen.add(w)
        vocab.append(w)
    vocab_arr = np.array(vocab)

    # Zipf ranks: p(r) ~ 1/r^s over the 50k types.
    ranks = np.arange(1, VOCAB_N + 1, dtype=np.float64)
    p = ranks ** (-ZIPF_S)
    p /= p.sum()

    n_tokens = rng.integers(8, 101, size=DOCS_N)
    total = int(n_tokens.sum())
    draws = rng.choice(VOCAB_N, size=total, p=p)
    texts = []
    pos = 0
    for k in n_tokens:
        texts.append(" ".join(vocab_arr[draws[pos : pos + k]].tolist()))
        pos += k

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(DOCS_N, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * DOCS_N,
            "source": [f"src{i}" for i in rng.integers(0, 20, size=DOCS_N)],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        f"{ZIPF_DIR}/documents.parquet",
    )


def main() -> int:
    from cuttlefish_spark.operators.curation import _bpe_train
    from cuttlefish_spark.operators.unigram import _ug_em, _ug_words
    from cuttlefish_spark.session import get_spark

    spark = get_spark(
        "zipf-vocab-stress", cpus=os.environ.get("SPARK_GRAFT_CPUS", 32)
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not (
        "--skip-gen" in sys.argv
        and os.path.exists(f"{ZIPF_DIR}/documents.parquet")
    ):
        generate()

    q = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731

    n_types = _ug_words(spark, ZIPF_DIR).count()

    # --- unigram hard-EM, 8 rounds ---
    ug_secs: list[float] = []
    costs = _ug_em(spark, ZIPF_DIR, N_EM_ROUNDS, round_secs=ug_secs)
    ug_rounds = [round(s, 3) for s in ug_secs]
    print(
        json.dumps(
            {
                "trainer": "unigram",
                "zipf_vocab_types": n_types,
                "rounds_timed": len(ug_rounds),
                "first4_median_s": round(q(ug_rounds[:4]), 3),
                "last4_median_s": round(q(ug_rounds[-4:]), 3),
                "max_s": max(ug_rounds),
                "total_s": round(sum(ug_rounds), 2),
                "model_size_per_round": [len(c) for c in costs],
                "per_round_s": ug_rounds,
            }
        )
    )

    # --- BPE, 64 merges ---
    bpe_secs: list[float] = []
    merges = _bpe_train(spark, ZIPF_DIR, N_MERGES, round_secs=bpe_secs)[
        0
    ].collect()
    bpe_rounds = [round(s, 3) for s in bpe_secs]
    print(
        json.dumps(
            {
                "trainer": "bpe",
                "zipf_vocab_types": n_types,
                "n_merges": len(merges),
                "first8_median_s": round(q(bpe_rounds[:8]), 3),
                "last8_median_s": round(q(bpe_rounds[-8:]), 3),
                "max_s": max(bpe_rounds),
                "total_s": round(sum(bpe_rounds), 2),
                "last_merge": list(merges[-1]) if merges else None,
                "per_round_s": bpe_rounds,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
