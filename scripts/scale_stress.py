"""sf1 scale-stress of the pair-producing dedup/similarity family.

The family's cost claim is "bounded by true pair volume, never n^2/2"
(operators/dedup.py module docstring). That claim is only measured at
sf0.1 (5k docs / 2k embeddings); this script PROVES the scaling by
generating a 10x corpus (sf1-equivalent: 50k docs / 20k embeddings)
with the same generative distributions as the driver's synthetic data
(31-word vocab, ~54-token docs, 5 langs at the observed mix, uniform
src0..19, ~0.16% exact-dup rate plus a matched near-dup rate;
embeddings ~ N(0, 0.125^2) per dim, labels uniform 0..9) and timing
each query at sf0.1 vs sf1 alongside its OUTPUT PAIR VOLUME at both
scales.

Verdict per query: observed wall-clock exponent (log10 t_sf1/t_sf0.1)
must not exceed the pair-volume exponent (log10 rows_sf1/rows_sf0.1)
by more than the fixed-overhead slack — i.e. runtime grows no faster
than the work the semantics demand. Driver memory is sampled via
ru_maxrss before/after to catch any collect()-shaped regression.

Usage: python scripts/scale_stress.py [--skip-gen] [--tpch] [names...]
Writes the corpus under /tmp/cuttlefish_sf1 (regenerated unless
--skip-gen and the dir exists); prints one JSON line per query and a
final summary JSON line.

--sf10 (r9 VERDICT item 4) extends the decade: sf1 (50k docs) ->
sf10 (500k docs, same degenerate 31-word distributions) for the
non-pair-enumerating members (substring_dedup, line_dedup). Every
pair-enumerating member (dedup_clusters, minhash_shingles,
ngram_jaccard, ngram_jaccard_topk, minhash_accuracy) is NOT silently
skipped there — on this corpus ~7% of ALL pairs are true dups (87M
emitted pairs at sf1, vol_exp 1.97), so sf10 implies ~8.7e9
candidate/output pairs (~200+ GB of shuffle, one giant near-dup
component) — quadratic BY SEMANTICS, measured and recorded in
PLANS.md Notes; their sf10 decade runs with --sf10-zipf on the
REALISTIC 50k-type zipf(1.1) vocabulary (the zipf_vocab_stress corpus
recipe, same 0.16% exact-dup + 0.16% one-token-edit planting), where
pair volume is dup-planting-bound like a real crawl instead of
vocabulary-degenerate.

--tpch switches to the relational family: generates the 10x star
schema (6M lineitem / 1.5M orders / 150k customer / 10k supplier /
200k part, marginals mirrored from sf0.1 — keys serial, foreign keys
uniform, dates independent-uniform over the observed 1995..2001 span
exactly as the driver data has them) and times the complete
sql_frontend_q1..q22 suite at sf0.1 vs sf1. For scan/join/agg
queries the comparator is INPUT volume (10x), not output rows: a
healthy plan lands well under time_exp = 1 because fixed overheads
amortize; anything at or above ~1 on a 10x input is flagged.
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


SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/cuttlefish_sf10")
ZIPF1 = os.environ.get("SPARK_GRAFT_ZIPF1_DIR", "/tmp/cuttlefish_zipf_sf1")
ZIPF10 = os.environ.get("SPARK_GRAFT_ZIPF10_DIR", "/tmp/cuttlefish_zipf_sf10")

# Degenerate-corpus sf10 is reserved for the NON-pair-enumerating
# members: attempted with dedup_clusters included, its MinHash band
# join ran 26 cores for 15+ minutes with 0 of 64 tasks complete —
# on this corpus ~7% of ALL pairs are genuinely 0.5-Jaccard similar,
# so at 500k docs the bucket-pair stream is ~8.7e9 rows and the
# near-dup graph is one giant component; ANY correct clustering is
# O(true pairs) there, i.e. quadratic BY SEMANTICS. That is the
# superlinear break this rung exists to find, and it is recorded in
# PLANS.md Notes rather than silently skipped; every pair-enumerating
# member measures its sf10 decade on the realistic zipf vocabulary
# below, where pair volume is dup-planting-bound like a real crawl.
SF10_QUERIES = ["substring_dedup", "line_dedup"]
SF10_ZIPF_QUERIES = ["dedup_clusters", "dedup_clusters_banded",
                     "minhash_shingles", "ngram_jaccard",
                     "ngram_jaccard_topk", "minhash_accuracy"]


# --emb10 (r11): the ANN/serving ladder's second scale decade — 20k
# (sf1) -> 200k vectors, same N(0, 0.125^2) 64-dim distribution.
EMB10 = os.environ.get("SPARK_GRAFT_EMB10_DIR", "/tmp/cuttlefish_emb10")
EMB10_QUERIES = [
    "embedding_cosine_topk",
    "ann_ivf_topk",
    "ann_ivf_multiprobe",
    "pq_adc_topk",
    "ivfpq_topk",
    "embedding_kmeans",
    "kcenter_coreset",
    "hard_negative_mining",
]


def generate_emb10() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    os.makedirs(EMB10, exist_ok=True)
    n = 10 * EMB_N
    emb = rng.normal(0.0, 0.125, size=(n, 64)).astype(np.float32)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32)),
        }),
        f"{EMB10}/embeddings.parquet",
    )


def band_exponent(spark) -> None:
    """--band-exp: candidate-stream volume of the three LSH bandings
    across the zipf sf1->sf10 decade (r11: the 'Done' evidence for
    wiring the banding knob into the operators — the b=2,r=2 exponent
    was measured at 2.03 in r10; the scaled setting must hold ~<= 1.2).
    Counts the band-join candidate stream itself (pre-payload, the
    quantity that grows superlinearly), not the verified edges."""
    import math
    import time as _t

    from pyspark.sql import functions as F

    from cuttlefish_spark.operators.dedup import (
        _band_candidates,
        _pick_banding,
        _token_signatures,
    )

    out: dict = {}
    for label, d in (("zipf_sf1", ZIPF1), ("zipf_sf10", ZIPF10)):
        row = {}
        # The ADAPTIVE flagship's own rung (r11 VERDICT item 2 "Done"
        # evidence): what dedup_clusters actually chooses and pays here.
        wide = _token_signatures(spark, d, with_rep=True, wide=True)
        choice = _pick_banding(wide.filter(F.col("doc_id") == F.col("rep_id")))
        for cfg, r in (("b2r2", 2), ("b1r4", 4), ("b1r8", 8)):
            sig = _token_signatures(spark, d, wide=(r == 8))
            t0 = _t.monotonic()
            n = _band_candidates(sig, rows_per_band=r, payload=False).count()
            row[cfg] = {"candidates": n, "sec": round(_t.monotonic() - t0, 1)}
        row["adaptive"] = {
            "rows_per_band": choice,
            "candidates": row["b2r2" if choice == 2 else "b1r8"]["candidates"],
        }
        out[label] = row
    for cfg in ("b2r2", "b1r4", "b1r8", "adaptive"):
        e = math.log10(
            max(out["zipf_sf10"][cfg]["candidates"], 1)
            / max(out["zipf_sf1"][cfg]["candidates"], 1)
        )
        out[f"candidate_exp_{cfg}"] = round(e, 2)
    print(json.dumps({"band_exponent": out}), flush=True)


def e2e_stage3_exponent(spark) -> None:
    """--e2e-stage3: the capstone's near-dup stage-3 candidate stream
    over the zipf sf1->sf10 decade (r12 VERDICT item 2 'Done'
    evidence — the hard-coded b=2,r=2 banding this stage replaced had
    measured exponent 2.03). Runs the REAL stage machinery
    (_e2e_stage3_pairs, the function pretrain_data_e2e itself calls)
    on the stage-2-equivalent survivor set: exact dedup (min doc_id
    per normalized-content md5) applied to the zipf corpus. Stage 1
    (URL dedup) is identity there — the zipf docs carry no url column
    — which only INCREASES the surviving doc count and hence the
    measured candidate volume, so the exponent is an upper bound on
    the capstone's."""
    import math
    import time as _t

    from pyspark.sql import functions as F

    from cuttlefish_spark.functions import tokens, word_shingles
    from cuttlefish_spark.io import load_table
    from cuttlefish_spark.operators.curation import _e2e_stage3_pairs

    out: dict = {}
    for label, d in (("zipf_sf1", ZIPF1), ("zipf_sf10", ZIPF10)):
        docs = load_table(spark, d, "documents")
        norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        eh = docs.select("doc_id", F.md5(norm).alias("ch"))
        ek = eh.groupBy("ch").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
        sh = F.array_distinct(word_shingles(tokens(F.col("text")), k=3))
        nsh = docs.select("doc_id", sh.alias("sh")).join(ek, "doc_id")
        t0 = _t.monotonic()
        rpb, pairs, _sig = _e2e_stage3_pairs(nsh)
        n = pairs.count()
        out[label] = {
            "rows_per_band": rpb,
            "candidates": n,
            "sec": round(_t.monotonic() - t0, 1),
        }
    out["candidate_exp"] = round(
        math.log10(
            max(out["zipf_sf10"]["candidates"], 1)
            / max(out["zipf_sf1"]["candidates"], 1)
        ),
        2,
    )
    print(json.dumps({"e2e_stage3": out}), flush=True)


def generate_docs(out_dir: str, n_docs: int, zipf: bool) -> None:
    """documents.parquet generator shared by the sf10 decade rungs.

    zipf=False mirrors generate(): the driver data's 31-word vocab and
    observed lang mix. zipf=True draws from a 50k-type zipf(1.1)
    vocabulary (scripts/zipf_vocab_stress.py's corpus recipe) — the
    realistic shingle space where near-dup pair volume is bound by the
    PLANTED dup rate, not by vocabulary collisions. Both plant the
    driver-observed ~0.16% exact-dup rate plus the same rate of
    one-token in-place edits so every dedup query has true positives,
    and both draw doc lengths from the same 8..100-token range."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    os.makedirs(out_dir, exist_ok=True)

    if zipf:
        vocab_n, zipf_s = 50_000, 1.1
        lengths = rng.integers(2, 13, size=vocab_n)
        letters = "abcdefghijklmnopqrstuvwxyz"
        seen: set[str] = set()
        vocab_list: list[str] = []
        for i, ln in enumerate(lengths):
            w = "".join(letters[j] for j in rng.integers(0, 26, size=ln))
            while w in seen:
                w += letters[i % 26]
            seen.add(w)
            vocab_list.append(w)
        vocab_arr = np.array(vocab_list)
        # HEAD-TRUNCATED zipf: p(r) ~ 1/(r+100)^s. The raw zipf(1.1)
        # head puts the top type in ~99% of 54-token docs (a stopword),
        # and the token-SET MinHash these operators band on then funnels
        # a constant fraction of the corpus into one band bucket — the
        # measured 3-straggler-task tail that motivated this truncation
        # (PLANS.md Notes, r10). Token-set Jaccard presumes CONTENT
        # words (production pipelines strip stopwords before shingling
        # — Lee 2021 dedup, CCNet); dropping the top-100 ranks models
        # that while keeping the realistic 50k-type zipf tail. Top type
        # lands in ~11% of docs and is a doc's minhash ~1/|doc| of the
        # time, so band buckets stay O(0.2%) of the corpus.
        ranks = np.arange(1, vocab_n + 1, dtype=np.float64)
        p = (ranks + 100.0) ** (-zipf_s)
        p /= p.sum()
        langs = np.array(["en"] * n_docs)
    else:
        import duckdb

        con = duckdb.connect()
        vocab_arr = np.array([
            r[0]
            for r in con.sql(
                "select distinct unnest(string_split(text, ' ')) w "
                f"from '{SF01}/documents.parquet' order by w"
            ).fetchall()
        ])
        p = None
        langs = rng.choice(
            ["en", "zh", "es", "fr", "de"], size=n_docs,
            p=[0.412, 0.151, 0.149, 0.148, 0.140],
        )

    n_tokens = rng.integers(8, 101, size=n_docs)
    total = int(n_tokens.sum())
    draws = rng.choice(len(vocab_arr), size=total, p=p)
    words = vocab_arr[draws]
    texts = []
    pos = 0
    for k in n_tokens:
        texts.append(" ".join(words[pos : pos + k].tolist()))
        pos += k

    n_dup = int(n_docs * 0.0016)
    dup_targets = rng.choice(n_docs, size=2 * n_dup, replace=False)
    dup_sources = rng.choice(n_docs, size=2 * n_dup)
    for i in range(n_dup):  # exact copies
        texts[dup_targets[i]] = texts[dup_sources[i]]
    for i in range(n_dup, 2 * n_dup):  # one-token edits
        w = texts[dup_sources[i]].split(" ")
        w[rng.integers(0, len(w))] = vocab_arr[rng.integers(0, len(vocab_arr))]
        texts[dup_targets[i]] = " ".join(w)

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": langs,
            "source": [f"src{i}" for i in rng.integers(0, 20, size=n_docs)],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        f"{out_dir}/documents.parquet",
    )


TPCH_QUERIES = [f"sql_frontend_q{i}" for i in range(1, 23)]

N_ORD, N_LI, N_CUST, N_SUPP, N_PART = 1_500_000, 6_000_000, 150_000, 10_000, 200_000

# --tpch10 (r10 VERDICT item 7): the join-heavy relational core's
# second scale decade — sf1 (6M lineitem) -> sf10 (60M lineitem), the
# four many-join TPC-H shapes plus the two custom join strategies.
TPCH10 = os.environ.get("SPARK_GRAFT_TPCH10_DIR", "/tmp/cuttlefish_tpch10")
TPCH10_QUERIES = [
    "sql_frontend_q5",
    "sql_frontend_q8",
    "sql_frontend_q9",
    "sql_frontend_q21",
    "asof_join",
    "range_join_bucketed",
]
EV10_N, EV10_USERS = 10_000_000, 150_000


def generate_tpch10() -> None:
    """10x generate_tpch (60M lineitem / 15M orders / 1.5M customer /
    100k supplier / 2M part, same marginals) + 10x the sf1 gate's
    events table (10M rows / 150k users, same marginals) under TPCH10.
    Fact tables are written in chunks through ParquetWriter so peak
    memory stays ~1 chunk, not the table."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    os.makedirs(TPCH10, exist_ok=True)
    n_ord, n_li = 10 * N_ORD, 10 * N_LI
    n_cust, n_supp, n_part = 10 * N_CUST, 10 * N_SUPP, 10 * N_PART

    d0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    d1 = np.datetime64("2001-08-01").astype("datetime64[us]").astype(np.int64)

    def ts(n):
        return rng.integers(d0, d1, size=n).astype("datetime64[us]")

    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]),
    }), f"{TPCH10}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }), f"{TPCH10}/nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
        "c_mktsegment": pa.array(rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
            n_cust)),
    }), f"{TPCH10}/customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
    }), f"{TPCH10}/supplier.parquet")
    adjs = ["small", "red", "blue", "hot", "old", "new", "big", "dim"]
    nouns = ["ring", "widget", "bolt", "gear", "gizmo", "cap", "cog", "pin"]
    names = [f"{a} {n}" for a in adjs for n in nouns]
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array(rng.choice(names, n_part)),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(rng.choice(
            ["MEDIUM", "STANDARD", "LARGE", "PROMO", "SMALL", "ECONOMY"], n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, n_part), 2)),
    }), f"{TPCH10}/part.parquet")

    def chunked(path: str, total: int, chunk: int, make):
        writer = None
        done = 0
        while done < total:
            n = min(chunk, total - done)
            t = make(done, n)
            if writer is None:
                writer = pq.ParquetWriter(path, t.schema)
            writer.write_table(t)
            done += n
        writer.close()

    def make_orders(start, n):
        return pa.table({
            "o_orderkey": pa.array(np.arange(start, start + n, dtype=np.int64)),
            "o_custkey": pa.array(rng.integers(0, n_cust, n)),
            "o_orderstatus": pa.array(rng.choice(["P", "O", "F"], n)),
            "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n), 2)),
            "o_orderdate": pa.array(ts(n)),
            "o_orderpriority": pa.array(rng.choice(
                ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
                n)),
        })

    chunked(f"{TPCH10}/orders.parquet", n_ord, 5_000_000, make_orders)

    def make_lineitem(start, n):
        qty = rng.integers(1, 51, n).astype(np.float64)
        return pa.table({
            "l_orderkey": pa.array(rng.integers(0, n_ord, n)),
            "l_partkey": pa.array(rng.integers(0, n_part, n)),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n)),
            "l_linenumber": pa.array(rng.integers(1, 8, n).astype(np.int32)),
            "l_quantity": pa.array(qty),
            "l_extendedprice": pa.array(np.round(qty * rng.uniform(900, 2100, n), 2)),
            "l_discount": pa.array(rng.integers(0, 11, n) / 100.0),
            "l_tax": pa.array(rng.integers(0, 9, n) / 100.0),
            "l_returnflag": pa.array(rng.choice(["N", "A", "R"], n)),
            "l_linestatus": pa.array(rng.choice(["O", "F"], n)),
            "l_shipdate": pa.array(ts(n)),
        })

    chunked(f"{TPCH10}/lineitem.parquet", n_li, 10_000_000, make_lineitem)

    t0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    t1 = np.datetime64("2024-01-31").astype("datetime64[us]").astype(np.int64)

    def make_events(start, n):
        ks = rng.integers(0, 100, n)
        return pa.table({
            "event_id": pa.array(np.arange(start, start + n, dtype=np.int64)),
            "ts": pa.array(rng.integers(t0, t1, n).astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, EV10_USERS, n)),
            "event_type": pa.array(rng.choice(
                ["signup", "purchase", "view", "click", "error"], n)),
            "value": pa.array(np.round(rng.uniform(0, 560, n), 2)),
            "props": pa.array([f'{{"k": {k}}}' for k in ks]),
        })

    chunked(f"{TPCH10}/events.parquet", EV10_N, 5_000_000, make_events)


def generate_tpch() -> None:
    """10x star schema with sf0.1's marginals (profiled empirically:
    keys serial from 0, FKs uniform, o_totalprice ~U(1e3, 5e5),
    extendedprice = quantity * U(900, 2100), discount 0..0.10 in cents,
    tax 0..0.08, dates independent-uniform 1995-01-01..2001-08-01 —
    the driver's l_shipdate is NOT correlated with o_orderdate;
    measured offsets span [-2399, +2496] days)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    os.makedirs(SF1, exist_ok=True)

    d0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    d1 = np.datetime64("2001-08-01").astype("datetime64[us]").astype(np.int64)

    def ts(n):
        return rng.integers(d0, d1, size=n).astype("datetime64[us]")

    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]),
    }), f"{SF1}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }), f"{SF1}/nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(N_CUST, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)]),
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, N_CUST), 2)),
        "c_mktsegment": pa.array(rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"], N_CUST)),
    }), f"{SF1}/customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(N_SUPP, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)]),
        "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, N_SUPP), 2)),
    }), f"{SF1}/supplier.parquet")
    adjs = ["small", "red", "blue", "hot", "old", "new", "big", "dim"]
    nouns = ["ring", "widget", "bolt", "gear", "gizmo", "cap", "cog", "pin"]
    names = [f"{a} {n}" for a in adjs for n in nouns]
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(N_PART, dtype=np.int64)),
        "p_name": pa.array(rng.choice(names, N_PART)),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, N_PART)]),
        "p_type": pa.array(rng.choice(
            ["MEDIUM", "STANDARD", "LARGE", "PROMO", "SMALL", "ECONOMY"], N_PART)),
        "p_size": pa.array(rng.integers(1, 51, N_PART).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, N_PART), 2)),
    }), f"{SF1}/part.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(N_ORD, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD)),
        "o_orderstatus": pa.array(rng.choice(["P", "O", "F"], N_ORD)),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, N_ORD), 2)),
        "o_orderdate": pa.array(ts(N_ORD)),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], N_ORD)),
    }), f"{SF1}/orders.parquet")
    qty = rng.integers(1, 51, N_LI).astype(np.float64)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(0, N_ORD, N_LI)),
        "l_partkey": pa.array(rng.integers(0, N_PART, N_LI)),
        "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LI)),
        "l_linenumber": pa.array(rng.integers(1, 8, N_LI).astype(np.int32)),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(np.round(qty * rng.uniform(900, 2100, N_LI), 2)),
        "l_discount": pa.array(rng.integers(0, 11, N_LI) / 100.0),
        "l_tax": pa.array(rng.integers(0, 9, N_LI) / 100.0),
        "l_returnflag": pa.array(rng.choice(["N", "A", "R"], N_LI)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], N_LI)),
        "l_shipdate": pa.array(ts(N_LI)),
    }), f"{SF1}/lineitem.parquet")


def main() -> int:
    from cuttlefish_spark.registry import load_all
    from cuttlefish_spark.session import get_spark

    spark = get_spark(
        "scale-stress", cpus=os.environ.get("SPARK_GRAFT_CPUS", 32)
    )
    tpch = "--tpch" in sys.argv
    tpch10 = "--tpch10" in sys.argv
    sf10 = "--sf10" in sys.argv
    sf10_zipf = "--sf10-zipf" in sys.argv
    band_exp = "--band-exp" in sys.argv
    skip_gen = "--skip-gen" in sys.argv

    if band_exp or "--e2e-stage3" in sys.argv:
        for d, n in ((ZIPF1, DOCS_N), (ZIPF10, 10 * DOCS_N)):
            if not (skip_gen and os.path.exists(f"{d}/documents.parquet")):
                generate_docs(d, n, zipf=True)
        if band_exp:
            band_exponent(spark)
        else:
            e2e_stage3_exponent(spark)
        return 0

    def need(path: str) -> bool:
        return not (skip_gen and os.path.exists(path))

    if sf10:
        if need(f"{SF1}/documents.parquet"):
            generate(spark)
        if need(f"{SF10}/documents.parquet"):
            generate_docs(SF10, 10 * DOCS_N, zipf=False)
        scale_pairs = [("sf1", SF1), ("sf10", SF10)]
        default_queries = SF10_QUERIES
    elif sf10_zipf:
        if need(f"{ZIPF1}/documents.parquet"):
            generate_docs(ZIPF1, DOCS_N, zipf=True)
        if need(f"{ZIPF10}/documents.parquet"):
            generate_docs(ZIPF10, 10 * DOCS_N, zipf=True)
        scale_pairs = [("zipf_sf1", ZIPF1), ("zipf_sf10", ZIPF10)]
        default_queries = SF10_ZIPF_QUERIES
    elif "--emb10" in sys.argv:
        if need(f"{SF1}/embeddings.parquet"):
            generate(spark)
        if need(f"{EMB10}/embeddings.parquet"):
            generate_emb10()
        scale_pairs = [("sf1", SF1), ("sf10", EMB10)]
        default_queries = EMB10_QUERIES
    elif tpch10:
        if need(f"{SF1}/lineitem.parquet"):
            generate_tpch()
        if need(f"{SF1}/events.parquet"):
            sys.exit(
                f"{SF1}/events.parquet missing — run "
                "scripts/sf1_oracle_gate.py first (it generates the 1M-row "
                "sf1 events table the asof/range decade compares against)"
            )
        if need(f"{TPCH10}/lineitem.parquet"):
            generate_tpch10()
        scale_pairs = [("sf1", SF1), ("sf10", TPCH10)]
        default_queries = TPCH10_QUERIES
    elif tpch:
        if need(f"{SF1}/lineitem.parquet"):
            generate_tpch()
        scale_pairs = [("sf0.1", SF01), ("sf1", SF1)]
        default_queries = TPCH_QUERIES
    else:
        if need(f"{SF1}/documents.parquet"):
            generate(spark)
        scale_pairs = [("sf0.1", SF01), ("sf1", SF1)]
        default_queries = QUERIES

    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    specs = load_all()
    # Prime the session so the FIRST measured query's RSS delta is not
    # polluted by one-time py4j/Arrow/driver allocations (ru_maxrss is
    # a lifetime peak; see the baseline-sampling comment below).
    spark.range(100_000).toPandas()
    results = {}
    (lo_label, _), (hi_label, _) = scale_pairs
    for name in only or default_queries:
        fn = specs[name].fn
        row = {}
        for label, sf_dir in scale_pairs:
            # Peak-RSS baseline must be read BEFORE the warm-up run:
            # ru_maxrss is a lifetime high-water mark, so sampling it
            # after an untimed run of the same query would mask any
            # driver materialization the query performs (the warm-up
            # would raise the peak first and the timed run could never
            # exceed it). Delta therefore covers warm-up + timed run —
            # a collect()-shaped regression shows up doubled, never
            # hidden.
            rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            fn(spark, sf_dir).count()  # cold: JIT/codegen/cache warm-up
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

        t_exp = math.log10(
            max(row[hi_label]["sec"], 1e-3) / max(row[lo_label]["sec"], 1e-3)
        )
        p_exp = math.log10(
            max(row[hi_label]["out_rows"], 1) / max(row[lo_label]["out_rows"], 1)
        )
        row["time_exp"] = round(t_exp, 2)
        row["pair_exp"] = round(p_exp, 2)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps({"summary": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
