"""Semantic tests for the r7 curation operators — the hash-level
oracle tests in test_oracle.py prove cross-engine parity; these pin the
BEHAVIOR the parity is supposed to deliver: the classifier actually
learns, the domain cap actually caps, the floor-division conventions
the fixed-point training depends on hold in both engines.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cuttlefish_spark.registry import load_all

SPECS = load_all()


def test_integer_division_conventions_pinned(spark):
    """The load-bearing arithmetic facts the fixed-point classifier is
    built on (see _qc_score/_qc_oracle): arithmetic right-shift is
    FLOOR division by a power of two in BOTH engines, while DuckDB's
    `//` TRUNCATES (unlike Python's floored `//`) — which is why the
    oracle spells the weight-update floordiv with the pmod identity.
    If either engine ever changes these, training parity breaks; this
    test makes the break readable instead of a hash mismatch."""
    duck = duckdb.sql(
        "SELECT CAST(-7 AS BIGINT) >> 1, -7 // 2,"
        " (-7 - ((-7 % 4) + 4) % 4) // 4"
    ).fetchone()
    assert duck[0] == -4  # >> floors
    assert duck[1] == -3  # // truncates (NOT Python semantics)
    assert duck[2] == -2 == -7 // 4  # pmod identity == Python floordiv
    row = spark.sql(
        "SELECT shiftright(-7L, 1) AS a, -7L div 2 AS b, pmod(-7, 4) AS c"
    ).collect()[0]
    assert row["a"] == -4  # shiftright floors, matches DuckDB >>
    assert row["b"] == -3  # div truncates — also never used for negatives
    assert row["c"] == 1


def test_quality_classifier_learns_above_majority():
    """The trained model must beat the majority-class baseline at the
    driver's correctness scale — otherwise it is an expensive constant.
    Uses the DuckDB oracle (bit-identical to the Spark training by the
    hash-level tests) so this runs without a Spark job."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT *"
        " FROM '/root/testdata/sf0.01/documents.parquet'"
    )
    import cuttlefish_spark.operators.curation as cur

    df = con.sql(cur._qc_oracle(cur._QC_T, cur._QC_SCORES_FINAL)).df()
    acc = (df.predicted == (df.y == 1)).mean()
    majority = max(df.y.mean(), 1 - df.y.mean())
    assert acc >= majority + 0.15, f"acc={acc:.3f} majority={majority:.3f}"
    assert acc >= 0.80  # measured 0.830; slack for corpus regeneration


def test_quality_classifier_weights_shape_and_convergence(spark, sf_dir):
    import cuttlefish_spark.operators.curation as cur

    w = SPECS["quality_classifier_weights"].fn(spark, sf_dir).toPandas()
    assert len(w) == cur._QC_D + 1
    assert set(w.bucket) == set(range(cur._QC_D + 1))
    # fixed-point consistency: weight == w_fixed / 2^20 exactly
    assert (w.weight == w.w_fixed / cur._QC_SCALE).all()
    # training moved the model (not the zero init)
    assert (w.w_fixed != 0).any()


def test_domain_cap_semantics(spark, sf_dir):
    df = SPECS["domain_cap_sample"].fn(spark, sf_dir).toPandas()
    assert len(df) > 0
    cap = df.cap_docs.iloc[0]
    assert (df.cap_docs == cap).all()  # one global cap
    under = df[~df.capped]
    # under-cap hosts keep EVERYTHING (the integer keep-test is a
    # tautology when n_docs <= cap — no branch needed, by construction)
    assert (under.n_kept == under.n_docs).all()
    assert (df.n_kept <= df.n_docs).all()
    over = df[df.capped]
    if len(over):
        # hash-binomial around the cap: the aggregate keep rate of
        # capped hosts must sit near cap/n, far below 1
        assert over.n_kept.sum() < over.n_docs.sum()


def test_url_host_profile_shares_and_ranks(spark, sf_dir):
    df = (
        SPECS["url_host_profile"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("size_rank")
        .reset_index(drop=True)
    )
    assert df.doc_share.sum() == pytest.approx(1.0)
    assert list(df.size_rank) == list(range(1, len(df) + 1))
    # rank is by n_docs desc (ties broken by host asc)
    assert (df.n_docs.diff().dropna() <= 0).all()
    assert df.host.str.match(r"www\.h\d+\.example\.com").all()


def test_classifier_memo_trains_once(spark, sf_dir):
    """Both classifier queries and repeated calls reuse one training
    run per (session, corpus) — the memo key must hit."""
    import cuttlefish_spark.operators.curation as cur

    SPECS["quality_classifier_weights"].fn(spark, sf_dir).collect()
    n_keys = len(cur._QC_CACHE)
    SPECS["quality_classifier_ngram"].fn(spark, sf_dir).collect()
    assert len(cur._QC_CACHE) == n_keys


def test_pr_curve_monotone_and_consistent():
    """Raising the threshold can only shrink the predicted-positive
    set: tp and fp are non-increasing in k, tp+fn and fp+tn are
    constant (the class marginals), and recall is non-increasing.
    Computed via the DuckDB oracle (bit-identical to Spark by the
    hash-level tests) so this runs without a Spark job."""
    import cuttlefish_spark.operators.curation as cur

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT *"
        " FROM '/root/testdata/sf0.01/documents.parquet'"
    )
    sql = cur._QC_PR_SQL + cur._qc_oracle(cur._QC_T, cur._QC_PR_FINAL) + "\n)"
    df = con.sql(sql).df().sort_values("k").reset_index(drop=True)
    assert len(df) == 15
    assert (df.tp.diff().dropna() <= 0).all()
    assert (df.fp.diff().dropna() <= 0).all()
    assert df.tp.add(df.fn).nunique() == 1  # positives constant
    assert df.fp.add(df.tn).nunique() == 1  # negatives constant
    assert (df.recall_.diff().dropna() <= 1e-12).all()


def test_calibration_bins_partition_corpus():
    import cuttlefish_spark.operators.curation as cur

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT *"
        " FROM '/root/testdata/sf0.01/documents.parquet'"
    )
    df = con.sql(cur._qc_oracle(cur._QC_T, cur._QC_CALIB_FINAL)).df()
    assert df.n_docs.sum() == 500  # every doc in exactly one bin
    assert df.bin.between(0, 8).all()
    assert (df.mean_predicted >= 0).all() and (df.mean_predicted <= 1).all()
    assert (df.actual_rate >= 0).all() and (df.actual_rate <= 1).all()
    # bins are ordered in predicted probability by construction
    s = df.sort_values("bin")
    assert (s.mean_predicted.diff().dropna() > 0).all()


def test_bpe_token_stats_conserves_char_mass(spark, sf_dir):
    """Merging never creates or destroys characters: the encoded
    vocabulary's sum(n_occurrences * token_len) must equal the
    corpus's total word-character mass (freq-weighted), and every
    multi-char token must be exactly one of the learned merge
    outputs — tokens are only ever created by merges."""
    stats = SPECS["bpe_token_stats"].fn(spark, sf_dir)
    merges = SPECS["bpe_train_merges"].fn(spark, sf_dir)
    mass = stats.select(
        F.sum(F.col("n_occurrences") * F.col("token_len")).alias("m")
    ).collect()[0]["m"]
    from cuttlefish_spark.functions import tokens
    from cuttlefish_spark.io import load_table

    d = load_table(spark, sf_dir, "documents")
    expected = (
        d.select(F.explode(tokens(F.col("text"))).alias("w"))
        .select(F.sum(F.length("w")).alias("m"))
        .collect()[0]["m"]
    )
    assert mass == expected
    merged = {r["merged"] for r in merges.collect()}
    multi = {r["token"] for r in stats.filter(F.col("token_len") > 1).collect()}
    assert multi <= merged


def test_ccnet_buckets_partition_and_order(spark, sf_dir):
    """Per lang: the three buckets partition the scoreable docs into
    near-equal thirds (sizes within 1), and the score ranges are
    ordered head >= middle >= tail (ties only at the boundaries)."""
    rows = SPECS["ccnet_perplexity_buckets"].fn(spark, sf_dir).collect()
    by_lang: dict[str, dict[str, dict]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r.asDict()
    assert by_lang
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}, lang
        sizes = [b[k]["n_docs"] for k in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        assert b["head"]["min_lp_micro"] >= b["middle"]["max_lp_micro"]
        assert b["middle"]["min_lp_micro"] >= b["tail"]["max_lp_micro"]


def test_url_dedup_canonical_semantics(spark, sf_dir):
    """Canonical URLs carry none of the synthesized disguises (query,
    fragment, trailing slash, uppercase), every variant is accounted
    for exactly once, and the survivor really is the longest doc of
    its group (ties to smallest doc_id)."""
    from cuttlefish_spark.io import load_table

    out = SPECS["url_dedup_canonical"].fn(spark, sf_dir)
    rows = out.collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_variants"] for r in rows) == n_docs
    assert all(1 <= r["n_variants"] <= 3 for r in rows)
    for r in rows:
        cu = r["canonical_url"]
        assert "?" not in cu and "#" not in cu
        assert cu == cu.lower()
        assert not cu.endswith("/")
        assert r["n_dropped"] == r["n_variants"] - 1
    # Survivor rule, recomputed independently in Python at sf scale.
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    docs = {r["doc_id"]: r["n_chars"] for r in d.collect()}
    groups: dict[int, list[int]] = {}
    for did in docs:
        groups.setdefault(did // 3, []).append(did)
    survivors = {
        min(
            (g_did for g_did in g if docs[g_did] == max(docs[x] for x in g)),
        )
        for g in groups.values()
    }
    assert {r["kept_doc_id"] for r in rows} == survivors


def test_curation_funnel_monotone_and_consistent(spark, sf_dir):
    """Per source the funnel only shrinks; stage totals agree with the
    standalone operators the stages were lifted from (URL survivors ==
    url_dedup_canonical's group count); final shares sum to 1."""
    rows = SPECS["curation_funnel_e2e"].fn(spark, sf_dir).collect()
    for r in rows:
        assert (
            r["n_raw"] >= r["n_url_kept"] >= r["n_quality_kept"] >= r["n_final"]
        ), r
    n_groups = SPECS["url_dedup_canonical"].fn(spark, sf_dir).count()
    assert sum(r["n_url_kept"] for r in rows) == n_groups
    assert abs(sum(r["final_share"] for r in rows) - 1.0) < 1e-9
    assert sum(r["n_final"] for r in rows) > 0


def test_bpe_fertility_bounds(spark, sf_dir):
    """Fertility is bounded by construction: at least 1 token per word
    (merges only shrink, never below one symbol) and at most the
    word's character count; token volume conserves accordingly."""
    rows = SPECS["bpe_fertility_by_source"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_words"] <= r["n_tokens"], r
        assert 1.0 <= r["fertility"], r
        assert 0 <= r["n_unmerged_words"] <= r["n_words"], r


def test_host_pagerank_semantics(spark, sf_dir):
    """Rank floor: every host holds at least the teleport mass; hosts
    with in-links hold strictly more; zero-in-link hosts hold exactly
    the teleport floor; ranks are positive and the graph is non-empty."""
    rows = SPECS["host_pagerank"].fn(spark, sf_dir).collect()
    assert rows
    teleport = 1_000_000 * 15 // 100
    hosts = {r["host"] for r in rows}
    import re

    def links_of(h):
        i = int(re.search(r"www\.h(\d+)\.", h).group(1))
        return {(i * 31 + 17 * k + 7) % 100 for k in range(3)} - {i}

    has_inlink = set()
    for r in rows:
        for t in links_of(r["host"]):
            tgt = f"www.h{t}.example.com"
            if tgt in hosts:
                has_inlink.add(tgt)
    for r in rows:
        if r["host"] in has_inlink:
            assert r["rank_fixed"] > teleport, r
        else:
            assert r["rank_fixed"] == teleport, r


def test_pretrain_e2e_funnel_monotone(spark, sf_dir):
    """The capstone's per-source funnel must be monotone non-increasing
    across all seven gates, and the packing/shuffle stats must be
    consistent with the final survivor set (windows exist exactly when
    tokens exist; the shuffle position-sum covers every final doc)."""
    from cuttlefish_spark.registry import load_all

    rows = load_all()["pretrain_data_e2e"].fn(spark, sf_dir).collect()
    assert rows, "empty funnel output"
    chain = [
        "n_raw",
        "n_url_kept",
        "n_exact_kept",
        "n_neardup_kept",
        "n_c4_kept",
        "n_gopher_kept",
        "n_clf_kept",
        "n_mix_kept",
    ]
    total_final = sum(r["n_mix_kept"] for r in rows)
    total_pos = sum(r["shuffle_possum"] for r in rows)
    for r in rows:
        vals = [r[c] for c in chain]
        assert all(
            a >= b for a, b in zip(vals, vals[1:])
        ), f"non-monotone funnel for {r['source']}: {vals}"
        assert (r["packed_windows"] > 0) == (r["final_tokens"] > 0), r
        # every mixed-in doc contributes >= PACK-able tokens downstream
        assert (r["n_mix_kept"] > 0) == (r["final_tokens"] > 0), r
    # shuffle positions are a permutation 1..k within each shard, so the
    # global position-sum equals the sum over shards of k_s*(k_s+1)/2 —
    # bounded by the unsharded worst case and at least the sharded best;
    # cheap sanity: every final doc got exactly one position.
    assert total_pos >= total_final, (total_pos, total_final)


def test_bpe_batched_dominance_rule():
    """The dominance batch rule must exclude BOTH chain hazards: a
    candidate whose component equals a higher-ranked pair's MERGED
    string (('ab','c') after ('a','b') -> 'ab' would chain-merge in a
    single fold pass), and plain symbol sharing. Pure-function check
    against the driver-side twin of the oracle's b{i}."""
    from cuttlefish_spark.operators.curation import _bpe_dominance_batch

    cand = [
        ("a", "b", 100),   # rank 1 -> selected; S = {a, b, ab}
        ("ab", "c", 90),   # component 'ab' == rank1's merged -> excluded
        ("c", "d", 80),    # shares 'c' with rank-2 CANDIDATE -> excluded
        #   (1-hop dominance blocks on any higher-ranked candidate,
        #   selected or not — the selection-independent rule both
        #   engines can state; greedy would have kept this one)
        ("x", "a", 70),    # shares 'a' with rank1 -> excluded
        ("e", "f", 60),    # disjoint from ALL higher candidates -> selected
        ("g", "cd", 50),   # 'cd' == rank-3 candidate's merged -> excluded
        ("h", "i", 40),    # selected
        ("j", "k", 30),    # selected (4th, fills _BPE_B_M = 4)
    ]
    batch = _bpe_dominance_batch(cand)
    assert batch == [
        ("a", "b", 100),
        ("e", "f", 60),
        ("h", "i", 40),
        ("j", "k", 30),
    ]


def test_bpe_batched_first_round_matches_sequential(spark, sf_dir):
    """Round 1's top-ranked batched merge must equal sequential BPE's
    first merge (both are the global pair-count argmax on the raw
    char-split corpus), and every round's batch must be pairwise
    disjoint across {l, r, l||r} — the invariant that makes the
    one-pass application chain-free."""
    from cuttlefish_spark.registry import load_all

    specs = load_all()
    batched = specs["bpe_train_merges_batched"].fn(spark, sf_dir).collect()
    seq_first = (
        specs["bpe_train_merges"].fn(spark, sf_dir)
        .orderBy("step").limit(1).collect()[0]
    )
    first = [r for r in batched if r["round"] == 1 and r["sel_rank"] == 1][0]
    assert (first["left_sym"], first["right_sym"]) == (
        seq_first["left_sym"], seq_first["right_sym"],
    )
    from collections import defaultdict

    by_round = defaultdict(list)
    for r in batched:
        by_round[r["round"]].append(r)
    for rnd, rows in by_round.items():
        sets = [
            {r["left_sym"], r["right_sym"], r["merged"]} for r in rows
        ]
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                assert not (sets[i] & sets[j]), (rnd, sets[i], sets[j])


def test_gopher_repetition_hand_computed(spark, tmp_path):
    """Pin gopher_repetition_rules' signal semantics on hand-computed
    docs: top-2-gram char fraction and dup-5-gram coverage on a
    repeating token stream, dup line/para fractions on repeated
    structures (the oracle hash can't explain WHY a value is right;
    this does)."""
    from cuttlefish_spark.registry import load_all

    rows = [
        # tokens a b c a b c a b: top 2-gram a_b count 3, char len 2,
        # tok_chars 8 -> top2 frac 6/8; 5-gram windows (starts 1..4)
        # have window1 == window4 -> starts {1,4} cover positions 1..8
        # -> dup5 frac 1.0
        (0, "a b c a b c a b", "en", "s", 15),
        # 4 lines, 'x' twice: 1 dup occurrence / 4 lines; chars 1/4
        (1, "x\ny\nx\nz", "en", "s", 7),
        # 3 paragraphs, 'p' twice -> dup_para_frac 1/3
        (2, "p\n\nq\n\np", "en", "s", 7),
        # no repetition at all -> every signal 0, keep = true
        (3, "one two three four five", "en", "s", 23),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "grsf")
    df.write.parquet(d + "/documents.parquet")
    out = (
        load_all()["gopher_repetition_rules"].fn(spark, d)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert abs(out.loc[0, "top2gram_char_frac"] - 6 / 8) < 1e-9
    assert abs(out.loc[0, "dup5gram_char_frac"] - 1.0) < 1e-9
    assert abs(out.loc[1, "dup_line_frac"] - 0.25) < 1e-9
    assert abs(out.loc[1, "dup_line_char_frac"] - 0.25) < 1e-9
    assert abs(out.loc[2, "dup_para_frac"] - 1 / 3) < 1e-9
    assert out.loc[3, ["dup_line_frac", "dup_para_frac",
                       "dup5gram_char_frac", "dup10gram_char_frac",
                       "top2gram_char_frac"]].eq(0.0).all()
    assert bool(out.loc[3, "keep"])
    assert not bool(out.loc[0, "keep"])  # 0.75 top2 + full dup5 coverage


def test_bestfit_packing_invariants(spark, sf_dir):
    """sequence_packing_bestfit's contract: ZERO split docs, no bin
    overflow, and a bin count sandwiched between the lower bound
    (concat's ceil(tokens/W)) and the trivial upper bound (one bin per
    doc)."""
    from cuttlefish_spark.operators.text import PACK_WINDOW
    from cuttlefish_spark.registry import load_all

    out = load_all()["sequence_packing_bestfit"].fn(spark, sf_dir).toPandas()
    assert (out["n_split_docs"] == 0).all()
    assert (out["max_bin_fill"] <= PACK_WINDOW).all()
    assert (out["n_bins"] >= out["n_bins_concat"]).all()
    assert (out["n_bins"] <= out["n_docs"]).all()
    assert (out["util_delta"] >= 0).all()


def test_unimax_waterfill_invariants(spark, sf_dir):
    """UniMax allocation invariants the oracle hash can't state as
    such: total allocation equals the 3/4-corpus budget exactly (the
    waterfill never strands budget while an uncapped language
    remains), no language exceeds its 1-epoch cap, and capped
    languages are exactly those at alloc == cap."""
    from cuttlefish_spark.registry import load_all

    out = load_all()["unimax_mixture"].fn(spark, sf_dir).collect()
    total = sum(r.lang_tokens for r in out)
    budget = (3 * total) // 4
    assert sum(r.alloc_tokens for r in out) == budget
    for r in out:
        assert r.alloc_tokens <= r.cap_tokens
        assert r.is_capped == (r.alloc_tokens == r.cap_tokens)
        assert 0 <= r.n_kept_docs <= r.n_docs


def test_length_curriculum_invariants(spark, sf_dir):
    """Curriculum contract the oracle hash can't state as such: stages
    are balanced quartiles (sizes differ by at most 1), token counts
    are monotone across stage boundaries (max n_tok of stage k <= min
    n_tok of stage k+1 — rank order is (n_tok, doc_id)), and positions
    are dense 1..count within every (stage, shard)."""
    from collections import defaultdict

    from cuttlefish_spark.operators.curation import _CUR_SHARDS, _CUR_STAGES
    from cuttlefish_spark.registry import load_all

    out = load_all()["length_curriculum_order"].fn(spark, sf_dir).collect()
    sizes = defaultdict(int)
    toks = defaultdict(list)
    pos = defaultdict(list)
    for r in out:
        assert 0 <= r.stage < _CUR_STAGES
        assert 0 <= r.shard < _CUR_SHARDS
        sizes[r.stage] += 1
        toks[r.stage].append(r.n_tok)
        pos[(r.stage, r.shard)].append(r.pos)
    assert max(sizes.values()) - min(sizes.values()) <= 1
    for k in range(_CUR_STAGES - 1):
        assert max(toks[k]) <= min(toks[k + 1])
    for ps in pos.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
