"""Preference-data operators — the aggregation step of an RLHF /
human-feedback pipeline: turn raw pairwise comparisons into per-item
strength scores.

- bradley_terry_strength — Bradley-Terry maximum-likelihood strengths
  via the MM (minorization-maximization) algorithm of Hunter 2004
  ("MM algorithms for generalized Bradley-Terry models"), the standard
  estimator behind Chatbot-Arena-style model rankings and preference-
  model calibration checks.

Reference anchor: none — the reference (a Racket ETL orchestrator) has
no statistical operators; this is Layer-B/LLM surface mandated by the
build brief (SURVEY.md §2.B).

Determinism contract (the oracle-parity discipline used across the
repo): comparison outcomes are exact integer/length comparisons; every
cross-term sum folds ROUND(x, 9) values through DECIMAL(28,9) so the
sum is order-independent; iteration outputs are re-rounded to 9 before
they feed the next round, so Spark and DuckDB walk bit-identical
trajectories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuttlefish_spark.functions import hash60
from cuttlefish_spark.io import load_table
from cuttlefish_spark.registry import query

# Circulant pairing offsets: doc i is compared with docs i+1, i+3, i+7.
# With sources assigned round-robin (source = f(doc_id mod S)) this
# yields a connected comparison graph over sources (offsets coprime to
# the source period), and the pairing is THREE narrow equi-joins — no
# window, no cross join, no shuffle beyond the join keys.
_BT_OFFSETS = (1, 3, 7)
_BT_ITERS = 3

_OFFS_SQL = "SELECT unnest([" + ", ".join(str(o) for o in _BT_OFFSETS) + "]) AS off"


def _bt_oracle() -> str:
    """Unrolled MM iterations as CTEs (the embedding_kmeans pattern:
    an iterative estimator becomes oracle-checkable by fixing init,
    iteration count, and float-parity arithmetic)."""
    # m PROJECTS the join key (a.doc_id + off) before the join and is
    # MATERIALIZED: joining on the raw expression planned as a nested
    # loop (50k x 3 x 50k compares, ~96 s at sf1) and the un-
    # materialized CTE was re-inlined into each of pairs'/wins' four
    # UNION arms — 4 x 96 s was the REAL cost the r10 ADVICE item
    # attributed to the correlated denominator (measured: projected +
    # materialized form evaluates in ~0.1 s).
    ctes = [
        f"""m AS MATERIALIZED (
        SELECT x.sa, b.source AS sb,
               CASE WHEN x.ca > b.n_chars THEN x.sa
                    ELSE b.source END AS winner
        FROM (SELECT a.doc_id + o.off AS idb, a.source AS sa,
                     a.n_chars AS ca
              FROM documents a JOIN ({_OFFS_SQL}) o ON TRUE) x
        JOIN documents b ON b.doc_id = x.idb
        WHERE x.ca <> b.n_chars AND x.sa <> b.source
    )""",
        """pairs AS (
        SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n_ij FROM (
            SELECT sa AS i, sb AS j FROM m
            UNION ALL
            SELECT sb AS i, sa AS j FROM m
        ) GROUP BY i, j
    )""",
        """wins AS (
        SELECT i, CAST(SUM(w) AS BIGINT) AS w FROM (
            SELECT sa AS i, CASE WHEN winner = sa THEN 1 ELSE 0 END AS w FROM m
            UNION ALL
            SELECT sb AS i, CASE WHEN winner = sb THEN 1 ELSE 0 END AS w FROM m
        ) GROUP BY i
    )""",
        "s0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS p FROM wins)",
    ]
    # Denominator as a plain join + GROUP BY per iteration, NOT a
    # correlated scalar subquery per item: the correlated form re-scans
    # pairs x s{it} once per wins row, which dominated the sf1 oracle
    # gate (measured 440 s for this one query vs ~3 s Spark — r10
    # ADVICE). The grouped join preserves the DECIMAL(28,9)
    # order-independent sum, so the value hash is unchanged.
    for it in range(_BT_ITERS):
        ctes.append(f"""den{it} AS (
        SELECT p.i,
               SUM(CAST(round(p.n_ij / (si.p + sj.p), 9)
                        AS DECIMAL(28,9))) AS den
        FROM pairs p
        JOIN s{it} si ON si.i = p.i
        JOIN s{it} sj ON sj.i = p.j
        GROUP BY p.i
    )""")
        ctes.append(f"""s{it + 1} AS (
        SELECT w.i,
               greatest(round(w.w / CAST(d.den AS DOUBLE), 9),
                        0.000000001) AS p
        FROM wins w JOIN den{it} d ON d.i = w.i
    )""")
    return (
        "WITH " + ",\n    ".join(ctes) + f""",
    tot AS (
        SELECT CAST(SUM(CAST(p AS DECIMAL(28,9))) AS DOUBLE) AS t,
               COUNT(*) AS n_items
        FROM s{_BT_ITERS}
    ),
    nm AS (SELECT i, CAST(SUM(n_ij) AS BIGINT) AS n_matches
           FROM pairs GROUP BY i)
    SELECT s.i AS source,
           nm.n_matches,
           w.w AS wins,
           round(s.p * tot.n_items / tot.t, 6) AS strength
    FROM s{_BT_ITERS} s
    JOIN wins w ON w.i = s.i
    JOIN nm ON nm.i = s.i
    CROSS JOIN tot"""
    )


def _match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared circulant match builder: (ida, idb, sa, sb, ca, cb)
    for every doc-vs-doc comparison, ties and same-source pairs
    dropped. Three narrow equi-joins on doc_id — see bradley_terry's
    docstring for the connectivity argument."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    offs = F.explode(F.array(*[F.lit(o) for o in _BT_OFFSETS])).alias("off")
    left = d.select(
        F.col("doc_id").alias("ida"),
        F.col("source").alias("sa"),
        F.col("n_chars").alias("ca"),
        offs,
    )
    right = d.select(
        F.col("doc_id").alias("idb"),
        F.col("source").alias("sb"),
        F.col("n_chars").alias("cb"),
    )
    return (
        left.join(right, F.col("ida") + F.col("off") == F.col("idb"))
        .filter((F.col("ca") != F.col("cb")) & (F.col("sa") != F.col("sb")))
        .drop("off")
    )


@query("bradley_terry_strength", layer="C", oracle=_bt_oracle())
def bradley_terry_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths over pairwise document preferences —
    the aggregation a preference/RLHF pipeline runs to turn raw A-vs-B
    judgments into item scores (Hunter 2004 MM updates; the estimator
    behind arena-style LLM leaderboards).

    Comparisons are synthesized deterministically: doc i meets docs
    i+1/i+3/i+7 (three equi-joins on doc_id — circulant offsets keep
    the source graph connected), the longer document wins, ties and
    same-source pairs are dropped. Items are the 20 sources, so the
    model state is O(items) while the match volume scales with the
    corpus.

    MM iteration (x{_BT_ITERS}, unrolled as one static DAG like
    embedding_kmeans): p_i <- W_i / sum_j n_ij / (p_i + p_j), with the
    cross-term sum folded through ROUND(.,9) + DECIMAL(28,9) so it is
    order-independent, and each iterate re-rounded to 9 — Spark and the
    oracle walk identical float trajectories. Final strengths are
    normalized to mean 1 and rounded to 6.

    Scale shape: the match builder is three shuffle-free-ish equi-joins
    on doc_id; per-iteration work is a join of the O(items^2) pair
    table against the O(items) strength table — the heavy corpus pass
    happens ONCE to build (pairs, wins); iterations never rescan it.
    At 100 TB the pair/win manifest is the persisted artifact and the
    MM loop costs nothing.
    """
    m = _match_pairs(spark, sf_dir).select(
        "sa",
        "sb",
        F.when(F.col("ca") > F.col("cb"), F.col("sa"))
        .otherwise(F.col("sb"))
        .alias("winner"),
    )
    directed = m.select(
        F.col("sa").alias("i"),
        F.col("sb").alias("j"),
        (F.col("winner") == F.col("sa")).cast("long").alias("w"),
    ).unionByName(
        m.select(
            F.col("sb").alias("i"),
            F.col("sa").alias("j"),
            (F.col("winner") == F.col("sb")).cast("long").alias("w"),
        )
    )
    # The match stream collapses ONCE to the O(items^2)/O(items)
    # pair/win manifests; localCheckpoint pins them (and each iterate)
    # so the unrolled MM rounds reference a flat 20-row input instead
    # of re-expanding the corpus subtree per round — the host_pagerank
    # lineage discipline (without it the 3-round plan carried 90
    # exchanges; with it, single digits).
    pairs = (
        directed.groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n_ij"))
        .localCheckpoint(eager=True)
    )
    wins = (
        directed.groupBy("i")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )

    s = wins.select("i", F.lit(1.0).alias("p"))
    for _ in range(_BT_ITERS):
        t = (
            pairs.join(s.select(F.col("i"), F.col("p").alias("pi")), "i")
            .join(
                s.select(F.col("i").alias("j"), F.col("p").alias("pj")),
                "j",
            )
            .select(
                "i",
                F.round(F.col("n_ij") / (F.col("pi") + F.col("pj")), 9)
                .cast("decimal(28,9)")
                .alias("term"),
            )
        )
        den = t.groupBy("i").agg(F.sum("term").alias("den"))
        s = (
            wins.join(den, "i")
            .select(
                "i",
                # floor at 1e-9: a zero-win item would otherwise hit
                # p=0 and a later n_ij/(0+0) division — inf, which the
                # engines disagree on (DuckDB errors casting inf to
                # DECIMAL, Spark nulls it). The floor keeps the
                # degenerate case finite and engine-identical.
                F.greatest(
                    F.round(F.col("w") / F.col("den").cast("double"), 9),
                    F.lit(1e-9),
                ).alias("p"),
            )
            .localCheckpoint(eager=True)
        )

    tot = s.agg(
        F.sum(F.col("p").cast("decimal(28,9)")).cast("double").alias("t"),
        F.count(F.lit(1)).alias("n_items"),
    )
    n_matches = pairs.groupBy("i").agg(F.sum("n_ij").alias("n_matches"))
    return (
        s.join(wins, "i")
        .join(n_matches, "i")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("i").alias("source"),
            F.col("n_matches").cast("long").alias("n_matches"),
            F.col("w").cast("long").alias("wins"),
            F.round(F.col("p") * F.col("n_items") / F.col("t"), 6).alias("strength"),
        )
    )


_DPO_MIN_MARGIN = 40  # drop near-tie comparisons (label noise)
_DPO_SPLIT_MOD = 10
_DPO_TRAIN_SHARDS = 8  # hash % 10 < 8 -> train (80/20)

_DPO_ORACLE = f"""
    WITH m AS MATERIALIZED (
        SELECT x.ida, x.sa, x.ca,
               b.doc_id AS idb, b.source AS sb, b.n_chars AS cb
        FROM (SELECT a.doc_id AS ida, a.doc_id + o.off AS key_b,
                     a.source AS sa, a.n_chars AS ca
              FROM documents a JOIN ({_OFFS_SQL}) o ON TRUE) x
        JOIN documents b ON b.doc_id = x.key_b
        WHERE x.ca <> b.n_chars AND x.sa <> b.source
    ),
    pairs AS (
        SELECT CASE WHEN ca > cb THEN ida ELSE idb END AS chosen_id,
               CASE WHEN ca > cb THEN idb ELSE ida END AS rejected_id,
               CASE WHEN ca > cb THEN sa ELSE sb END AS chosen_source,
               CASE WHEN ca > cb THEN sb ELSE sa END AS rejected_source,
               abs(ca - cb) AS margin
        FROM m
        WHERE abs(ca - cb) >= {_DPO_MIN_MARGIN}
    )
    SELECT chosen_id, rejected_id, chosen_source, rejected_source,
           CAST(margin AS BIGINT) AS margin,
           CASE WHEN CAST('0x' || substr(md5(CAST(chosen_id AS VARCHAR)
                    || '#' || CAST(rejected_id AS VARCHAR)), 1, 15) AS BIGINT)
                    % {_DPO_SPLIT_MOD} < {_DPO_TRAIN_SHARDS}
                THEN 'train' ELSE 'val' END AS split
    FROM pairs
"""


@query("preference_pairs_dpo", layer="C", oracle=_DPO_ORACLE)
def preference_pairs_dpo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO training-pair materialization (Rafailov 2023, "Direct
    Preference Optimization") — the dataset-construction step between
    raw comparisons and preference-tuning: orient every match as
    (chosen, rejected) by the preference signal, drop near-ties below
    a {_DPO_MIN_MARGIN}-char margin (the standard label-noise filter —
    low-margin comparisons carry more annotator disagreement than
    signal), and assign a deterministic hash split (md5 of the pair
    identity, {_DPO_TRAIN_SHARDS}0/{_DPO_SPLIT_MOD - _DPO_TRAIN_SHARDS}0
    train/val) so the same pair lands in the same split on every
    engine, run, and cluster — the leakage_safe_split discipline
    applied at pair granularity.

    Shares _match_pairs with bradley_terry_strength (same circulant
    equi-join construction), so the two queries pin different
    CONSUMERS of one comparison stream: BT aggregates it to item
    strengths, this one materializes the per-pair artifact a DPO
    trainer reads. Everything is a narrow map over the match join —
    no shuffle beyond the pairing joins, no float anywhere.
    """
    m = _match_pairs(spark, sf_dir)
    ch = F.col("ca") > F.col("cb")
    pairs = m.select(
        F.when(ch, F.col("ida")).otherwise(F.col("idb")).alias("chosen_id"),
        F.when(ch, F.col("idb")).otherwise(F.col("ida")).alias("rejected_id"),
        F.when(ch, F.col("sa")).otherwise(F.col("sb")).alias("chosen_source"),
        F.when(ch, F.col("sb")).otherwise(F.col("sa")).alias("rejected_source"),
        F.abs(F.col("ca") - F.col("cb")).alias("margin"),
    ).filter(F.col("margin") >= _DPO_MIN_MARGIN)
    split_hash = hash60(
        F.concat(
            F.col("chosen_id").cast("string"),
            F.lit("#"),
            F.col("rejected_id").cast("string"),
        )
    )
    return pairs.select(
        "chosen_id",
        "rejected_id",
        "chosen_source",
        "rejected_source",
        F.col("margin").cast("long").alias("margin"),
        F.when(
            split_hash % _DPO_SPLIT_MOD < _DPO_TRAIN_SHARDS, F.lit("train")
        )
        .otherwise(F.lit("val"))
        .alias("split"),
    )


_BON_N = 8  # candidate pool size per prompt group

_BON_ORACLE = f"""
    WITH cand AS (
        SELECT doc_id // {_BON_N} AS prompt_id, doc_id,
               n_chars AS reward,
               n_chars * {_BON_N} + ({_BON_N} - 1 - doc_id % {_BON_N}) AS k
        FROM documents
    )
    SELECT prompt_id,
           CAST(count(*) AS BIGINT) AS n_candidates,
           max_by(doc_id, k) AS chosen_id,
           CAST(max(reward) AS BIGINT) AS chosen_reward,
           min(doc_id) AS ref_id,
           CAST(min_by(reward, doc_id) AS BIGINT) AS ref_reward,
           CAST(max(reward) - min_by(reward, doc_id) AS BIGINT) AS uplift
    FROM cand
    GROUP BY prompt_id
"""


@query("best_of_n_selection", layer="C", oracle=_BON_ORACLE)
def best_of_n_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n / rejection-sampling materialization — the third
    consumer of the preference layer (r10 VERDICT item 9; public
    recipe: Stiennon et al. 2020 / Nakano et al. 2021 best-of-n
    sampling, and the rejection-sampling fine-tuning round of Touvron
    et al. 2023 Llama 2): documents are grouped into prompts of
    {_BON_N} candidates (prompt_id = doc_id // {_BON_N} — the
    deterministic stand-in for n policy samples per prompt), the
    reward model is the same length signal bradley_terry_strength and
    preference_pairs_dpo rank on, and each prompt keeps its
    argmax-reward candidate — the per-prompt winning row IS the
    rejection-sampling SFT dataset. The reference-policy comparison
    rides along: ref = the group's first draw (min doc_id, "the
    sample you would have taken without best-of-n"), and `uplift` =
    chosen_reward - ref_reward is the standard BoN reward-gain
    statistic.

    Determinism: rewards are exact integers; the argmax is a single
    max_by on the packed key reward * {_BON_N} + ({_BON_N}-1 -
    doc_id % {_BON_N}) — group members have distinct doc_id mod
    {_BON_N}, so keys never tie and equal rewards break to the
    SMALLEST doc_id in both engines identically. No floats anywhere.

    Scale shape: ONE groupBy over the corpus on a uniform
    high-cardinality key (n/{_BON_N} prompts), all aggregates
    map-side-partial (max/min/max_by/min_by/count) — a single
    shuffle; no window, no join. At 100 TB this is the cheapest query
    in the preference family and the one that runs every RLHF
    iteration."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cand = d.select(
        # Integral div (the oracle's `//`) — exact at any id magnitude,
        # unlike double-divide-then-truncate past 2^53.
        F.expr(f"doc_id div {_BON_N}").alias("prompt_id"),
        "doc_id",
        F.col("n_chars").alias("reward"),
        (
            F.col("n_chars") * _BON_N
            + (F.lit(_BON_N - 1) - F.col("doc_id") % _BON_N)
        ).alias("k"),
    )
    return cand.groupBy("prompt_id").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.expr("max_by(doc_id, k)").alias("chosen_id"),
        F.max("reward").cast("long").alias("chosen_reward"),
        F.min("doc_id").alias("ref_id"),
        F.expr("min_by(reward, doc_id)").cast("long").alias("ref_reward"),
        (F.max("reward") - F.expr("min_by(reward, doc_id)"))
        .cast("long")
        .alias("uplift"),
    )
