"""Similarity-search behavior tests beyond the oracle: the IVF
approximate path must agree with the brute-force baseline on
membership quality, and probe scoring must be self-consistent."""

from __future__ import annotations

from cuttlefish_spark.registry import load_all

SPECS = load_all()


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    brute = SPECS["embedding_cosine_topk"].fn(spark, sf_dir).toPandas()
    ivf = SPECS["ann_ivf_topk"].fn(spark, sf_dir).toPandas()
    assert len(ivf) == 10
    # every IVF score must be <= the brute-force best (it searches a subset)
    assert ivf["cosine"].max() <= brute["cosine"].max() + 1e-9
    # nprobe=1 over 8 cells still recalls a meaningful share of the true top-10
    recall = len(set(ivf["vec_id"]) & set(brute["vec_id"])) / 10
    assert recall >= 0.2, f"IVF recall {recall} suspiciously low"


def test_topk_excludes_probe_and_sorted(spark, sf_dir):
    df = SPECS["embedding_cosine_topk"].fn(spark, sf_dir).toPandas()
    assert 0 not in set(df["vec_id"])
    assert list(df["cosine"]) == sorted(df["cosine"], reverse=True)


def test_pair_emitters_nonzero(spark, sf_dir):
    """Guard: every pair-emitting near-dup operator must find pairs at
    the test sf. Round 2 proved the data can change under the engine;
    an empty pair set hash-matches a broken oracle trivially, so
    emptiness here means the operator (or its candidate generation)
    silently stopped seeing the corpus."""
    import pyspark.sql.functions as F

    for name in [
        "minhash_shingles",
        "simhash_dedup",
        "ngram_jaccard",
        "embedding_near_dup",
        "editdist_near_dup",
    ]:
        assert SPECS[name].fn(spark, sf_dir).limit(1).count() > 0, f"{name} emitted 0 pairs"
    clusters = SPECS["dedup_clusters"].fn(spark, sf_dir)
    multi = clusters.groupBy("cluster_id").count().filter(F.col("count") > 1)
    assert multi.limit(1).count() > 0, "dedup_clusters produced only singletons"


def test_ivf_recall_audit_misses_cross_cell_neighbor(spark, tmp_path):
    """Probe 0's exact top-10 contains a vector that IVF's nprobe=1
    search cannot see (it sits in a different cell), so recall@10 must
    be exactly cell_hits/10 at nprobe=1 — and the SWEEP must show the
    gain: at nprobe=2 the second-nearest cell (cell 1, holding the
    cross-cell neighbor) enters the candidate set and recall rises.
    Pins that the audit measures the cell-pruning loss AND the
    multi-probe recovery, not just cell contents."""
    from cuttlefish_spark.registry import load_all

    def vec(**kv):
        v = [0.0] * 64
        for d, x in kv.items():
            v[int(d[1:])] = x
        return v

    rows = []
    for i in range(8):  # centroids: orthogonal axes
        rows.append((i, vec(**{f"d{i}": 8.0}), 0))
    for j, i in enumerate(range(8, 14)):  # six cell-0 members near v0
        rows.append((i, vec(d0=8.0, d8=0.1 + 0.01 * j), 0))
    # near v0 but leaning to axis 1 -> assigned to cell 1, invisible
    # to an nprobe=1 search from probe 0
    rows.append((14, vec(d0=7.0, d1=7.1), 0))
    sf_dir = str(tmp_path / "ivfsf")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(sf_dir + "/embeddings.parquet")

    out = (
        load_all()["ivf_recall_audit"].fn(spark, sf_dir)
        .toPandas().set_index(["probe_id", "nprobe"]).sort_index()
    )
    # 10 probes x 3 nprobe sweep points, no dropped grid rows
    assert len(out) == 30
    # nprobe=1: cell 0 holds exactly the six near members (probe
    # itself excluded); exact top-10 = {8..13, 14, 1, 2, 3}
    assert out.loc[(0, 1), "cand_size"] == 6
    assert out.loc[(0, 1), "n_hits"] == 6
    assert out.loc[(0, 1), "recall_at_10"] == 0.6
    # nprobe=2 adds cell 1 = {centroid 1, vec 14} -> both are exact
    # top-10 members: the sweep shows the multi-probe recall gain
    assert out.loc[(0, 2), "cand_size"] == 8
    assert out.loc[(0, 2), "n_hits"] == 8
    assert out.loc[(0, 2), "recall_at_10"] == 0.8
    # nprobe=4 adds cells 2,3 (centroids 2,3) -> full recall
    assert out.loc[(0, 4), "cand_size"] == 10
    assert out.loc[(0, 4), "recall_at_10"] == 1.0
    # probed_frac reports the measured scan cost (corpus N-1 = 14)
    assert out.loc[(0, 1), "probed_frac"] == 6 / 14
    # probes alone in their cell still report their recall-0 rows
    assert out.loc[(2, 1), "cand_size"] == 0
    assert out.loc[(2, 1), "n_hits"] == 0
    assert out.loc[(2, 1), "recall_at_10"] == 0.0


def test_editdist_second_pass_catches_early_edit(spark, tmp_path):
    """An in-place edit INSIDE the first 32 chars changes the prefix
    block, so pass 1 (lang, prefix32) cannot pair the docs; the pair
    must arrive via pass 2's (lang, suffix32) band. A control pair with
    a late edit (shared prefix, divergent suffix) checks pass 1 still
    works, and an unrelated doc must pair with neither."""
    from cuttlefish_spark.registry import load_all

    tail = " ".join(f"w{i:03d}" for i in range(40))  # 240 chars, shared
    head = "the quick brown fox jumps over"  # 30 chars, inside prefix32
    rows = [
        (1, f"{head} {tail}", "en", "fix", 0),
        # edit at char 4 ("quick" -> "quack"): prefix32 differs,
        # suffix32 identical -> only the suffix band pairs (1,2)
        (2, f"{head.replace('quick', 'quack')} {tail}", "en", "fix", 0),
        # edit near the end: prefix32 identical, suffix32 differs
        (3, f"{head} {tail.replace('w038', 'x038')}", "en", "fix", 0),
        # unrelated: neither band, and edit distance would fail anyway
        (4, "completely different document about other things entirely "
            + " ".join(f"z{i:03d}" for i in range(40)), "en", "fix", 0),
    ]
    sf_dir = str(tmp_path / "edsf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    out = load_all()["editdist_near_dup"].fn(spark, sf_dir).toPandas()
    pairs = set(zip(out["doc_id_a"], out["doc_id_b"]))
    assert (1, 2) in pairs, "early edit missed: suffix band (pass 2) not working"
    assert (1, 3) in pairs, "late edit missed: prefix band (pass 1) not working"
    # 2 vs 3 differ in BOTH head and tail -> share neither band; a
    # single-anchor blocker correctly never pays their DP cost
    assert (2, 3) not in pairs
    assert not any(4 in p for p in pairs)
    # union-dedup: each pair exactly once even if both bands emit it
    assert len(pairs) == len(out)


def test_pca_power_recovers_planted_direction(spark, tmp_path):
    """On a corpus WITH a dominant direction the 8-round fixed-point
    iterate must align with the true top eigenvector (the synthetic
    testdata embeddings are near-isotropic — eigengap ~1.02 — where
    NO 8-round power method separates; the oracle hash pins exactness
    there, this pins the semantics where they are observable). Also
    pins unit normalization of the emitted loadings."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    u = rng.normal(size=64)
    u /= np.linalg.norm(u)
    X = np.outer(rng.normal(size=400) * 3.0, u) + rng.normal(
        size=(400, 64)
    ) * 0.3
    tbl = pa.table(
        {
            "vec_id": pa.array(range(400), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in X],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * 400, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    from cuttlefish_spark.registry import load_all

    rows = (
        load_all()["embedding_pca_power"].fn(spark, str(tmp_path)).collect()
    )
    assert len(rows) == 64
    v = np.zeros(64)
    for r in rows:
        v[r["dim"]] = r["loading"]
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    assert abs(float(v @ u)) > 0.99


def test_abtt_projection_identities(spark, sf_dir):
    """Pythagoras in fixed point: |cos_top| <= 1 for every vector (the
    projection never exceeds the norm), one row per embedding, and on
    the planted-free corpus the mean |cos_top| is strictly between 0
    and 1 (the direction is neither degenerate nor universal)."""
    from cuttlefish_spark.io import load_table
    from cuttlefish_spark.registry import load_all

    rows = load_all()["embedding_abtt_projection"].fn(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n
    assert all(abs(r["cos_top"]) <= 1.0 + 1e-12 for r in rows)
    mean_abs = sum(abs(r["cos_top"]) for r in rows) / n
    assert 0.0 < mean_abs < 1.0


def test_knn_graph_invariants(spark, sf_dir):
    """k-NN-graph family invariants the oracle hash can't state as
    such: dense ranks 1..K per node with no self-edges in both rungs,
    NN-Descent dominance (candidate superset under the same total
    order => per-rank cosine never drops, and recall hits never
    drop), and brute-truth recall bounded in [0, 1e6] micro."""
    from collections import defaultdict

    from cuttlefish_spark.operators.similarity import _KNN_K
    from cuttlefish_spark.registry import load_all

    specs = load_all()
    base = specs["knn_graph_ivf"].fn(spark, sf_dir).collect()
    ref = specs["knn_graph_nndescent"].fn(spark, sf_dir).collect()
    for rows in (base, ref):
        per = defaultdict(list)
        for r in rows:
            assert r.vec_id != r.nbr_id
            per[r.vec_id].append(r.nn_rank)
        for ranks in per.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= _KNN_K
    bcos = {(r.vec_id, r.nn_rank): r.cosine for r in base}
    for r in ref:
        if (r.vec_id, r.nn_rank) in bcos:
            assert r.cosine >= bcos[(r.vec_id, r.nn_rank)]
    rec = {r.rung: r for r in specs["knn_graph_recall"].fn(spark, sf_dir).collect()}
    assert set(rec) == {"ivf_cell", "nndescent_r1"}
    assert rec["nndescent_r1"].hits >= rec["ivf_cell"].hits
    for r in rec.values():
        assert 0 <= r.recall_micro <= 1_000_000
        assert r.possible > 0 and 0 <= r.hits <= r.possible
    dd = specs["knn_graph_dedup"].fn(spark, sf_dir).collect()
    assert len(dd) == len({r.vec_id for r in dd})  # one verdict per vector
    clusters = {r.cluster_id for r in dd}
    canon = {r.vec_id for r in dd if r.is_canonical}
    assert canon == clusters  # exactly one canonical row per cluster
    assert all(r.cluster_id <= r.vec_id for r in dd)  # min-label contract


def test_incremental_knn_graph_invariants(spark, sf_dir):
    """Increment contract: adjacency rows exist ONLY for batch nodes
    (vec_id % 10 == 7 — the shared daily-batch split), ranks are dense
    1..K per node with no self-edges, and every batch node with at
    least one cellmate appears."""
    from collections import defaultdict

    from cuttlefish_spark.operators.similarity import _KNN_K
    from cuttlefish_spark.registry import load_all

    rows = load_all()["incremental_knn_graph"].fn(spark, sf_dir).collect()
    per = defaultdict(list)
    for r in rows:
        assert r.vec_id % 10 == 7
        assert r.vec_id != r.nbr_id
        per[r.vec_id].append(r.nn_rank)
    assert per, "batch side produced no adjacency"
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= _KNN_K
