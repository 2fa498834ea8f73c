"""The correctness gate, locally: every oracle-declared query must
match DuckDB exactly (row count, columns, values) on the same parquet;
rows-only queries must run and return a stable schema with >= 0 rows.
Mirrors the driver's CORRECTNESS harness over __spark_entry__.py.
"""

from __future__ import annotations

import pytest

from cuttlefish_spark.registry import load_all
from tests.oracle_harness import compare, run_oracle

SPECS = load_all()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, name):
    spec = SPECS[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(spec.oracle, sf_dir)
    compare(spark_pdf, oracle_pdf, name)


def test_every_query_has_an_oracle():
    """All declared queries carry a DuckDB oracle — the rows-only
    (weaker, count-and-schema-only) tier is empty and must stay so: a
    new query landing without an oracle fails here, not silently in
    the driver's weaker check."""
    assert ROWS_ONLY_NAMES == []


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_scalar_export_schema(spark, sf_dir, name):
    """Class-killing pin for the r3 map_functions driver failure: the
    driver canonicalizes results with a raw pandas sort_values, which
    throws `unhashable type: 'list'` on any array/map-typed column (and
    binary is untrustworthy across engines). Every oracle-checked query
    must therefore export only scalar top-level columns — arrays cross
    the boundary via array_join/to_json/element_at. Schema-only check:
    no job runs."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType

    df = SPECS[name].fn(spark, sf_dir)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, BinaryType))
    ]
    assert not bad, (
        f"{name} exports non-scalar top-level columns {bad}; the driver "
        "canonicalizer will crash on them — scalarize the export"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_dedup_clusters_chain_graph(spark, tmp_path):
    """Connected components on a CHAIN — the worst case for min-label
    propagation (the sf corpora form near-cliques, which converge in
    one round; a chain of diameter n forces the contracted-graph
    iteration to actually iterate). Docs 0..5 are built so each
    consecutive pair shares >0.7 token Jaccard but distant pairs do
    not: one component, canonical id 0. Doc 50 is disjoint: a
    singleton."""
    from cuttlefish_spark.registry import load_all

    base = [f"w{i}" for i in range(12)]
    rows = []
    # doc k uses tokens [2k, 2k+12): consecutive docs share 10/14 ≈ 0.71
    for k in range(6):
        toks = [f"t{j}" for j in range(2 * k, 2 * k + 12)]
        rows.append((k, " ".join(toks), "en", "chain", len(" ".join(toks))))
    rows.append((50, " ".join(base), "en", "solo", len(" ".join(base))))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "chainsf")
    df.write.parquet(sf_dir + "/documents.parquet")

    out = (
        load_all()["dedup_clusters"].fn(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (out.loc[0:5, "cluster_id"] == 0).all()
    assert out.loc[50, "cluster_id"] == 50
    assert out["is_canonical"].sum() == 2


def test_editdist_short_doc_band_recall(spark, tmp_path):
    """The r5 recall gap, closed r6: docs under 64 chars have
    overlapping prefix/suffix anchors, so ONE mid-doc edit changes both
    block keys and the pair escaped both anchor bands. The length-bucket
    third band must catch (a) a same-bucket short pair whose edit sits
    in the anchor overlap, and (b) an adjacent-bucket short pair whose
    lengths straddle a bucket boundary AND whose anchors both differ —
    and the output must still match the DuckDB oracle cell-exactly."""
    from cuttlefish_spark.registry import load_all

    a = "0123456789" * 4                      # 40 chars, bucket 2
    b = a[:20] + "x" + a[21:]                 # 1 edit at pos 20: inside
    # the 9..32 anchor overlap -> both blk_p and blk_s differ
    assert a[:32] != b[:32] and a[-32:] != b[-32:]
    c = "x" + "c" * 45 + "z"                  # 47 chars, bucket 2
    d = "y" + "c" * 47 + "w"                  # 49 chars, bucket 3
    assert c[:32] != d[:32] and c[-32:] != d[-32:]
    rows = [
        (1, a, "en", "s", len(a)),
        (2, b, "en", "s", len(b)),
        (3, c, "en", "s", len(c)),
        (4, d, "en", "s", len(d)),
    ]
    sf_dir = str(tmp_path / "edshort")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    spec = load_all()["editdist_near_dup"]
    out = spec.fn(spark, sf_dir).toPandas()
    pairs = set(zip(out["doc_id_a"], out["doc_id_b"]))
    assert (1, 2) in pairs, "same-bucket short near-dup missed"
    assert (3, 4) in pairs, "adjacent-bucket short near-dup missed"
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    compare(out, con.execute(spec.oracle).df(), "editdist_short_band")


def test_line_dedup_drops_boilerplate_chunks(spark, tmp_path):
    """A 10-token chunk occurring >= 3 times across the corpus must be
    dropped from EVERY doc (C4's boilerplate rule); chunks below the
    threshold survive, and docs reassemble from surviving chunks in
    order."""
    import hashlib

    from cuttlefish_spark.registry import load_all

    boiler = " ".join(f"b{i}" for i in range(10))  # shared by docs 0,1,2
    uniq = {k: " ".join(f"u{k}_{i}" for i in range(10)) for k in range(4)}
    rows = [
        (0, boiler + " " + uniq[0], "en", "s", 0),
        (1, boiler + " " + uniq[1], "en", "s", 0),
        (2, boiler + " " + uniq[2], "en", "s", 0),
        (3, uniq[3] + " " + uniq[0], "en", "s", 0),  # uniq[0] now occurs 2x: kept
    ]
    sf_dir = str(tmp_path / "linesf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    out = (
        load_all()["line_dedup"].fn(spark, sf_dir)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert (out["n_chunks"] == 2).all()
    # boilerplate chunk (3 occurrences) dropped everywhere; uniq chunks kept
    assert out.loc[0, "n_kept"] == 1
    assert out.loc[1, "n_kept"] == 1
    assert out.loc[2, "n_kept"] == 1
    assert out.loc[3, "n_kept"] == 2
    # doc 0 reassembles to exactly its unique chunk; doc 3 keeps order
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out.loc[0, "clean_hash"] == md5(uniq[0])
    assert out.loc[3, "clean_hash"] == md5(uniq[3] + " " + uniq[0])


def test_leakage_safe_split_keeps_dup_groups_together(spark, tmp_path):
    """Docs with identical token sets (any order/multiplicity) must all
    land in the SAME split; the assignment must equal hash60(rep)%100
    banding so it is reproducible."""
    from cuttlefish_spark.registry import load_all

    rows = [
        (10, "alpha beta gamma", "en", "s", 0),
        (11, "gamma beta alpha alpha", "en", "s", 0),  # same set as 10
        (12, "delta epsilon", "en", "s", 0),
        (13, "epsilon delta", "en", "s", 0),  # same set as 12
        (14, "zeta", "en", "s", 0),
        (15, "   ", "en", "s", 0),  # blank: own rep
    ]
    sf_dir = str(tmp_path / "splitsf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    out = (
        load_all()["leakage_safe_split"].fn(spark, sf_dir)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert out.loc[10, "rep_id"] == out.loc[11, "rep_id"] == 10
    assert out.loc[10, "split"] == out.loc[11, "split"]
    assert out.loc[12, "rep_id"] == out.loc[13, "rep_id"] == 12
    assert out.loc[12, "split"] == out.loc[13, "split"]
    assert out.loc[15, "rep_id"] == 15


def test_bpe_pair_counts_adjacent_bigrams(spark, tmp_path):
    """Pair counts must be ADJACENT character bigrams within words
    (never across the word boundary), with overlapping occurrences all
    counted — 'aaa' yields 'aa' twice — and single-char words yielding
    nothing. Ties in n_occ break by pair text ascending."""
    from cuttlefish_spark.registry import load_all

    rows = [
        (0, "aaa ab", "en", "s", 0),   # aa, aa, ab
        (1, "x AB", "en", "s", 0),     # lowercased: ab ; 'x' contributes none
        (2, "   ", "en", "s", 0),      # blank doc: no words
    ]
    sf_dir = str(tmp_path / "bpesf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    out = load_all()["bpe_pair_counts"].fn(spark, sf_dir).toPandas()
    assert list(out["pair"]) == ["aa", "ab"]
    assert list(out["n_occ"]) == [2, 2]  # ab from doc 0 + doc 1
    assert list(out["share"]) == [0.5, 0.5]


def test_embedding_quantize_grid_error(spark, tmp_path):
    """Calibration is per-dimension over the whole corpus; a constant
    dimension gets scale 0 and exact reconstruction; a two-point
    dimension quantizes exactly (min and max are both on the grid); an
    interior value's error is its distance to the nearest of the 256
    grid levels."""
    from cuttlefish_spark.registry import load_all

    rows = [
        (0, [0.0, 7.5], 0),
        (1, [255.0, 7.5], 0),
        (2, [128.0, 7.5], 0),  # dim1 grid step 1.0 -> err |128-128| = 0
        (3, [0.4, 7.5], 0),    # nearest level 0.0 -> err 0.4
    ]
    sf_dir = str(tmp_path / "qsf")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(sf_dir + "/embeddings.parquet")

    out = (
        load_all()["embedding_quantize"].fn(spark, sf_dir)
        .toPandas().set_index("dim").sort_index()
    )
    d1 = out.loc[1]
    assert d1["dim_min"] == 0.0 and d1["dim_max"] == 255.0 and d1["scale"] == 1.0
    assert d1["mae"] == round(0.4 / 4, 6)
    d2 = out.loc[2]
    assert d2["scale"] == 0.0 and d2["mae"] == 0.0


def test_doc_chunking_windows_and_tail(spark, tmp_path):
    """A 100-token doc on (W=64, S=48) yields exactly two chunks —
    [0,64) and the tail [48,100) — never a third fully-contained
    stub; a doc at or under one window stays whole; a blank doc emits
    nothing."""
    from cuttlefish_spark.registry import load_all

    long_toks = [f"w{i}" for i in range(100)]
    rows = [
        (0, " ".join(long_toks), "en", "s", 0),
        (1, "a b c", "en", "s", 0),
        (2, "  ", "en", "s", 0),
    ]
    sf_dir = str(tmp_path / "chunksf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    out = load_all()["doc_chunking"].fn(spark, sf_dir).toPandas()
    d0 = out[out.doc_id == 0].sort_values("chunk_id")
    assert list(d0["chunk_id"]) == [0, 1]
    assert list(d0["chunk_start"]) == [0, 48]
    assert list(d0["n_chunk_tok"]) == [64, 52]
    d1 = out[out.doc_id == 1]
    assert len(d1) == 1 and d1.iloc[0]["n_chunk_tok"] == 3
    assert (out.doc_id == 2).sum() == 0


def test_quality_filter_funnel_ordered_gates(spark, tmp_path):
    """Gates apply IN ORDER: a doc failing an early gate is not
    re-counted at later gates; each row's n_in equals the previous
    row's n_out."""
    from cuttlefish_spark.registry import load_all

    rows = [
        (0, "the quick brown fox jumps", "en", "s", 0),       # passes all
        (1, " ", "en", "s", 0),                               # fails non_blank
        (2, "one two", "en", "s", 0),                         # fails min_tokens
        (3, "a a a a a a a a a a", "en", "s", 0),             # fails distinct_ratio
        (4, "x" * 6000 + " y z w v", "en", "s", 0),           # fails max_chars
    ]
    sf_dir = str(tmp_path / "funnelsf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    out = (
        load_all()["quality_filter_funnel"].fn(spark, sf_dir)
        .toPandas().sort_values("gate_id").reset_index(drop=True)
    )
    assert list(out["gate"]) == [
        "non_blank", "min_tokens", "max_chars", "distinct_ratio", "chars_per_token"
    ]
    assert list(out["n_in"]) == [5, 4, 3, 2, 1]
    assert list(out["n_fail"]) == [1, 1, 1, 1, 0]
    # chained: every gate's intake is the previous gate's survivors
    assert list(out["n_in"])[1:] == list(out["n_out"])[:-1]


def test_prefix_dedup_short_docs_never_join_longer(spark, tmp_path):
    """Docs 0/1 share their first 32 tokens (differing tails) and must
    family together with rep 0; doc 2 is a 10-token doc that IS doc
    0's prefix but must NOT join the family (short docs key on their
    full token string); docs 3/4 are identical short docs and form
    their own family."""
    from cuttlefish_spark.registry import load_all

    head = " ".join(f"p{i}" for i in range(32))
    short = " ".join(f"p{i}" for i in range(10))
    rows = [
        (0, head + " tail-a tail-b", "en", "s", 0),
        (1, head + " other ending here", "en", "s", 0),
        (2, short, "en", "s", 0),
        (3, "dup dup-two dup-three", "en", "s", 0),
        (4, "dup dup-two dup-three", "en", "s", 0),
        (5, "unique words only here", "en", "s", 0),
    ]
    sf_dir = str(tmp_path / "prefixsf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    out = (
        load_all()["prefix_dedup"].fn(spark, sf_dir)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert sorted(out.index) == [0, 1, 3, 4]
    assert out.loc[0, "rep_id"] == 0 and out.loc[1, "rep_id"] == 0
    assert bool(out.loc[1, "is_dup"]) and not bool(out.loc[0, "is_dup"])
    assert out.loc[3, "rep_id"] == 3 and out.loc[4, "rep_id"] == 3
    assert (out["group_size"] == 2).all()


def test_skew_profile_counts_and_percentiles(spark, tmp_path):
    """Per-key stats over a crafted 5-row events table: user 1 owns 4
    rows and user 2 one row, so p50 interpolates to 2.5, the hot key's
    share is 0.8, and skew_ratio = max/mean = 1.6."""
    from datetime import datetime

    from cuttlefish_spark.registry import load_all

    ts = datetime(2024, 1, 1)
    rows = [
        (1, ts, 1, "x", 1.0, "{}"),
        (2, ts, 1, "x", 1.0, "{}"),
        (3, ts, 1, "x", 1.0, "{}"),
        (4, ts, 1, "y", 1.0, "{}"),
        (5, ts, 2, "y", 1.0, "{}"),
    ]
    sf_dir = str(tmp_path / "skewsf")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(sf_dir + "/events.parquet")

    out = (
        load_all()["skew_profile"].fn(spark, sf_dir)
        .toPandas().set_index("key_col")
    )
    u = out.loc["user_id"]
    assert u["n_rows"] == 5 and u["n_keys"] == 2
    assert u["mean_per_key"] == 2.5 and u["p50_per_key"] == 2.5
    assert u["max_per_key"] == 4 and u["top_share"] == 0.8
    assert u["skew_ratio"] == 1.6
    t = out.loc["event_type"]
    assert t["max_per_key"] == 3 and t["top_share"] == 0.6 and t["skew_ratio"] == 1.2


def test_minhash_accuracy_identical_docs_calibrate_exactly(spark, tmp_path):
    """Three identical docs form 3 candidate pairs at estimate 1.0
    with exact Jaccard 1.0 and zero estimator error; unrelated docs
    with disjoint token sets never become candidates."""
    from cuttlefish_spark.registry import load_all

    same = "alpha beta gamma delta epsilon"
    rows = [
        (0, same, "en", "s", 0),
        (1, same, "en", "s", 0),
        (2, same, "en", "s", 0),
        (3, "zeta eta theta iota kappa", "en", "s", 0),
        (4, "completely different words here now", "en", "s", 0),
    ]
    sf_dir = str(tmp_path / "mhasf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    out = load_all()["minhash_accuracy"].fn(spark, sf_dir).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["est"] == 1.0 and r["n_pairs"] == 3
    assert r["mean_exact"] == 1.0 and r["mean_abs_err"] == 0.0
    assert r["n_true_07"] == 3


def test_incremental_rollup_merge_boundary_independent(spark, tmp_path):
    """The merged-partials rollup must equal a direct one-shot
    aggregation regardless of where the history/delta hash boundary
    falls — including a day whose rows land entirely in one batch."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from cuttlefish_spark.registry import load_all

    rows = [
        # event_id 13 falls in the delta batch (13 % 16 >= 13)
        (1, datetime(2024, 1, 1, 5), 1, "click", 1.25, "{}"),
        (13, datetime(2024, 1, 1, 6), 2, "click", 2.50, "{}"),
        (2, datetime(2024, 1, 2, 7), 1, "view", 0.75, "{}"),
        (30, datetime(2024, 1, 2, 8), 3, "view", -1.25, "{}"),
        (3, datetime(2024, 1, 3, 9), 1, "buy", 10.0, "{}"),
    ]
    sf_dir = str(tmp_path / "incsf")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(sf_dir + "/events.parquet")

    out = load_all()["incremental_rollup"].fn(spark, sf_dir)
    full = (
        spark.read.parquet(sf_dir + "/events.parquet")
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 1_000_000).cast("long")) / F.lit(1e6))
            .alias("total_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    a = out.toPandas().sort_values(["day", "event_type"]).reset_index(drop=True)
    b = full.toPandas().sort_values(["day", "event_type"]).reset_index(drop=True)
    assert a.equals(b[a.columns])


def test_substring_dedup_span_coverage(spark, tmp_path):
    """Stride-1 repeated-window detection with interval-union token
    coverage: two docs share a 10-token run at DIFFERENT offsets (the
    alignment the stride-W chunk grid misses); overlapping duplicated
    windows must not double-count covered tokens; a doc with no
    repeated window reports zero; a doc shorter than the window width
    emits no windows at all."""
    from cuttlefish_spark.registry import load_all

    run = " ".join(f"r{i}" for i in range(10))  # 10-token shared run
    pre = " ".join(f"p{i}" for i in range(3))  # doc1-only prefix (offset shift)
    u0 = " ".join(f"a{i}" for i in range(6))
    u1 = " ".join(f"b{i}" for i in range(5))
    rows = [
        (0, run + " " + u0, "en", "s", 0),  # run at offset 0
        (1, pre + " " + run + " " + u1, "en", "s", 0),  # run at offset 3
        (2, " ".join(f"c{i}" for i in range(12)), "en", "s", 0),  # unique
        (3, "x0 x1 x2", "en", "s", 0),  # shorter than W=8: no windows
    ]
    sf_dir = str(tmp_path / "sssf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    out = (
        load_all()["substring_dedup"].fn(spark, sf_dir)
        .toPandas().set_index("doc_id").sort_index()
    )
    # a 10-token run holds 3 duplicated 8-windows (starts 0,1,2 within
    # the run); interval union = min(8,1)+min(8,1)+8 = 10 tokens
    assert out.loc[0, "dup_windows"] == 3
    assert out.loc[0, "dup_tokens"] == 10
    assert out.loc[1, "dup_windows"] == 3
    assert out.loc[1, "dup_tokens"] == 10
    assert out.loc[0, "n_windows"] == 16 - 8 + 1
    assert out.loc[2, "dup_windows"] == 0 and out.loc[2, "dup_tokens"] == 0
    assert out.loc[3, "n_windows"] == 0 and out.loc[3, "dup_fraction"] == 0.0
    assert abs(out.loc[0, "dup_fraction"] - round(10 / 16, 6)) < 1e-9


def test_lm_bigram_score_hand_counts(spark, tmp_path):
    """Add-one-smoothed bigram LM on a corpus small enough to score by
    hand: P(w2|w1) = (B(w1 w2)+1)/(U(w1)+V), doc score = mean ln P over
    the doc's bigrams, ppl = exp(-mean). Single-token docs emit no
    row (no bigrams)."""
    import math

    from cuttlefish_spark.registry import load_all

    rows = [
        (0, "a b a b", "en", "s", 0),
        (1, "a b c", "en", "s", 0),
        (2, "z", "en", "s", 0),  # no bigrams -> no output row
    ]
    sf_dir = str(tmp_path / "lmsf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    out = (
        load_all()["lm_bigram_score"].fn(spark, sf_dir)
        .toPandas().set_index("doc_id").sort_index()
    )
    # corpus: U(a)=3 U(b)=3 U(c)=1 U(z)=1, V=4; B("a b")=3 B("b a")=1 B("b c")=1
    # Emulate the engines' rounding exactly: HALF_UP (Spark round /
    # DuckDB round are both half-away-from-zero; Python round() is
    # banker's and differs on exact .5 boundaries).
    from decimal import ROUND_HALF_UP, Decimal

    half_up = lambda x, nd: float(
        Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), rounding=ROUND_HALF_UP)
    )
    q = lambda x: half_up(x * 1e6, 0) / 1e6  # micro-nat quantization per bigram
    lp_ab = q(math.log((3 + 1) / (3 + 4)))
    lp_ba = q(math.log((1 + 1) / (3 + 4)))
    lp_bc = q(math.log((1 + 1) / (3 + 4)))
    assert list(out.index) == [0, 1]
    assert out.loc[0, "n_bigrams"] == 3 and out.loc[1, "n_bigrams"] == 2
    # the mean is emitted UNROUNDED (quotient of identical integers is
    # bit-identical cross-engine; a final round(,6) is not — see the
    # operator docstring); ppl rounds at 2 decimals
    exp0 = (2 * lp_ab + lp_ba) / 3
    exp1 = (lp_ab + lp_bc) / 2
    assert abs(out.loc[0, "avg_logprob"] - exp0) < 1e-12
    assert abs(out.loc[1, "avg_logprob"] - exp1) < 1e-12
    assert abs(out.loc[0, "ppl"] - half_up(math.exp(-exp0), 2)) < 1e-9


def test_semantic_dedup_earliest_neighbor_rule(spark, tmp_path):
    """Identical vectors share an LSH bucket; every later copy must be
    dropped by the EARLIEST copy (min vec_id), not by its nearest
    predecessor — pinning the order-independent anchor rule. A vector
    far from the cluster is kept."""
    from cuttlefish_spark.registry import load_all

    base = [(1.0 if i % 3 == 0 else -1.0) for i in range(64)]
    other = [(-1.0 if i % 2 == 0 else 1.0) for i in range(64)]
    rows = [
        (0, base, 0),
        (1, base, 0),
        (2, base, 0),
        (3, other, 1),
    ]
    sf_dir = str(tmp_path / "sdsf")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(sf_dir + "/embeddings.parquet")

    out = (
        load_all()["semantic_dedup"].fn(spark, sf_dir)
        .toPandas().set_index("vec_id").sort_index()
    )
    assert bool(out.loc[0, "is_kept"])
    assert not bool(out.loc[1, "is_kept"]) and out.loc[1, "dropped_by"] == 0.0
    assert not bool(out.loc[2, "is_kept"]) and out.loc[2, "dropped_by"] == 0.0
    import math

    if out.loc[3, "bucket"] != out.loc[0, "bucket"]:
        assert bool(out.loc[3, "is_kept"])
    else:  # same bucket is fine only if cosine is below tau
        dot = sum(a * b for a, b in zip(base, other))
        cos = dot / (math.sqrt(64) * math.sqrt(64))
        assert cos < 0.25 and bool(out.loc[3, "is_kept"])


def test_countmin_no_collision_equals_exact(spark, tmp_path):
    """With a 3-token vocabulary and 4x1024 cells there are no bucket
    collisions, so the count-min estimate must EQUAL the exact count
    (overcount == 0) — pinning the salted-bucket and min-of-rows
    plumbing; the estimate can never undercount by construction."""
    from cuttlefish_spark.registry import load_all

    rows = [
        (0, "a a a b", "en", "s", 0),
        (1, "a a b b c", "en", "s", 0),
    ]
    sf_dir = str(tmp_path / "cmsf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    out = (
        load_all()["countmin_heavy_hitters"].fn(spark, sf_dir)
        .toPandas().set_index("token").sort_index()
    )
    assert list(out.index) == ["a", "b", "c"]
    assert out.loc["a", "exact_cnt"] == 5
    assert out.loc["b", "exact_cnt"] == 3
    assert out.loc["c", "exact_cnt"] == 1
    assert (out["overcount"] == 0).all()
    assert (out["cm_est"] == out["exact_cnt"]).all()


def test_bpe_merge_application_greedy_runs(spark, tmp_path):
    """Pins the fold-vs-run-parity equivalence on the hard case: a
    merge whose left and right symbols are EQUAL (a, a), where match
    positions overlap and greedy left-to-right semantics require
    pairing runs of k consecutive a's into floor(k/2) merges at even
    offsets. The Spark side applies merges with a sequential
    F.aggregate fold; the oracle applies them with window-function run
    parity — this corpus forces both through the overlap logic, plus a
    multi-merge chain (the learned symbol participating in a later
    merge). Expected merges are hand-derived."""
    from cuttlefish_spark.registry import load_all

    # freq-weighted corpus: 'aaaa' x3 forces (a,a) as merge 1 with
    # greedy pairing [aa, aa]; 'aaab' tests the odd-run tail; 'aab'
    # exercises the learned 'aa' adjacent to 'b' for merge 2.
    rows = [
        (1, "aaaa aaaa aaaa aaab aab", "en", "s", 23),
        (2, "aaab aab ba", "en", "s", 11),
    ]
    sf_dir = str(tmp_path / "bpe")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    spec = load_all()["bpe_train_merges"]
    out = spec.fn(spark, sf_dir).toPandas().sort_values("step")
    got = list(
        zip(out["step"], out["left_sym"], out["right_sym"], out["pair_count"])
    )
    # Hand trace — word freqs: aaaa:3, aaab:2, aab:2, ba:1.
    # Round 1 pairs: (a,a): aaaa has 3 adjacent pairs x3=9, aaab 2x2=4,
    # aab 1x2=2 -> 15; (a,b): 2+2=4; (b,a): 1. Merge 1 = (a,a) @ 15.
    # Apply greedy: aaaa->[aa,aa], aaab->[aa,a,b], aab->[aa,b], ba->[b,a].
    # Round 2 pairs: (aa,aa):3, (aa,a):2, (a,b):2, (aa,b):2, (b,a):1.
    # Tie at 3? (aa,aa)=3 wins (others <=2). Merge 2 = (aa,aa) @ 3.
    # Apply: aaaa->[aaaa]; others unchanged.
    # Round 3 pairs: (aa,a):2, (a,b):2, (aa,b):2, (b,a):1 — three-way
    # tie at 2, lexicographic (l,r) order: ('a','b') < ('aa','a')?
    # 'a' < 'aa' so ('a','b') wins. Merge 3 = (a,b) @ 2.
    assert got[0] == (1, "a", "a", 15), got
    assert got[1] == (2, "aa", "aa", 3), got
    assert got[2] == (3, "a", "b", 2), got

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    compare(
        out.reset_index(drop=True), con.execute(spec.oracle).df(), "bpe_runs"
    )


def test_bradley_terry_zero_win_source_stays_finite(spark, tmp_path):
    """The degenerate input the 1e-9 iterate floor exists for: a
    source that LOSES every one of its matches. Even doc_ids carry
    source 'lo' with tiny n_chars, odd ids source 'hi' with huge
    n_chars; the circulant offsets (1, 3, 7) are all odd, so every
    match is lo-vs-hi and 'hi' always wins. Without the floor, round-1
    strength for 'lo' is 0 and round 2 divides n_ij / (0 + 0) — inf,
    where DuckDB errors casting to DECIMAL while Spark nulls it. With
    the floor both engines stay finite AND value-identical (compared
    here), 'lo' reports wins=0 with ~0 strength, and 'hi' absorbs the
    mass."""
    import duckdb

    from cuttlefish_spark.registry import load_all

    rows = [
        (i, "w " * 5, "en", ("lo" if i % 2 == 0 else "hi"),
         10 + i if i % 2 == 0 else 1000 + i)
        for i in range(12)
    ]
    sf_dir = str(tmp_path / "btdeg")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    spec = load_all()["bradley_terry_strength"]
    out = spec.fn(spark, sf_dir).toPandas()
    lo = out.set_index("source").loc["lo"]
    hi = out.set_index("source").loc["hi"]
    assert lo["wins"] == 0 and hi["wins"] == lo["n_matches"] == hi["n_matches"]
    assert lo["strength"] >= 0.0 and hi["strength"] > 1.0
    import numpy as np

    assert np.isfinite(out["strength"]).all()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    compare(out, con.execute(spec.oracle).df(), "bt_zero_win")


def test_wordpiece_encode_is_a_partition_of_the_corpus(spark, tmp_path):
    """Maximal-munch encoding must tile every word exactly: summed
    token_len x occurrences equals the corpus's total character count,
    and the trained multi-char merges actually appear in the encoding
    (the corpus is built so 'ba'/'na' dominate). Cross-engine value
    compare runs on the same crafted corpus, pinning the fold-vs-
    recursive-walk equivalence on repeated-substring words."""
    import duckdb

    from cuttlefish_spark.registry import load_all

    rows = [
        (1, "banana banana bandana nab", "en", "s", 25),
        (2, "banana nab nab", "en", "s", 14),
    ]
    sf_dir = str(tmp_path / "wpe")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(sf_dir + "/documents.parquet")

    spec = load_all()["wordpiece_encode_stats"]
    out = spec.fn(spark, sf_dir).toPandas()
    # total encoded chars == total word chars (weighted by frequency):
    # banana x3 (6) + bandana x1 (7) + nab x3 (3) = 18 + 7 + 9 = 34
    assert int((out["token_len"] * out["n_occurrences"]).sum()) == 34
    assert (out["token_len"] > 1).any(), "no multi-char token ever matched"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    compare(out, con.execute(spec.oracle).df(), "wpe_partition")
