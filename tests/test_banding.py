"""Pins for the r11 LSH-banding knob and the perceptual-hash dedup:
invariants the oracle hash can't state directly (cross-QUERY identity
on planted dups, subset relations between bandings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cuttlefish_spark.registry import load_all

SPECS = load_all()


def test_banded_clusters_agree_on_exact_dups(spark, sf_dir):
    """Docs with IDENTICAL token sets must land in the same cluster
    under BOTH bandings — exact dups collapse via rep_id before any
    band join, so their cluster identity is banding-invariant (the
    docstring's claim, pinned)."""
    from cuttlefish_spark.operators.dedup import _token_signatures

    sig = _token_signatures(spark, sf_dir, with_rep=True).select(
        "doc_id", "rep_id"
    )
    base = SPECS["dedup_clusters"].fn(spark, sf_dir).select(
        "doc_id", F.col("cluster_id").alias("c_base")
    )
    banded = SPECS["dedup_clusters_banded"].fn(spark, sf_dir).select(
        "doc_id", F.col("cluster_id").alias("c_banded")
    )
    j = sig.join(base, "doc_id").join(banded, "doc_id")
    # each rep group maps into ONE cluster per query
    for col in ("c_base", "c_banded"):
        n_bad = (
            j.groupBy("rep_id")
            .agg(F.count_distinct(col).alias("k"))
            .filter(F.col("k") > 1)
            .count()
        )
        assert n_bad == 0, f"{col}: exact-dup group split across clusters"


def test_banded_candidates_are_subset(spark, sf_dir):
    """b=1,r=8 candidates must be a strict subset of b=2,r=2's: an
    8-window collision implies both 2-window band collisions (bands 1
    and 2 are sub-windows of the r=8 key)."""
    from cuttlefish_spark.operators.dedup import (
        _band_candidates,
        _token_signatures,
    )

    wide = _token_signatures(spark, sf_dir, wide=True)
    narrow = (
        _band_candidates(wide, payload=False, rows_per_band=2)
        .select("doc_a", "doc_b")
        .distinct()
    )
    tight = _band_candidates(wide, payload=False, rows_per_band=8).select(
        "doc_a", "doc_b"
    )
    missing = tight.join(narrow, ["doc_a", "doc_b"], "left_anti").count()
    assert missing == 0


def test_phash_planted_dups_cluster_together(spark, sf_dir):
    """The planted image-dup schedule (doc_id % 40 in (1, 2) copies the
    group base) must cluster: exact copies at Hamming 0, the perturbed
    near-dup within the Hamming <= 3 gate."""
    out = (
        SPECS["image_phash_dedup"]
        .fn(spark, sf_dir)
        .select("doc_id", "cluster_id")
        .toPandas()
        .set_index("doc_id")["cluster_id"]
        .to_dict()
    )
    for d, c in out.items():
        r = d % 40
        if r in (1, 2) and (d - r) in out:
            assert c == out[d - r], f"doc {d} not clustered with base {d - r}"
