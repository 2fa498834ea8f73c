"""Incremental-aggregation proof: the mergeable-state claim the
operator docstrings lean on (DECIMAL partial sums, mergeable moments)
demonstrated end-to-end — partial aggregates computed over disjoint
batches, merged, and asserted EXACTLY equal to the one-shot aggregate.
This is the algebra behind materialized-view maintenance and
foreachBatch incremental sinks: if agg(A ∪ B) == merge(agg(A), agg(B))
holds exactly, a 100 TB table never needs reaggregating from scratch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cuttlefish_spark.functions import hash60
from cuttlefish_spark.io import load_table


def _partial(df):
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
    )


def test_partial_merge_equals_full(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    batch = hash60(F.col("event_id").cast("string")) % 2
    a = _partial(ev.filter(batch == 0))
    b = _partial(ev.filter(batch == 1))
    merged = (
        a.unionByName(b)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    full = _partial(ev).toPandas().set_index("event_type").sort_index()
    # exact equality — decimal partials are order- and batch-independent
    assert (merged["n"] == full["n"]).all()
    assert (merged["s"] == full["s"]).all()
