"""Bucketed co-located joins: the write-once-shuffle-never pattern.

The join itself must plan with ZERO Exchange operators - both sides
read pre-bucketed on the join key - and produce the same result as the
plain shuffled join.
"""

from __future__ import annotations

from cuttlefish_spark.io import load_table, write_bucketed
from cuttlefish_spark.plans import checks


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", str(tmp_path / "li"), "l_orderkey", buckets=8)
    write_bucketed(o, "b_orders", str(tmp_path / "o"), "o_orderkey", buckets=8)
    try:
        bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
        # hint("merge") pins SortMergeJoin on both variants so the
        # comparison isolates bucketing (a broadcast would also show
        # zero shuffles, vacuously).
        joined = bl.hint("merge").join(bo, bl.l_orderkey == bo.o_orderkey)
        plan = checks.formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert checks.count_exchanges(joined) == 0  # co-located: no shuffle
        plain = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
        assert checks.count_exchanges(plain) == 2  # the shuffles bucketing saves
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
