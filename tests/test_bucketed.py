"""Bucketed-layout tests: the write-once-shuffle-never property that
matters for repeated fact⋈fact joins at scale. Asserts on the PLAN
(zero exchanges), not just the values."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.plans import shuffle_count  # noqa: E402
from bazof_spark.sources.bucketed import (  # noqa: E402
    bucketed_group_by,
    bucketed_join,
    write_bucketed,
)
from bazof_spark.sources.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle_and_matches_plain_join(spark):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    try:
        write_bucketed(orders, "t_orders_b", "o_orderkey", 8)
        write_bucketed(lineitem, "t_lineitem_b", "l_orderkey", 8)

        j = bucketed_join(
            spark, "t_lineitem_b", "t_orders_b", "l_orderkey", "o_orderkey"
        ).select("l_orderkey", "l_linenumber", "o_custkey")
        assert shuffle_count(j) == 0, (
            "both sides bucketed on the join key → no Exchange"
        )

        plain = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).select("l_orderkey", "l_linenumber", "o_custkey")
        got = sorted(map(tuple, j.collect()))
        exp = sorted(map(tuple, plain.collect()))
        assert got == exp

        # groupBy on the bucket key: aggregate without exchange
        agg = bucketed_group_by(spark, "t_lineitem_b", "l_orderkey").agg(
            F.count(F.lit(1)).alias("n")
        )
        assert shuffle_count(agg) == 0
        plain_agg = dict(
            lineitem.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        assert dict(agg.collect()) == plain_agg
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
