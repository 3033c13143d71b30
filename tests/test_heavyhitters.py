"""Misra–Gries heavy hitters (operators/heavyhitters.py): the merged
summary must honor the classic guarantees in BOTH regimes — exact when
no partition overflows its capacity, and in the approximate regime
(capacity < per-partition distinct): every reported count is a lower
bound undercounting by at most the summed decrement rounds, and every
item with true count > n/(capacity+1) survives into the summary."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.operators.heavyhitters import (  # noqa: E402
    mg_partial_summaries,
    mg_topk,
)


def _items(spark, rows, partitions=2):
    return spark.createDataFrame(
        [(r,) for r in rows], "item string"
    ).repartition(partitions)


def test_exact_regime_matches_groupby(spark):
    """capacity ≥ distinct ⇒ zero decrement rounds, max_err = 0, and
    the top-k IS the exact GROUP BY answer with deterministic ties."""
    rows = (
        ["a"] * 7 + ["b"] * 5 + ["c"] * 5 + ["d"] * 2 + ["e"] * 1
    ) * 3  # 60 rows, 5 distinct
    df = _items(spark, rows, partitions=4)
    got = mg_topk(df, "item", k=3, capacity=16).collect()
    assert [(r["item"], r["rank"], r["cnt_lo"]) for r in got] == [
        ("a", 1, 21),
        ("b", 2, 15),  # b before c: count tie broken by item
        ("c", 3, 15),
    ]
    assert all(r["max_err"] == 0 for r in got)


def test_approximate_regime_bounds_hold(spark):
    """capacity=2 against 6 distinct items: reported counts are lower
    bounds within the summed round ceiling, and the guaranteed-present
    threshold n/(capacity+1) holds."""
    rows = ["x"] * 40 + ["y"] * 25 + ["noise%d" % i for i in range(20)]
    df = _items(spark, rows, partitions=2)
    true = {"x": 40, "y": 25}
    parts = mg_partial_summaries(df, "item", capacity=2).collect()
    total_rounds = sum(r["rounds"] for r in parts if r["item"] is None)
    n = len(rows)
    assert total_rounds >= 1  # genuinely in the approximate regime
    # per-partition rounds can never exceed n_p/(capacity+1)
    assert total_rounds <= n // 3

    merged = {}
    for r in parts:
        if r["item"] is not None:
            merged[r["item"]] = merged.get(r["item"], 0) + r["cnt_lo"]
    for item, lo in merged.items():
        t = true.get(item, 1)
        assert lo <= t, (item, lo, t)
        assert t <= lo + total_rounds, (item, lo, t, total_rounds)
    # x (40 > 85/3) MUST be present; its bound must dominate the noise
    assert "x" in merged
    topk = mg_topk(df, "item", k=1, capacity=2).collect()
    assert topk[0]["item"] == "x"
    assert topk[0]["max_err"] == total_rounds


def test_nulls_and_empty_partitions_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,)], "item string"
    ).repartition(8)  # most partitions empty
    got = mg_topk(df, "item", k=5, capacity=4).collect()
    assert [(r["item"], r["cnt_lo"], r["max_err"]) for r in got] == [
        ("a", 2, 0)
    ]
