"""Misra–Gries HEAVY HITTERS: frequent-item summaries with bounded
memory — the third member of the sketch family (KMV counts distinct,
the fixed-bin histogram answers quantiles, this answers "which items
dominate"). The classic streaming summary (Misra & Gries 1982; the
SpaceSaving variant of Metwally et al. 2005 gives the same bound):
keep at most ``capacity`` counters; an unseen item beyond capacity
decrements EVERY counter by one (dropping zeros) instead of being
admitted. After ``n`` items with ``r`` decrement rounds, each kept
counter is a LOWER bound on the item's true count, undercounting by at
most ``r ≤ n/(capacity+1)`` — so every item with true count >
n/(capacity+1) is guaranteed present in the summary.

Distributed shape (the reason MG fits a 100 TB corpus): the summary is
MERGEABLE — run MG per input partition (one Arrow-batched map pass,
zero exchanges), then sum per-item lower bounds across partitions.
The only exchange carries ≤ capacity·P summary rows (P = partitions),
never the corpus and never its distinct-item set; the summed
undercount ``Σ_p r_p`` rides along as the global error bound. Exact
``GROUP BY item`` shuffles every distinct item; MG caps the wire bytes
at a constant per partition, the same profile as the KMV exchange.

Exactness regime: when NO partition overflows its capacity (``r_p = 0``
everywhere — guaranteed whenever per-partition distinct ≤ capacity),
the lower bounds ARE the true counts and the merged top-k equals the
exact answer, which is what lets the `heavy_hitters_terms` workload
query carry a full DuckDB oracle; the approximate regime's bounds are
pinned by unit tests instead (tests/test_heavyhitters.py)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_partial_summaries(
    df: DataFrame, item_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra–Gries summaries: one map-only Arrow-batched
    pass emitting ≤ ``capacity`` ``(item, cnt_lo)`` rows per input
    partition plus ONE ``(NULL, rounds)`` sentinel row carrying that
    partition's decrement-round count (= its max undercount)."""
    src = df.select(F.col(item_col).cast("string").alias("item"))

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        rounds = 0
        for pdf in batches:
            col = pdf["item"].dropna()
            # Vectorized fast path (opt round 2, guide §1.2 step 2 /
            # §4.2): when the kept counters plus this batch's distinct
            # items fit the capacity, NO prefix of the batch can
            # trigger a decrement round, so arrival order is
            # irrelevant and the sequential loop's result is exactly
            # counters + value_counts — computed at C speed instead of
            # one Python iteration per word occurrence. The workload
            # query's exact regime (31-word vocab ≪ 256 capacity)
            # always takes this path; any batch that could overflow
            # falls through to the original loop unchanged, so the
            # approximate regime is bit-identical by construction.
            vc = col.value_counts()
            new_items = sum(1 for it in vc.index if it not in counters)
            if len(counters) + new_items <= capacity:
                for it, c in vc.items():
                    counters[it] = counters.get(it, 0) + int(c)
                continue
            for item in col:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < capacity:
                    counters[item] = 1
                else:
                    # decrement-all round: the incoming item and one
                    # unit of every counter cancel out
                    rounds += 1
                    for k in list(counters):
                        counters[k] -= 1
                        if counters[k] == 0:
                            del counters[k]
        out = pd.DataFrame(
            {
                "item": list(counters) + [None],
                "cnt_lo": list(counters.values()) + [0],
                "rounds": [0] * len(counters) + [rounds],
            }
        )
        yield out.astype({"cnt_lo": "int64", "rounds": "int64"})

    return src.mapInPandas(summarize, "item string, cnt_lo long, rounds long")


def mg_topk(
    df: DataFrame, item_col: str, k: int, capacity: int
) -> DataFrame:
    """Merged Misra–Gries top-k: ``(item, rank, cnt_lo, max_err)``
    where ``cnt_lo`` is the summed per-partition lower bound and
    ``max_err`` (constant across rows) the summed decrement rounds —
    the global undercount ceiling. ``max_err = 0`` certifies the
    result exact.

    ONE corpus pass (opt round 2, guide §2.4 "don't compute things you
    throw away"): the error bound used to be a separate eager
    ``parts.agg(sum(rounds)).first()`` whose value rode the result as
    a literal — Spark shares no subplans across DataFrame references,
    so the (map-only but corpus-linear) summary pass executed TWICE
    per evaluation plus a driver collect. The sentinel rows now flow
    through the same merge aggregate (NULL groups with the other
    NULLs) and the global bound is a window sum over the merged
    sketch — computed inside the single-partition exchange the rank
    window needs anyway, so the plan gains no exchange and loses a
    whole corpus scan and the driver round trip. Identical output:
    ``sum(rounds)`` over merged groups equals the old whole-relation
    sum, and the sentinel group is filtered before ranking exactly
    where the old code filtered it before merging."""
    from pyspark.sql import Window

    parts = mg_partial_summaries(df, item_col, capacity)
    w_all = Window.partitionBy()  # whole relation: ≤ capacity·P + P rows
    w = Window.orderBy(F.col("cnt_lo").desc(), F.col("item").asc())
    return (
        parts.groupBy("item")
        .agg(
            F.sum("cnt_lo").alias("cnt_lo"),
            F.sum("rounds").alias("_rounds"),
        )
        .withColumn("max_err", F.sum("_rounds").over(w_all))
        .filter(F.col("item").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "item",
            "rank",
            "cnt_lo",
            F.col("max_err").cast("long").alias("max_err"),
        )
    )
