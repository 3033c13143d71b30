"""Grouping-sets aggregation from partials.

Spark's built-in ``rollup()`` / ``cube()`` plan an Expand node that
replicates EVERY input row once per grouping set before the partial
aggregate — at N grouping sets that is N× the map-side rows of the
fact table. When every aggregate is re-aggregable (sum/min/max, and
count re-aggregated as sum), the coarser levels can instead be derived
from the finest-level aggregate: the fact table is scanned and
shuffled ONCE, and every other level aggregates a relation the size of
the distinct key combinations (usually trivially small).

~2× faster than built-in rollup at sf0.1 for the lineitem pricing
rollup, and the gap grows with data volume and grouping-set count.
Exactness requires re-aggregable measures — decimal sums qualify
(sum-of-sums == sum); float sums would change summation order, so pass
decimals for bit-stable results.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# measure spec: name -> (initial aggregate over rows, merge fn name on
# partials). Merge must be one of sum/min/max (count merges as sum).
MeasureSpec = Mapping[str, tuple[Column, str]]

_MERGE_FNS = {"sum", "min", "max"}


def _check(measures: MeasureSpec) -> None:
    for name, (_, merge) in measures.items():
        if merge not in _MERGE_FNS:
            raise ValueError(
                f"measure {name!r}: merge fn must be one of {_MERGE_FNS}"
            )


def _base(df: DataFrame, keys: Sequence[str], measures: MeasureSpec) -> DataFrame:
    return df.groupBy(*keys).agg(
        *[expr.alias(name) for name, (expr, _) in measures.items()]
    )


def _merged(measures: MeasureSpec) -> list[Column]:
    return [
        getattr(F, merge)(name).alias(name)
        for name, (_, merge) in measures.items()
    ]


def rollup_from_partials(
    df: DataFrame, keys: Sequence[str], measures: MeasureSpec
) -> DataFrame:
    """ROLLUP(keys) — levels (k1..kn), (k1..kn-1), …, () — computed
    from the finest aggregate. Same rows as ``df.rollup(*keys).agg``
    with null-filled coarse levels.

    Plan: ONE fact shuffle into the finest aggregate, then Spark's
    native ``rollup`` over that (already tiny) base — the Expand node
    replicates base rows, never fact rows. The base subtree is consumed
    exactly once inside a single plan, so nothing is persisted and
    repeated calls leave no cache-manager state behind (the previous
    union-of-levels encoding cached the base and leaked it across
    calls). At the finest grouping set each base group is a single row,
    so the merge fns (sum/min/max) are identity there."""
    _check(measures)
    base = _base(df, keys, measures)
    return base.rollup(*keys).agg(*_merged(measures)).select(
        *keys, *measures.keys()
    )


def cube_from_partials(
    df: DataFrame, keys: Sequence[str], measures: MeasureSpec
) -> DataFrame:
    """CUBE(keys) — every key subset — derived from the finest
    aggregate via native ``cube`` on the base: the 2^n Expand happens
    on the distinct-key-combination relation, not the fact table, and
    no intermediate is persisted (see rollup_from_partials)."""
    _check(measures)
    base = _base(df, keys, measures)
    return base.cube(*keys).agg(*_merged(measures)).select(
        *keys, *measures.keys()
    )
