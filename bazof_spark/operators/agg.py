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


def _level(
    base: DataFrame,
    all_keys: Sequence[str],
    keep: Sequence[str],
    measures: MeasureSpec,
) -> DataFrame:
    merged = [
        getattr(F, merge)(name).alias(name)
        for name, (_, merge) in measures.items()
    ]
    lvl = base.groupBy(*keep).agg(*merged) if keep else base.agg(*merged)
    for k in all_keys:
        if k not in keep:
            lvl = lvl.withColumn(k, F.lit(None).cast(base.schema[k].dataType))
    return lvl.select(*all_keys, *measures.keys())


def rollup_from_partials(
    df: DataFrame, keys: Sequence[str], measures: MeasureSpec
) -> DataFrame:
    """ROLLUP(keys) — levels (k1..kn), (k1..kn-1), …, () — computed
    from the finest aggregate. Same rows as ``df.rollup(*keys).agg``
    with null-filled coarse levels."""
    _check(measures)
    # persist the finest level: every coarser level re-aggregates it,
    # and without the cache each union branch would re-run the fact
    # scan + aggregate (n+1 scans instead of 1). Cached blocks live
    # until clearCache()/unpersist or LRU eviction — repeated calls in
    # a long-lived session should clear between calls.
    base = _base(df, keys, measures).persist()
    out = base.select(*keys, *measures.keys())
    for i in range(len(keys) - 1, -1, -1):
        out = out.union(_level(base, keys, keys[:i], measures))
    return out


def cube_from_partials(
    df: DataFrame, keys: Sequence[str], measures: MeasureSpec
) -> DataFrame:
    """CUBE(keys) — every key subset — each derived from the finest
    aggregate (the base is small, so 2^n tiny aggregates beat a 2^n×
    Expand of the fact table)."""
    _check(measures)
    base = _base(df, keys, measures).persist()  # see rollup_from_partials
    out = base.select(*keys, *measures.keys())
    n = len(keys)
    for mask in range(2**n - 2, -1, -1):
        keep = [keys[i] for i in range(n) if mask & (1 << i)]
        out = out.union(_level(base, keys, keep, measures))
    return out
