"""Deterministic distinct-count sketching (k-minimum-values family).

Spark's built-in ``approx_count_distinct`` is HyperLogLog++ — fine at
scale but not reproducible across engines, so it can't be
oracle-checked. This module implements the k-independent-minima
estimator (the stochastic-averaging member of the KMV/bottom-k family,
Bar-Yossef et al. 2002; Lumbroso 2010): hash every value with k
pairwise-independent hash functions, keep the per-group minimum of
each, and estimate

    distinct ≈ k / Σ_i (min_i / H)  -  1

since each normalized minimum is ~ Beta(1, D) with mean 1/(D+1).
Relative error ~ 1/√k.

The k hash functions come from ONE md5 per value via double hashing
(Kirsch–Mitzenmacher, same construction as the minhash signatures in
operators/dedup.py): h_i = (h1 + i·h2) mod 2^60, with h1/h2 the first
60/56 bits of the digest. Everything is integer mins + a fixed-order
IEEE-double fold, so the DuckDB oracle recomputes the estimate
bit-for-bit.

Scale shape — the whole point of a sketch aggregate: the partial
aggregate is k ``min`` columns, map-side combined, so the exchange
carries exactly k longs per group per partition regardless of row
count or distinct count. (Exact ``countDistinct`` shuffles every
distinct value; HLL shuffles a fixed register block — this matches the
HLL profile while staying deterministic.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bazof_spark.exprcache import cached_column, cached_columns

# 60-bit hash space: 15 hex chars of md5, always fits a signed BIGINT
# in both Spark and DuckDB.
KMV_HASH_SPACE = 1 << 60


def _hash_pair(value: Column) -> tuple[Column, Column]:
    m = F.md5(value)
    h1 = F.conv(F.substring(m, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(m, 16, 14), 16, 10).cast("long")
    return h1, h2


def kmv_hash_columns(value_col: str, k: int) -> list[Column]:
    """The k per-row hash projections ``_h0.._h{k-1}`` of the KMV
    construction. The tree depends only on (value_col, k) — built once
    per process (opt round 1: each F.pmod chain is ~6 py4j round trips,
    so k=32 cost ~0.3 s of driver latency per query construction)."""

    def build() -> list[Column]:
        h1, h2 = _hash_pair(F.col(value_col))
        return [
            F.pmod(h1 + F.lit(i) * h2, F.lit(KMV_HASH_SPACE)).alias(f"_h{i}")
            for i in range(k)
        ]

    return cached_columns(("kmv_hash", value_col, k), build)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group KMV sketch STATE: ``group_cols + (n_rows, _m0.._m{k-1})``
    — a plain relation you can WRITE OUT (e.g. one sketch row per
    table/day) and later re-aggregate with :func:`kmv_merge`. Because
    min-of-mins over any regrouping equals the min over the union of
    the raw rows, a merged sketch is BIT-IDENTICAL to the sketch
    computed directly on the union — the re-aggregability that makes
    incremental distinct counts possible at 100 TB (compute per
    partition/day once, merge forever, never rescan history)."""
    hashed = df.select(*group_cols, *kmv_hash_columns(value_col, k))
    return hashed.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *cached_columns(
            ("kmv_min_h", k),
            lambda: [F.min(f"_h{i}").alias(f"_m{i}") for i in range(k)],
        ),
    )


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = 32,
) -> DataFrame:
    """Re-aggregate sketch states to coarser groups: sum of row counts,
    min of each minimum. The exchange carries k longs + a count per
    group per partition — sketch-sized, never data-sized."""
    return sketches.groupBy(*group_cols).agg(
        F.sum("n_rows").alias("n_rows"),
        *cached_columns(
            ("kmv_min_m", k),
            lambda: [F.min(f"_m{i}").alias(f"_m{i}") for i in range(k)],
        ),
    )


def kmv_estimate_column(k: int, prefix: str = "_m") -> Column:
    """The rounded KMV estimate expression over ``{prefix}0..{prefix}
    {k-1}`` min columns — the fixed-order left-to-right double fold so
    the oracle's explicit (m0/H + m1/H + ...) sum reproduces the same
    IEEE result. Cached: the fold chain is ~4 py4j round trips per
    term."""

    def build() -> Column:
        total = F.lit(0.0)
        for i in range(k):
            total = total + F.col(f"{prefix}{i}") / F.lit(
                float(KMV_HASH_SPACE)
            )
        return F.round(F.lit(float(k)) / total - F.lit(1.0), 6)

    return cached_column(("kmv_est", k, prefix), build)


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 32) -> DataFrame:
    """Distinct-count estimate from a sketch state (map-only).
    Output: group_cols + (n_rows, kmv_k, distinct_est)."""
    return sketch.select(
        *group_cols,
        "n_rows",
        F.lit(k).alias("kmv_k"),
        kmv_estimate_column(k).alias("distinct_est"),
    )


def kmv_distinct_estimate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group deterministic distinct-count estimate of ``value_col``.

    Output: group_cols + (n_rows, kmv_k, distinct_est). One shuffle;
    the partial carries k longs + a count per group per partition.
    Composition of :func:`kmv_sketch` → :func:`kmv_estimate`."""
    return kmv_estimate(kmv_sketch(df, group_cols, value_col, k), group_cols, k)


def histogram_quantile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 128,
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Per-group quantile ESTIMATES from a fixed-bin histogram — the
    bounded-memory answer to ``F.percentile`` (exact, but buffers every
    value in the aggregate at 100 TB). The partial aggregate is at most
    ``bins`` counts per group per partition; the estimate is the upper
    edge of the bin where the cumulative count crosses ceil(q·n) —
    deterministic, so the DuckDB oracle recomputes it exactly.

    Output: group_cols + (n_rows, q<q>_est ...). Values outside
    [lo, hi) clamp into the edge bins (the fixed domain is declared, as
    with any histogram sketch); NULL values are excluded and n_rows is
    the non-null count.
    """
    width = (hi - lo) / bins
    raw_bin = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast(
        "long"
    )
    bin_col = F.least(
        F.greatest(raw_bin, F.lit(0)), F.lit(bins - 1)
    ).alias("_bin")
    per_bin = (
        # NULL values are excluded explicitly: a NULL bin would sort
        # nulls-first in Spark's window but nulls-last in DuckDB's,
        # silently shifting the cumulative counts between engines.
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bin_col)
        .groupBy(*group_cols, "_bin")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*group_cols)
    cum = per_bin.withColumn("_cum", F.sum("_cnt").over(w)).withColumn(
        "_n", F.sum("_cnt").over(wtot)
    )
    aggs = [F.max("_n").alias("n_rows")]
    for q in quantiles:
        target = F.ceil(F.lit(q) * F.col("_n"))
        qbin = F.min(F.when(F.col("_cum") >= target, F.col("_bin")))
        est = F.lit(lo) + (qbin + 1) * F.lit(width)
        aggs.append(
            F.round(est, 6).alias(f"q{int(q * 100)}_est")
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def histogram_quantile_oracle_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 128,
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> str:
    """DuckDB SQL recomputing :func:`histogram_quantile` exactly."""
    width = (hi - lo) / bins
    gcols = ", ".join(group_cols)
    qexprs = ",\n               ".join(
        f"round({lo} + (MIN(CASE WHEN _cum >= ceil({q} * _n) THEN _bin END)"
        f" + 1) * {width}, 6) AS q{int(q * 100)}_est"
        for q in quantiles
    )
    return f"""
        WITH binned AS (
            SELECT {gcols},
                   LEAST(GREATEST(CAST(floor(({value_col} - {lo}) / {width})
                       AS BIGINT), 0), {bins - 1}) AS _bin
            FROM {table}
            WHERE {value_col} IS NOT NULL
        ),
        per_bin AS (
            SELECT {gcols}, _bin, COUNT(*) AS _cnt
            FROM binned GROUP BY ALL
        ),
        cum AS (
            SELECT {gcols}, _bin, _cnt,
                   SUM(_cnt) OVER (PARTITION BY {gcols} ORDER BY _bin
                       ROWS UNBOUNDED PRECEDING) AS _cum,
                   SUM(_cnt) OVER (PARTITION BY {gcols}) AS _n
            FROM per_bin
        )
        SELECT {gcols}, CAST(MAX(_n) AS BIGINT) AS n_rows,
               {qexprs}
        FROM cum GROUP BY {gcols}
    """


def kmv_oracle_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    k: int = 32,
) -> str:
    """DuckDB SQL recomputing :func:`kmv_distinct_estimate` exactly."""
    h1 = f"CAST('0x' || substr(md5({value_col}), 1, 15) AS BIGINT)"
    h2 = f"CAST('0x' || substr(md5({value_col}), 16, 14) AS BIGINT)"
    hspace = KMV_HASH_SPACE
    hash_cols = ",\n               ".join(
        f"({h1} + {i} * {h2}) % {hspace} AS _h{i}" for i in range(k)
    )
    mins = ", ".join(f"MIN(_h{i}) AS _m{i}" for i in range(k))
    # parenthesized left-to-right to mirror the Spark fold order
    total = "0.0"
    for i in range(k):
        total = f"({total} + _m{i} / {float(hspace)})"
    gcols = ", ".join(group_cols)
    return f"""
        WITH hashed AS (
            SELECT {gcols},
               {hash_cols}
            FROM {table}
        ),
        g AS (
            SELECT {gcols}, COUNT(*) AS n_rows, {mins}
            FROM hashed GROUP BY {gcols}
        )
        SELECT {gcols}, n_rows, {k} AS kmv_k,
               round({float(k)} / {total} - 1.0, 6) AS distinct_est
        FROM g
    """
