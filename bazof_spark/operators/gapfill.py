"""Time-series gap filling — dense regular grids from sparse
aggregates, the ``time_bucket_gapfill``/LOCF feature of hypertable
engines (TimescaleDB, QuestDB), expressed Spark-first.

Shape: the spine (every (key, bucket) slot between the series bounds)
is keys × sequence() — an explode over the DISTINCT key set cross-joined
with a broadcast 1-row bounds aggregate, so spine construction never
shuffles the fact table. The fill joins the sparse aggregate onto the
spine (co-partitioned on (key, bucket)) and runs LOCF as a
``last(ignorenulls)`` running window per key.

At 100 TB the window partitions by key — fine while a single key's
series fits an executor (the normal case: one series = one device/
metric). For mega-series, partition by (key, coarse chunk) and carry
the last value across chunk boundaries with a per-chunk boundary
relation — the same chunking discipline as operators/chunking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gapfill(
    series: DataFrame,
    keys: list[str],
    ts_col: str,
    step: str = "1 hour",
    locf_cols: tuple[str, ...] = (),
    zero_cols: tuple[str, ...] = (),
    bounds: tuple | None = None,
) -> DataFrame:
    """Densify ``series`` (already bucket-aggregated, one row per
    (keys, ts_col) with gaps) to every ``step`` slot between the global
    min/max bucket (or explicit ``bounds`` (lo, hi) literals).

    ``locf_cols`` carry the last observed value forward (null before a
    key's first observation — no invention of data); ``zero_cols``
    fill gaps with 0 (the right semantics for additive counts).

    With explicit ``bounds``, observations BEFORE ``lo`` still seed the
    carry-forward (a key last observed before the window opens shows
    that value at the window's first slots, the hypertable locf
    contract); rows outside ``[lo, hi]`` are excluded from the output
    itself."""
    if bounds is not None:
        lo, hi = F.lit(bounds[0]), F.lit(bounds[1])
        spine_bounds = series.select(*keys).distinct().select(
            *keys, lo.alias("_lo"), hi.alias("_hi")
        )
    else:
        b = series.agg(
            F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
        )
        spine_bounds = (
            series.select(*keys).distinct().crossJoin(F.broadcast(b))
        )
    spine = spine_bounds.select(
        *keys,
        F.explode(
            F.expr(f"sequence(_lo, _hi, interval {step})")
        ).alias(ts_col),
    )
    out = spine.join(series, [*keys, ts_col], "left").withColumn(
        "_in_window", F.lit(True)
    )
    if bounds is not None:
        # pre-window observations ride along (outside the spine) so the
        # LOCF window sees them, then drop out of the result
        pre = (
            series.filter(F.col(ts_col) < F.lit(bounds[0]))
            .select(*out.columns[:-1])
            .withColumn("_in_window", F.lit(False))
        )
        out = out.unionByName(pre)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in locf_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    for c in zero_cols:
        out = out.withColumn(
            c, F.coalesce(F.col(c), F.lit(0).cast(dict(out.dtypes)[c]))
        )
    return out.filter(F.col("_in_window")).drop("_in_window")
