"""Generic as-of / latest-version-per-key operators on ANY DataFrame.

This is the Spark-native generalization of the reference's one physical
operator — the point-in-time merge (crates/azof/src/lakehouse.rs:29-86)
— decoupled from the table format so it can run over any keyed,
event-timed source (e.g. a CDC stream or an upsert log in plain parquet).

Scale notes:
- ``latest_by_key`` uses ``max_by`` hash aggregation: partial map-side
  combine → ONE shuffle of combined partials. A window
  (``row_number over (partition by key order by ts desc)``) would
  shuffle and sort *all* rows; at 100 TB the difference is the job.
- ``asof_join`` (point-in-time join of a probe table against a
  versioned build side) reduces to latest_by_key on a union —
  no per-row range join, no O(n·m) blowup.
"""

from __future__ import annotations

from datetime import datetime
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    as_of: datetime | str | None = None,
    precedence_col: str | None = None,
) -> DataFrame:
    """Latest row per key with ``ts <= as_of`` (None ⇒ no upper bound).

    ``precedence_col``: optional integer column where LOWER values win
    before the timestamp is compared (the format layer's file rank —
    crates/azof/src/metadata.rs:47-73 precedence semantics).
    Output keeps the input column set (minus nothing), one row per key.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if as_of is not None:
        df = df.filter(F.col(ts_col) <= F.lit(as_of))
    payload_cols = [c for c in df.columns if c not in keys]
    ordering = [F.col(ts_col)]
    if precedence_col is not None:
        ordering.insert(0, -F.col(precedence_col))
    winner = df.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c).alias(c) for c in payload_cols]),
            F.struct(*ordering),
        ).alias("_w")
    )
    return winner.select(*keys, "_w.*")


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    how: str = "inner",
    tolerance=None,
) -> DataFrame:
    """Point-in-time join: for each probe row, attach the latest build
    row with ``build_ts <= probe_ts`` for the same key.

    ``tolerance`` (a ``datetime.timedelta``, or seconds as int/float —
    pandas ``merge_asof(tolerance=...)`` semantics): a carried match
    older than ``probe_ts - tolerance`` is voided (nulled for left
    joins, dropped for inner) — stale versions don't leak forward
    across quiet periods. The plan is unchanged: the bound is a scalar
    post-filter on the carried struct, not a range join.

    Spark has no native as-of join for batch; the standard shuffle-free
    -ish encoding is union + last-observation-carried-forward via a
    window. Both sides shuffle ONCE on the key; no range-join explosion.
    """
    from pyspark.sql.window import Window

    if tolerance is not None:
        # the tolerance bound casts both ts columns to TIMESTAMP; a
        # numeric epoch column would be read as SECONDS by that cast,
        # silently mis-scaling the bound (epoch-µs by 1e6) — refuse
        # instead. The untoleranced join stays open to any orderable ts.
        for side, df_, col in (("probe", probe, probe_ts), ("build", build, build_ts)):
            t = df_.schema[col].dataType.typeName()
            if t not in ("timestamp", "timestamp_ntz", "date"):
                raise TypeError(
                    f"asof_join(tolerance=...) requires timestamp/date "
                    f"ts columns; {side}.{col} is {t}. Convert numeric "
                    f"epochs explicitly (e.g. timestamp_micros) first."
                )

    p = probe.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(probe_ts))
    build_payload = [c for c in build.columns if c not in (key, build_ts)]
    b = (
        build.withColumn("_side", F.lit(0))
        .withColumn("_ts", F.col(build_ts))
        .withColumn("_bpayload", F.struct(F.col(build_ts), *build_payload))
    )
    p_cols = [F.col(c) for c in probe.columns]
    unioned = p.select(
        *p_cols, "_side", "_ts", F.lit(None).cast(b.schema["_bpayload"].dataType).alias("_bpayload")
    ).unionByName(
        b.select(
            # the join key must survive on the build side; all other
            # probe columns are null there
            *[
                F.col(key).alias(c)
                if c == key
                else F.lit(None).cast(probe.schema[c].dataType).alias(c)
                for c in probe.columns
            ],
            "_side",
            "_ts",
            "_bpayload",
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_b", F.last("_bpayload", ignorenulls=True).over(w))
    if tolerance is not None:
        from datetime import timedelta

        if isinstance(tolerance, timedelta):
            tol_us = int(tolerance.total_seconds() * 1_000_000)
        else:
            tol_us = int(float(tolerance) * 1_000_000)
        fresh = F.unix_micros(F.col("_b")[build_ts].cast("timestamp")) >= (
            F.unix_micros(F.col("_ts").cast("timestamp")) - F.lit(tol_us)
        )
        carried = carried.withColumn(
            "_b", F.when(fresh, F.col("_b"))  # stale carry → null
        )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in probe.columns],
        *[F.col("_b")[c].alias(c) for c in [build_ts, *build_payload]],
    )
    if how == "inner":
        out = out.filter(F.col(build_ts).isNotNull())
    return out
