"""Incremental VIEW MAINTENANCE for GROUP BY aggregate views over the
change feed — the second materialized-view shape (operators/cdc.py
maintains a key-level replica; this maintains a ``GROUP BY g``
count/sum rollup) every lakehouse deployment builds on a CDF. The
reference roadmaps the change/streaming read it consumes
(/root/reference/README.md:150-160); ``Lakehouse.scan_changes``
implements it.

Protocol (classic delta-propagation IVM for distributive aggregates):

1. Bootstrap: the view's v1 = one full ``GROUP BY`` over the source
   as-of ``since``. The ONLY full source scan the view ever costs.
2. Per window: the feed's pre/post images become ± contributions —
   ``+ (1, values_late)`` to the late row's group, ``- (1,
   values_early)`` to the early row's group (inserts have no early
   side, deletes no late side). One map-side-combined aggregation
   folds them to per-group adjustments, so the exchange is bounded by
   GROUPS TOUCHED, never feed rows. The previous per-group totals are
   read back from the view itself — a keys-pruned point read when the
   touched-group set is small (bloom/zone-map file pruning, the
   common case for low-cardinality rollups), a shuffled full-outer
   join above the gate (high-cardinality group keys at corpus scale,
   where collecting the touched set would be the driver OOM the
   ``paragraph_dedup_corpus`` gate exists to prevent). New totals =
   old + adjustment, published as ONE atomic ``merge_apply``: groups
   still populated upsert their replacement row, groups whose count
   reaches zero tombstone — so the view table gets the same time
   travel as the source, and scanning it as-of any applied instant
   yields that instant's exact rollup.

Count and integer sums are order-independent, so the maintained view
is BIT-identical to a from-scratch ``GROUP BY`` at every instant —
the `cdf_agg_view_scan` query's oracle recomputes exactly that.
Float sums would inherit summation-order wobble; callers who need
bit-stable float rollups should ship fixed-point longs (the
`tfidf_top_terms` discipline)."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: touched-group sets up to this size are point-read back from the
#: view via keys-pruned scans; larger sets fall back to a shuffled
#: full-outer join against the whole view (no driver-side key list).
POINT_READ_MAX_GROUPS = 100_000


def apply_changes_agg(
    spark: SparkSession,
    lakehouse,
    source: str,
    view_path: str,
    group_col: str,
    sum_cols: tuple[str, ...] = (),
    since=None,
    until=None,
    at: datetime | None = None,
    point_read_max_groups: int = POINT_READ_MAX_GROUPS,
):
    """Apply the ``since → until`` change window of ``source`` onto the
    count/sum-by-``group_col`` view at ``view_path`` (bootstrapping it
    from the source as-of ``since`` when absent). Returns the view's
    published snapshot. View schema: ``key`` = the group value as a
    string, ``cnt`` = row count, ``<col>_sum`` per ``sum_cols``."""
    from bazof_spark import iofs
    from bazof_spark.lakehouse import Lakehouse
    from bazof_spark.operators.cdc import _as_dt, _exists
    from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
    from bazof_spark.writer import TableWriter, merge_apply

    if at is None and until is not None:
        at = _as_dt(until)

    view_schema = TableSchema(
        (
            ColumnDef("cnt", ColumnType.INT, False),
            *(
                ColumnDef(f"{c}_sum", ColumnType.INT, False)
                for c in sum_cols
            ),
        )
    )
    agg_exprs = [
        F.count(F.lit(1)).cast("long").alias("cnt"),
        *(
            F.sum(F.col(c)).cast("long").alias(f"{c}_sum")
            for c in sum_cols
        ),
    ]
    value_cols = ["cnt", *(f"{c}_sum" for c in sum_cols)]

    version_ptr = iofs.join(view_path, "version.txt")
    if not _exists(version_ptr):
        # bootstrap: one full GROUP BY over the source as-of `since`
        boot_at = _as_dt(since)
        boot = (
            lakehouse.scan(source, as_of=since)
            .groupBy(F.col(group_col).cast("string").alias("key"))
            .agg(*agg_exprs)
            .select("key", F.lit(boot_at).alias("event_time"), *value_cols)
        )
        w = TableWriter(spark, view_path, view_schema)
        seg = w.add_segment("agg1", boot_at)
        seg.add_delta_distributed(boot, boot_at, boot_at, num_files=2)
        w.commit()

    feed = lakehouse.scan_changes(
        source, since=since, until=until, columns=[group_col, *sum_cols]
    )
    # ± contributions: one map-side-combined agg bounds the exchange by
    # groups touched (never feed rows)
    late = feed.filter(F.col("change_type") != "delete").select(
        F.col(f"{group_col}_late").cast("string").alias("key"),
        F.lit(1).alias("sign"),
        *(F.col(f"{c}_late").alias(c) for c in sum_cols),
    )
    early = feed.filter(F.col("change_type") != "insert").select(
        F.col(f"{group_col}_early").cast("string").alias("key"),
        F.lit(-1).alias("sign"),
        *(F.col(f"{c}_early").alias(c) for c in sum_cols),
    )
    adj = (
        late.unionByName(early)
        .groupBy("key")
        .agg(
            F.sum("sign").cast("long").alias("d_cnt"),
            *(
                F.sum(F.col("sign") * F.col(c)).cast("long").alias(f"d_{c}")
                for c in sum_cols
            ),
        )
        .persist()
    )
    try:
        n_touched = adj.limit(point_read_max_groups + 1).count()
        if n_touched == 0:
            from bazof_spark.table import Table

            return Table(
                path=view_path,
                name=os.path.basename(view_path.rstrip("/")),
            ).get_current_snapshot()

        view_lh = Lakehouse(spark, os.path.dirname(view_path))
        view_name = os.path.basename(view_path.rstrip("/"))
        if n_touched <= point_read_max_groups:
            # keys-pruned point read: only files that may hold a
            # touched group are opened (bloom/zone-map pruning)
            touched = [r["key"] for r in adj.select("key").collect()]
            old = view_lh.scan(view_name, keys=touched)
        else:
            # high-cardinality gate arm: never collect the touched
            # set — shuffle the whole view against the adjustments
            old = view_lh.scan(view_name)
        old = old.select("key", *value_cols)

        zero = F.lit(0).cast("long")
        merged = old.join(adj, "key", "full_outer").select(
            "key",
            (
                F.coalesce(F.col("cnt"), zero)
                + F.coalesce(F.col("d_cnt"), zero)
            ).alias("cnt"),
            *(
                (
                    F.coalesce(F.col(f"{c}_sum"), zero)
                    + F.coalesce(F.col(f"d_{c}"), zero)
                ).alias(f"{c}_sum")
                for c in sum_cols
            ),
        )
        merged = merged.persist()
        try:
            ups = merged.filter(F.col("cnt") > 0).select(
                "key", F.lit(at).alias("event_time"), *value_cols
            )
            dels = merged.filter(F.col("cnt") <= 0).select("key")
            return merge_apply(
                spark,
                view_path,
                upsert_df=ups if not ups.isEmpty() else None,
                delete_keys_df=dels if not dels.isEmpty() else None,
                at=at,
            )
        finally:
            merged.unpersist()
    finally:
        adj.unpersist()


def agg_view_scan(
    spark: SparkSession, view_root: str, view_name: str, as_of=None
) -> DataFrame:
    """Read the maintained rollup at an instant — the ordinary as-of
    merge over the view table (one key exchange), no recomputation."""
    from bazof_spark.lakehouse import Lakehouse

    return Lakehouse(spark, view_root).scan(view_name, as_of=as_of)
