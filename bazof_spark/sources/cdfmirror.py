"""CDC MIRROR pipeline: maintain a downstream table B as an exact
replica of table A by consuming A's change feed incrementally — the
materialized-view shape every lakehouse deployment builds on top of a
CDF (the reference roadmaps the change/streaming read at
README.md:150-160; `Lakehouse.scan_changes` implements it, and this
module is its first CONSUMER).

Protocol (the standard bootstrap + incremental apply):

1. Bootstrap: B v1 = a full scan of A at its first instant.
2. For each subsequent version of A, read ``scan_changes(t_i, t_{i+1})``
   and apply it with ONE atomic ``merge_apply`` (inserts/updates as an
   upsert delta of the POST-image rows, deletes as a tombstone delta,
   one version bump). The apply touches ONLY changed keys — B's delta
   files contain exactly the feed's rows, never a rewrite of B's base.

Table A ("acct", keys = the driver ``documents`` doc_ids, so the
corpus scales with sf) has a fully deterministic 3-version history the
DuckDB oracle recomputes from closed-form CASE expressions:

- v1 (2024-05-01): every key k: balance = 7k, status 'new'.
- v2 (2024-06-01): update k%7==0 (and not deleted): balance += 1000,
  status 'upd'; DELETE k%31==5.
- v3 (2024-07-01): re-insert k%62==5 (half the deleted): balance =
  7k + 5000, status 'back'; update k%13==2 (excluding deleted and
  re-inserted): balance += 50, status 'u2'.

The mirror applies the v1→v2 and v2→v3 feeds; a correct pipeline makes
B bit-identical to A at EVERY instant, which the `cdf_mirror_scan`
query checks at two as-of points.
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bazof_spark.lakehouse import Lakehouse
from bazof_spark.schema import ColumnDef, ColumnType, TableSchema

ACCT_SCHEMA = TableSchema(
    (
        ColumnDef("balance", ColumnType.INT, False),
        ColumnDef("status", ColumnType.STRING, False),
    )
)

SOURCE = "acct"
MIRROR = "acct_mirror"
AGG_VIEW = "acct_by_status"
T1 = datetime(2024, 5, 1, tzinfo=timezone.utc)
T2 = datetime(2024, 6, 1, tzinfo=timezone.utc)
T3 = datetime(2024, 7, 1, tzinfo=timezone.utc)
#: instants the query/oracle compare at (between v2/v3, and current)
BETWEEN_V2 = "2024-06-15T00:00:00.000Z"


def _keys(spark: SparkSession, sf_dir: str):
    from bazof_spark.sources.tables import load_table

    return (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("k"))
        .distinct()
    )


def _build_source(spark: SparkSession, sf_dir: str, path: str) -> None:
    from bazof_spark.writer import TableWriter, merge_apply

    k = F.col("k")
    keys = _keys(spark, sf_dir)
    v1 = keys.select(
        k.cast("string").alias("key"),
        F.lit(T1).alias("event_time"),
        (k * 7).alias("balance"),
        F.lit("new").alias("status"),
    )
    w = TableWriter(spark, path, ACCT_SCHEMA)
    seg = w.add_segment("a1", T1)
    seg.add_delta_distributed(v1, T1, T1, num_files=2)
    w.commit()
    # v2: update k%7==0 (not deleted), delete k%31==5 — one atomic bump
    upd2 = keys.filter((k % 7 == 0) & (k % 31 != 5)).select(
        k.cast("string").alias("key"),
        F.lit(T2).alias("event_time"),
        (k * 7 + 1000).alias("balance"),
        F.lit("upd").alias("status"),
    )
    del2 = keys.filter(k % 31 == 5).select(k.cast("string").alias("key"))
    merge_apply(spark, path, upsert_df=upd2, delete_keys_df=del2, at=T2)
    # v3: re-insert k%62==5; update k%13==2 (excluding deleted and
    # re-inserted) on top of the v2 balance
    back3 = keys.filter(k % 62 == 5).select(
        k.cast("string").alias("key"),
        F.lit(T3).alias("event_time"),
        (k * 7 + 5000).alias("balance"),
        F.lit("back").alias("status"),
    )
    upd3 = keys.filter(
        (k % 13 == 2) & (k % 31 != 5) & (k % 62 != 5)
    ).select(
        k.cast("string").alias("key"),
        F.lit(T3).alias("event_time"),
        (
            F.when(k % 7 == 0, k * 7 + 1000).otherwise(k * 7) + 50
        ).alias("balance"),
        F.lit("u2").alias("status"),
    )
    merge_apply(spark, path, upsert_df=back3.unionByName(upd3), at=T3)


def apply_cdf_batch(
    spark: SparkSession,
    lh: Lakehouse,
    source: str,
    mirror_path: str,
    since,
    until,
    at: datetime,
):
    """One change-feed window applied as ONE atomic version bump —
    thin wrapper over the generic :func:`operators.cdc.apply_changes`
    (which derives the value columns from the source schema)."""
    from bazof_spark.operators.cdc import apply_changes

    return apply_changes(
        spark, lh, source, mirror_path, since=since, until=until, at=at
    )


def _build_mirror(spark: SparkSession, root: str) -> None:
    from bazof_spark.writer import TableWriter

    lh = Lakehouse(spark, root)
    mirror_path = os.path.join(root, MIRROR)
    # bootstrap: B v1 = full copy of A at its first instant
    boot = lh.scan(SOURCE, as_of=T1).select(
        "key", "event_time", "balance", "status"
    )
    w = TableWriter(spark, mirror_path, ACCT_SCHEMA)
    seg = w.add_segment("m1", T1)
    seg.add_delta_distributed(boot, T1, T1, num_files=2)
    w.commit()
    # incremental: one atomic apply per source version window
    apply_cdf_batch(spark, lh, SOURCE, mirror_path, T1, T2, at=T2)
    apply_cdf_batch(spark, lh, SOURCE, mirror_path, T2, T3, at=T3)


def agg_view_lakehouse(
    spark: SparkSession, sf_dir: str, point_read_max_groups: int | None = None
) -> Lakehouse:
    """Idempotently build (once per sf_dir content tag) and return a
    Lakehouse holding the INCREMENTALLY-MAINTAINED ``GROUP BY status``
    rollup of table A (operators/ivm.py): bootstrap = one full
    aggregate at T1, then one delta-propagated apply per source
    version window — the aggregate-materialized-view shape, downstream
    of the same deterministic history the key-level mirror consumes.
    Atomic scratch publish (sources/media.py pattern).

    ``point_read_max_groups`` overrides the operator's point-read gate
    (tests drive both arms); the CACHED fixture is only keyed by the
    sf tag, so non-default gates build into a throwaway root."""
    import shutil
    import uuid

    from bazof_spark.operators.ivm import apply_changes_agg
    from bazof_spark.sources.tables import source_tag

    src_lh = cdf_mirror_lakehouse(spark, sf_dir)
    tag = source_tag(sf_dir, "documents")
    gate_kwargs = {}
    suffix = ""
    if point_read_max_groups is not None:
        gate_kwargs = {"point_read_max_groups": point_read_max_groups}
        suffix = f"_gate{point_read_max_groups}"
    root = os.path.join(tempfile.gettempdir(), f"bazof_cdfagg_{tag}{suffix}")
    marker = os.path.join(root, "_BUILT")
    if not os.path.exists(marker):
        scratch = f"{root}.build-{os.getpid()}-{uuid.uuid4().hex}"
        os.makedirs(scratch, exist_ok=True)
        view_path = os.path.join(scratch, AGG_VIEW)
        # bootstrap only (empty T1→T1 window), then one incremental
        # apply per source version window
        apply_changes_agg(
            spark, src_lh, SOURCE, view_path, "status", ("balance",),
            since=T1, until=T1, at=T1, **gate_kwargs,
        )
        apply_changes_agg(
            spark, src_lh, SOURCE, view_path, "status", ("balance",),
            since=T1, until=T2, at=T2, **gate_kwargs,
        )
        apply_changes_agg(
            spark, src_lh, SOURCE, view_path, "status", ("balance",),
            since=T2, until=T3, at=T3, **gate_kwargs,
        )
        with open(os.path.join(scratch, "_BUILT"), "w") as f:
            f.write("ok")
        try:
            os.rename(scratch, root)
        except OSError:
            if not os.path.exists(marker):
                raise
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    return Lakehouse(spark, root)


def cdf_mirror_lakehouse(spark: SparkSession, sf_dir: str) -> Lakehouse:
    """Idempotently build (once per sf_dir content tag) and return a
    Lakehouse holding source table A and its CDF-maintained mirror B.
    Publish is the atomic scratch-dir + rename pattern of
    sources/media.py (both tables move together)."""
    import shutil
    import uuid

    from bazof_spark.sources.tables import source_tag

    tag = source_tag(sf_dir, "documents")
    root = os.path.join(tempfile.gettempdir(), f"bazof_cdfm_{tag}")
    marker = os.path.join(root, "_BUILT")
    if not os.path.exists(marker):
        scratch = f"{root}.build-{os.getpid()}-{uuid.uuid4().hex}"
        os.makedirs(scratch, exist_ok=True)
        _build_source(spark, sf_dir, os.path.join(scratch, SOURCE))
        _build_mirror(spark, scratch)
        with open(os.path.join(scratch, "_BUILT"), "w") as f:
            f.write("ok")
        try:
            os.rename(scratch, root)
        except OSError:
            if not os.path.exists(marker):
                raise
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    return Lakehouse(spark, root)
