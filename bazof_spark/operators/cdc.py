"""Generic CDC APPLY: maintain a downstream mirror table from a
source table's change feed — the production materialized-view shape
(`Lakehouse.scan_changes` produces the feed; this is its generic
consumer; the reference roadmaps the change/stream read at
README.md:150-160). The fixture pipeline in sources/cdfmirror.py and
the `mirror` CLI subcommand both route through here.

Contract: ONE atomic version bump per applied window (post-image rows
upsert with their ORIGINAL event times, delete rows tombstone — both
deltas in the same snapshot via `merge_apply`); the apply touches only
the feed's keys, never rewriting the mirror's base. If the mirror
does not exist yet, it is bootstrapped as a full copy of the source at
``since`` (schema taken from the source snapshot) before the window
applies."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def apply_changes(
    spark: SparkSession,
    lakehouse,
    source: str,
    mirror_path: str,
    since,
    until=None,
    at: datetime | None = None,
):
    """Apply the ``since → until`` change window of ``source`` onto the
    table at ``mirror_path``. Returns the mirror's published snapshot
    (the current one when the window is empty)."""
    from bazof_spark import iofs
    from bazof_spark.writer import TableWriter, merge_apply

    snapshot = lakehouse.table(source).get_current_snapshot()
    value_cols = [c.name for c in snapshot.schema.columns]

    version_ptr = iofs.join(mirror_path, "version.txt")
    if not _exists(version_ptr):
        # bootstrap: the mirror starts as the source's state at `since`
        boot = lakehouse.scan(source, as_of=since).select(
            "key", "event_time", *value_cols
        )
        w = TableWriter(spark, mirror_path, snapshot.schema)
        lo, hi = boot.agg(
            F.min("event_time"), F.max("event_time")
        ).first()
        lo = lo or _as_dt(since)
        hi = hi or lo
        seg = w.add_segment("m1", lo)
        seg.add_delta_distributed(boot, lo, hi, num_files=2)
        w.commit()

    feed = lakehouse.scan_changes(source, since=since, until=until)
    ups = feed.filter(F.col("change_type") != "delete").select(
        "key",
        F.col("event_time_late").alias("event_time"),
        *[F.col(f"{c}_late").alias(c) for c in value_cols],
    )
    dels = feed.filter(F.col("change_type") == "delete").select("key")
    if at is None:
        # Deterministic default: the change feed does not carry the
        # delete INSTANT (delete rows have a null late side), so
        # tombstones default to the window's `until` bound — "hidden
        # from the end of the applied window onward", the tightest
        # instant the feed itself can justify. Without an `until`,
        # fall back to the window's newest post-image instant (a
        # delete-only unbounded window gets 'now'). Callers that know
        # the exact instants (the fixture pipeline does) pass `at`.
        if until is not None:
            at = _as_dt(until)
        else:
            at = feed.agg(F.max("event_time_late")).first()[0]
        if at is None:
            from datetime import timezone

            has_rows = not feed.limit(1).isEmpty()
            if not has_rows:
                return lakehouse.table(
                    os.path.basename(mirror_path.rstrip("/"))
                ).get_current_snapshot()
            at = datetime.now(timezone.utc)
    return merge_apply(
        spark,
        mirror_path,
        upsert_df=ups,
        delete_keys_df=dels,
        at=at,
    )


def _as_dt(value):
    from bazof_spark.metadata import parse_rfc3339

    if isinstance(value, datetime):
        return value
    return parse_rfc3339(str(value))


def _exists(path: str) -> bool:
    from bazof_spark import iofs

    if "://" not in path:
        return os.path.exists(path)
    fs, rel = iofs.split(path)
    try:
        info = fs.get_file_info([rel])[0]
        return info.type.name != "NotFound"
    except Exception:
        return False


def apply_raw_stream_batch(spark, mirror_path: str, schema, batch_df):
    """foreachBatch body for a STREAMING mirror over the native source
    (`readStream.format("bazof")` — raw per-version rows with ``_rank``
    = snapshot version and, on delete-capable tables, ``_tombstone``):
    applies each version in the micro-batch IN ORDER as one atomic
    merge (upserts keep their original event times; tombstones land at
    the version's newest instant), bootstrapping the mirror from the
    first version's rows. Safe under availableNow replay: versions
    apply sequentially, so the mirror's snapshot chain parallels the
    source's."""
    from bazof_spark.writer import TableWriter, merge_apply

    value_cols = [c.name for c in schema.columns]
    rows = batch_df.persist()
    try:
        versions = sorted(
            r["_rank"] for r in rows.select("_rank").distinct().collect()
        )
        has_tomb = "_tombstone" in rows.columns
        for v in versions:
            vd = rows.filter(F.col("_rank") == v)
            tomb = (
                F.col("_tombstone") if has_tomb else F.lit(False)
            )
            ups = vd.filter(~tomb).select(
                "key", "event_time", *value_cols
            )
            dels = vd.filter(tomb).select("key", "event_time")
            if not _exists(os.path.join(mirror_path, "version.txt")):
                lo, hi = ups.agg(
                    F.min("event_time"), F.max("event_time")
                ).first()
                w = TableWriter(spark, mirror_path, schema)
                seg = w.add_segment("m1", lo)
                seg.add_delta(ups, lo, hi)
                w.commit()
                continue
            at = (
                dels.agg(F.max("event_time")).first()[0]
                or ups.agg(F.max("event_time")).first()[0]
            )
            merge_apply(
                spark,
                mirror_path,
                upsert_df=ups if not ups.isEmpty() else None,
                delete_keys_df=(
                    dels.select("key") if not dels.isEmpty() else None
                ),
                at=at,
            )
    finally:
        rows.unpersist()
