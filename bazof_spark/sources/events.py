"""Materialize the driver's ``events`` parquet log as an azof-format
versioned table, so time-travel SQL runs against real driver data.

events schema: event_id, ts, user_id, event_type, value, props
→ azof mapping: key = str(user_id), event_time = ts, value columns =
(event_id Int, event_type String, value Float, props String).

The log is split deterministically into one base-less segment with N
delta files on fixed time boundaries (sorted event_time DESC inside each
file, unique (key, event_time) — both hold for the driver data). The
as-of merge over this table then equals "latest event per user ≤ t",
which is what the DuckDB oracles assert.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from datetime import datetime, timedelta, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bazof_spark.lakehouse import Lakehouse
from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
from bazof_spark.writer import TableWriter

EVENTS_SCHEMA = TableSchema(
    (
        ColumnDef("event_id", ColumnType.INT, False),
        ColumnDef("event_type", ColumnType.STRING, False),
        ColumnDef("value", ColumnType.FLOAT, False),
        ColumnDef("props", ColumnType.STRING, False),
    )
)

TABLE_NAME = "events_versioned"
_SEGMENT_START = datetime(2024, 1, 1, tzinfo=timezone.utc)
_N_DELTAS = 4
_DELTA_DAYS = 8  # 4 deltas × 8 days cover the ~31-day event range


def events_lakehouse(spark: SparkSession, sf_dir: str) -> Lakehouse:
    """Idempotently build (once per sf_dir) and return a Lakehouse whose
    ``events_versioned`` table materializes ``{sf_dir}/events.parquet``."""
    from bazof_spark.sources.tables import source_tag
    tag = source_tag(sf_dir, "events")
    root = os.path.join(tempfile.gettempdir(), f"bazof_lakehouse_{tag}")
    marker = os.path.join(root, TABLE_NAME, "_BUILT")
    if not os.path.exists(marker):
        _build(spark, sf_dir, root)
        with open(marker, "w") as f:
            f.write("ok")
    return Lakehouse(spark, root)


KEYED_TABLE_NAME = "events_by_key"
_N_KEY_BUCKETS = 8


def events_key_clustered_lakehouse(spark: SparkSession, sf_dir: str) -> Lakehouse:
    """Key-clustered twin of ``events_versioned``: key =
    ``lpad(user_id, 6, '0')`` (lex order == numeric order) and the log
    split into ``_N_KEY_BUCKETS`` deltas by contiguous KEY range instead
    of by time. Each file's zone-map bounds (writer-recorded
    key_min/key_max) are then genuinely selective, so
    ``Lakehouse.scan(key_range=...)`` prunes most files at metadata
    time — the layout a real deployment gets from key-partitioned
    ingest or ``optimize_table(cluster_by=["key"])``."""
    from bazof_spark.sources.tables import source_tag

    tag = source_tag(sf_dir, "events")
    root = os.path.join(tempfile.gettempdir(), f"bazof_lakehouse_keyed_{tag}")
    marker = os.path.join(root, KEYED_TABLE_NAME, "_BUILT")
    if not os.path.exists(marker):
        _build_keyed(spark, sf_dir, root)
        with open(marker, "w") as f:
            f.write("ok")
    return Lakehouse(spark, root)


def _build_keyed(spark: SparkSession, sf_dir: str, root: str) -> None:
    from bazof_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    max_user = events.agg(F.max("user_id")).first()[0]
    keyed = events.select(
        F.lpad(F.col("user_id").cast("string"), 6, "0").alias("key"),
        F.col("ts").alias("event_time"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.col("value").cast("double").alias("value"),
        "props",
        F.col("user_id").alias("_uid"),
    )
    writer = TableWriter(
        spark, os.path.join(root, KEYED_TABLE_NAME), EVENTS_SCHEMA
    )
    seg = writer.add_segment("k1", _SEGMENT_START)
    span = max(1, (int(max_user) + _N_KEY_BUCKETS) // _N_KEY_BUCKETS)
    for i in range(_N_KEY_BUCKETS):
        lo_uid, hi_uid = span * i, span * (i + 1)
        chunk = keyed.filter(
            (F.col("_uid") >= lo_uid) & (F.col("_uid") < hi_uid)
        ).drop("_uid")
        if chunk.limit(1).count() == 0:
            continue
        # every bucket shares the segment's time range: precedence among
        # the siblings never matters (key sets are disjoint)
        seg.add_delta(
            chunk,
            start=_SEGMENT_START,
            end=_SEGMENT_START + timedelta(days=_DELTA_DAYS * _N_DELTAS),
            name=f"kbucket_{i}.parquet",
        )
    writer.commit()


def _materialize_events(
    spark: SparkSession, sf_dir: str, root: str, table_name: str
) -> None:
    """Shared events materialization: keyed projection, one segment,
    one time-sliced delta per _DELTA_DAYS window."""
    from bazof_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    keyed = events.select(
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").alias("event_time"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.col("value").cast("double").alias("value"),
        "props",
    )
    writer = TableWriter(spark, os.path.join(root, table_name), EVENTS_SCHEMA)
    seg = writer.add_segment("s1", _SEGMENT_START)
    for i in range(_N_DELTAS):
        lo = _SEGMENT_START + timedelta(days=_DELTA_DAYS * i)
        hi = lo + timedelta(days=_DELTA_DAYS)
        chunk = keyed.filter(
            (F.col("event_time") >= F.lit(lo)) & (F.col("event_time") < F.lit(hi))
        )
        if chunk.limit(1).count() == 0:
            continue
        seg.add_delta(chunk, start=lo, end=hi, name=f"delta_{i}.parquet")
    writer.commit()


def _build(spark: SparkSession, sf_dir: str, root: str) -> None:
    _materialize_events(spark, sf_dir, root, TABLE_NAME)


DELETED_TABLE_NAME = "events_deleted"
#: deletion instant: past every driver event timestamp, so Current
#: hides the deleted users while every in-range as-of still sees them
DELETE_AT = datetime(2024, 3, 1, tzinfo=timezone.utc)
DELETE_MODULUS = 7


def events_deleted_lakehouse(spark: SparkSession, sf_dir: str) -> Lakehouse:
    """``events_versioned`` clone with a tombstone DELETE applied: every
    user with ``user_id % DELETE_MODULUS == 0`` is deleted at
    ``DELETE_AT`` through ``writer.delete_keys`` (the DataFrame path —
    the key set never collects). Exercises the DELETE extension under
    the driver's DuckDB oracle."""
    from bazof_spark.sources.tables import source_tag

    tag = source_tag(sf_dir, "events")
    root = os.path.join(tempfile.gettempdir(), f"bazof_lakehouse_{tag}")
    marker = os.path.join(root, DELETED_TABLE_NAME, "_BUILT")
    if not os.path.exists(marker):
        _build_deleted(spark, sf_dir, root)
        with open(marker, "w") as f:
            f.write("ok")
    return Lakehouse(spark, root)


def _build_deleted(spark: SparkSession, sf_dir: str, root: str) -> None:
    from bazof_spark.sources.tables import load_table
    from bazof_spark.writer import delete_keys

    _materialize_events(spark, sf_dir, root, DELETED_TABLE_NAME)
    events = load_table(spark, sf_dir, "events")
    doomed = events.filter(
        F.col("user_id") % DELETE_MODULUS == 0
    ).select(F.col("user_id").cast("string").alias("key")).distinct()
    delete_keys(
        spark, os.path.join(root, DELETED_TABLE_NAME), doomed, at=DELETE_AT
    )

MERGE_DELETED_TABLE_NAME = "events_merge_deleted"
#: the MERGE ... WHEN MATCHED AND <pred> THEN DELETE under test: the
#: source matches every user_id % MERGE_DELETE_MODULUS == 0 key, and
#: the predicate narrows to rows whose CURRENT value is below the bound
MERGE_DELETE_MODULUS = 5
MERGE_DELETE_VALUE_BOUND = 100.0


def events_merge_deleted_lakehouse(spark: SparkSession, sf_dir: str) -> Lakehouse:
    """``events_versioned`` clone with a SQL MERGE-DELETE applied: the
    source is the modulus-matched key set, the WHEN MATCHED AND
    predicate keeps only keys whose Current value is under the bound —
    exercising the merge-delete statement (tombstones via the matched
    set) under the driver's DuckDB oracle."""
    from bazof_spark.sources.tables import source_tag

    tag = source_tag(sf_dir, "events")
    root = os.path.join(tempfile.gettempdir(), f"bazof_lakehouse_{tag}")
    marker = os.path.join(root, MERGE_DELETED_TABLE_NAME, "_BUILT")
    if not os.path.exists(marker):
        _materialize_events(spark, sf_dir, root, MERGE_DELETED_TABLE_NAME)
        lh = Lakehouse(spark, root)
        lh.sql(
            f"MERGE INTO {MERGE_DELETED_TABLE_NAME} USING "
            f"SELECT key FROM {MERGE_DELETED_TABLE_NAME} "
            f"WHERE CAST(key AS BIGINT) % {MERGE_DELETE_MODULUS} = 0 "
            f"ON key WHEN MATCHED AND value < {MERGE_DELETE_VALUE_BOUND} "
            "THEN DELETE"
        )
        with open(marker, "w") as f:
            f.write("ok")
    return Lakehouse(spark, root)


MERGE_MULTI_TABLE_NAME = "events_merge_multi"
#: the combined multi-clause MERGE under test (round 8): the source is
#: every user_id % MERGE_MULTI_MODULUS == 0 key re-emitted at
#: MERGE_MULTI_AT with value*10 / event_type 'merged', plus
#: MERGE_MULTI_N_SEEDS synthetic unmatched keys; clause list =
#: DELETE (value < DEL_BOUND) → UPDATE SET * (value < UPD_BOUND) →
#: INSERT * — first match wins per key, ONE atomic commit
MERGE_MULTI_MODULUS = 3
MERGE_MULTI_DEL_BOUND = 50.0
MERGE_MULTI_UPD_BOUND = 200.0
MERGE_MULTI_AT_SQL = "timestamp'2024-03-01 00:00:00'"
MERGE_MULTI_N_SEEDS = 3


def events_merge_multi_lakehouse(spark: SparkSession, sf_dir: str) -> Lakehouse:
    """``events_versioned`` clone with ONE multi-clause MERGE applied —
    the Delta-style combined statement (per-clause predicates over the
    target's CURRENT row, first match wins, unmatched source rows
    insert), compiled to a single snapshot (writer.merge_apply)."""
    from bazof_spark.sources.tables import source_tag

    tag = source_tag(sf_dir, "events")
    root = os.path.join(tempfile.gettempdir(), f"bazof_lakehouse_{tag}")
    marker = os.path.join(root, MERGE_MULTI_TABLE_NAME, "_BUILT")
    if not os.path.exists(marker):
        _materialize_events(spark, sf_dir, root, MERGE_MULTI_TABLE_NAME)
        lh = Lakehouse(spark, root)
        t = MERGE_MULTI_TABLE_NAME
        lh.sql(
            f"MERGE INTO {t} USING "
            f"SELECT key, {MERGE_MULTI_AT_SQL} AS event_time, event_id, "
            f"'merged' AS event_type, value * 10 AS value, props "
            f"FROM {t} WHERE CAST(key AS BIGINT) % {MERGE_MULTI_MODULUS} = 0 "
            "UNION ALL "
            f"SELECT CAST(900001 + id AS STRING), {MERGE_MULTI_AT_SQL}, "
            "CAST(-(1 + id) AS BIGINT), 'seed', CAST(1 + id AS DOUBLE), "
            f"CAST(NULL AS STRING) FROM range({MERGE_MULTI_N_SEEDS}) "
            "ON key "
            f"WHEN MATCHED AND value < {MERGE_MULTI_DEL_BOUND} THEN DELETE "
            f"WHEN MATCHED AND value < {MERGE_MULTI_UPD_BOUND} "
            "THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        with open(marker, "w") as f:
            f.write("ok")
    return Lakehouse(spark, root)


MERGE_BYSRC_TABLE_NAME = "events_merge_bysrc"
#: the WHEN NOT MATCHED BY SOURCE shape (round 8): source = every
#: user_id % MERGE_BYSRC_MODULUS == 0 key re-emitted at the merge
#: instant with value*2 / 'kept'; matched keys upsert, UNMATCHED target
#: keys with current value < MERGE_BYSRC_BOUND are deleted — the
#: sync-table-to-source statement, one atomic commit
MERGE_BYSRC_MODULUS = 4
MERGE_BYSRC_BOUND = 150.0


def events_merge_bysrc_lakehouse(spark: SparkSession, sf_dir: str) -> Lakehouse:
    """``events_versioned`` clone with a MERGE carrying WHEN MATCHED
    THEN UPDATE SET * + WHEN NOT MATCHED BY SOURCE AND <pred> THEN
    DELETE applied (writer.merge_apply — upsert delta + tombstone delta
    in one snapshot)."""
    from bazof_spark.sources.tables import source_tag

    tag = source_tag(sf_dir, "events")
    root = os.path.join(tempfile.gettempdir(), f"bazof_lakehouse_{tag}")
    marker = os.path.join(root, MERGE_BYSRC_TABLE_NAME, "_BUILT")
    if not os.path.exists(marker):
        _materialize_events(spark, sf_dir, root, MERGE_BYSRC_TABLE_NAME)
        lh = Lakehouse(spark, root)
        t = MERGE_BYSRC_TABLE_NAME
        lh.sql(
            f"MERGE INTO {t} USING "
            f"SELECT key, {MERGE_MULTI_AT_SQL} AS event_time, event_id, "
            f"'kept' AS event_type, value * 2 AS value, props "
            f"FROM {t} WHERE CAST(key AS BIGINT) % {MERGE_BYSRC_MODULUS} = 0 "
            "ON key "
            "WHEN MATCHED THEN UPDATE SET * "
            f"WHEN NOT MATCHED BY SOURCE AND value < {MERGE_BYSRC_BOUND} "
            "THEN DELETE"
        )
        with open(marker, "w") as f:
            f.write("ok")
    return Lakehouse(spark, root)


MERGE_BSUPD_TABLE_NAME = "events_merge_bsupd"
#: the BY SOURCE UPDATE shape (round 9): matched keys (user_id %
#: MERGE_BSUPD_MODULUS == 0) upsert the source row; UNMATCHED target
#: keys route first-match-wins through DELETE (current value <
#: MERGE_BSUPD_DEL_BOUND) then UPDATE SET value = value +
#: MERGE_BSUPD_BUMP / event_type 'aged' — the update rows commit at
#: the STATEMENT instant (dml_at, deterministic here)
MERGE_BSUPD_MODULUS = 5
MERGE_BSUPD_DEL_BOUND = 100.0
MERGE_BSUPD_BUMP = 1000.0
MERGE_BSUPD_AT = datetime(2024, 4, 1, tzinfo=timezone.utc)
MERGE_BSUPD_AT_SQL = "timestamp'2024-04-01 00:00:00'"


def events_merge_bsupd_lakehouse(spark: SparkSession, sf_dir: str) -> Lakehouse:
    """``events_versioned`` clone with a MERGE carrying the round-9
    WHEN NOT MATCHED BY SOURCE clause LIST (DELETE then UPDATE SET,
    first match wins per unmatched key) — one atomic commit; the
    by-source update rows are stamped at the statement instant via
    ``Lakehouse.sql(dml_at=…)``, the SQL twin of ``update(at=…)``."""
    from bazof_spark.sources.tables import source_tag

    tag = source_tag(sf_dir, "events")
    root = os.path.join(tempfile.gettempdir(), f"bazof_lakehouse_{tag}")
    marker = os.path.join(root, MERGE_BSUPD_TABLE_NAME, "_BUILT")
    if not os.path.exists(marker):
        _materialize_events(spark, sf_dir, root, MERGE_BSUPD_TABLE_NAME)
        lh = Lakehouse(spark, root)
        t = MERGE_BSUPD_TABLE_NAME
        lh.sql(
            f"MERGE INTO {t} USING "
            f"SELECT key, {MERGE_MULTI_AT_SQL} AS event_time, event_id, "
            f"'kept' AS event_type, value * 2 AS value, props "
            f"FROM {t} WHERE CAST(key AS BIGINT) % {MERGE_BSUPD_MODULUS} = 0 "
            "ON key "
            "WHEN MATCHED THEN UPDATE SET * "
            f"WHEN NOT MATCHED BY SOURCE AND value < {MERGE_BSUPD_DEL_BOUND} "
            "THEN DELETE "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET "
            f"value = value + {MERGE_BSUPD_BUMP}, event_type = 'aged'",
            dml_at=MERGE_BSUPD_AT,
        )
        with open(marker, "w") as f:
            f.write("ok")
    return Lakehouse(spark, root)


UPDATED_TABLE_NAME = "events_updated"
#: update instant: past every driver event timestamp, so the updated
#: versions win Current while every in-range as-of sees the originals
UPDATE_AT = datetime(2024, 3, 1, tzinfo=timezone.utc)
#: the UPDATE under test (Lakehouse.update — the SQL UPDATE statement
#: delegates to the same method): double the value and retag every
#: current 'click' row
UPDATE_SETS = {"value": "value * 2", "event_type": "'adj_click'"}
UPDATE_WHERE = "event_type = 'click'"


def events_updated_lakehouse(spark: SparkSession, sf_dir: str) -> Lakehouse:
    """``events_versioned`` clone with an UPDATE applied: every user
    whose Current row has ``event_type = 'click'`` gets value doubled
    and the type retagged at ``UPDATE_AT`` (Lakehouse.update — the
    matching set stays a DataFrame). Exercises the UPDATE extension
    under the driver's DuckDB oracle."""
    from bazof_spark.sources.tables import source_tag

    tag = source_tag(sf_dir, "events")
    root = os.path.join(tempfile.gettempdir(), f"bazof_lakehouse_{tag}")
    marker = os.path.join(root, UPDATED_TABLE_NAME, "_BUILT")
    if not os.path.exists(marker):
        _materialize_events(spark, sf_dir, root, UPDATED_TABLE_NAME)
        lh = Lakehouse(spark, root)
        assert lh.update(
            UPDATED_TABLE_NAME, UPDATE_SETS, where=UPDATE_WHERE, at=UPDATE_AT
        )
        with open(marker, "w") as f:
            f.write("ok")
    return Lakehouse(spark, root)
