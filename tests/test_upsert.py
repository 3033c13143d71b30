"""Incremental upsert (append_delta) + streaming upsert sink tests.

The write path the reference roadmaps (README.md:152 writers,
README.md:158 streaming scan): each batch/micro-batch becomes one delta
file + one snapshot version, and every historical version stays
queryable via as-of / snapshot-version travel.
"""

import os
from datetime import datetime, timezone

import pytest

from bazof_spark.errors import BazofError
from bazof_spark.lakehouse import Lakehouse
from bazof_spark.maintenance import validate_table
from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
from bazof_spark.streaming.sink import upsert_sink
from bazof_spark.writer import TableWriter, append_delta


def ts(y, m, d, h=0):
    return datetime(y, m, d, h, tzinfo=timezone.utc)


SCHEMA = TableSchema((ColumnDef("value", ColumnType.STRING, False),))


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, t, v) for k, t, v in rows], SCHEMA.to_struct_type()
    )


def _seed_table(spark, root):
    w = TableWriter(spark, f"{root}/t", SCHEMA)
    w.add_segment(
        "10",
        ts(2024, 1, 1),
        base_df=_df(
            spark,
            [("1", ts(2024, 1, 1), "a1"), ("2", ts(2024, 1, 1), "b1")],
        ),
    )
    w.commit()
    return Lakehouse(spark, root)


def _current(lh, **kw):
    return sorted(
        tuple(r) for r in lh.scan("t", **kw).select("key", "value").collect()
    )


def test_upsert_bumps_version_and_wins_current(spark, tmp_path):
    lh = _seed_table(spark, str(tmp_path))
    lh.upsert("t", _df(spark, [("1", ts(2024, 2, 1), "a2"), ("3", ts(2024, 2, 2), "c1")]))

    assert lh.table("t").current_version() == "2"
    assert _current(lh) == [("1", "a2"), ("2", "b1"), ("3", "c1")]
    # snapshot-version travel still sees the pre-upsert state
    assert _current(lh, version=1) == [("1", "a1"), ("2", "b1")]
    # as-of before the upsert's event times also does
    assert _current(lh, as_of=ts(2024, 1, 15)) == [("1", "a1"), ("2", "b1")]
    validate_table(lh, "t").raise_if_invalid()


def test_upsert_chain_and_late_data(spark, tmp_path):
    lh = _seed_table(spark, str(tmp_path))
    lh.upsert("t", _df(spark, [("1", ts(2024, 3, 1), "a3")]))
    # late batch: event times BEFORE the previous delta's — its delta
    # sorts beneath (start DESC), so the newer version still wins Current
    lh.upsert("t", _df(spark, [("1", ts(2024, 2, 1), "a2-late")]))

    assert lh.table("t").current_version() == "3"
    assert _current(lh) == [("1", "a3"), ("2", "b1")]
    # …but as-of between the two instants surfaces the late row
    assert _current(lh, as_of=ts(2024, 2, 15)) == [("1", "a2-late"), ("2", "b1")]
    validate_table(lh, "t").raise_if_invalid()


def test_upsert_distributed_multifile(spark, tmp_path):
    lh = _seed_table(spark, str(tmp_path))
    rows = [(str(k), ts(2024, 4, 1 + k % 20), f"v{k}") for k in range(200)]
    lh.upsert("t", _df(spark, rows), distributed=True, num_files=4)

    snap = lh.table("t").get_current_snapshot()
    files = [d.file for d in snap.segments[-1].delta]
    assert len(files) == 4
    got = dict(_current(lh))
    assert got["7"] == "v7" and got["199"] == "v199" and len(got) == 200
    validate_table(lh, "t").raise_if_invalid()


def test_upsert_no_open_segment(spark, tmp_path):
    root = str(tmp_path)
    w = TableWriter(spark, f"{root}/t", SCHEMA)
    w.add_segment(  # CLOSED segment only
        "10",
        ts(2024, 1, 1),
        end=ts(2024, 6, 1),
        base_df=_df(spark, [("1", ts(2024, 1, 1), "a1")]),
    )
    w.commit()
    lh = Lakehouse(spark, root)
    with pytest.raises(BazofError, match="no open top-level segment"):
        lh.upsert("t", _df(spark, [("1", ts(2024, 7, 1), "a2")]))
    lh.upsert(
        "t", _df(spark, [("1", ts(2024, 7, 1), "a2")]), create_segment=True
    )
    assert _current(lh) == [("1", "a2")]
    # the closed segment is invisible to Current (metadata.rs:75-86) but
    # as-of inside its range still reads it
    assert _current(lh, as_of=ts(2024, 2, 1)) == [("1", "a1")]


def test_upsert_rejects_duplicate_pairs_and_empty(spark, tmp_path):
    lh = _seed_table(spark, str(tmp_path))
    dup = _df(
        spark,
        [("1", ts(2024, 5, 1), "x"), ("1", ts(2024, 5, 1), "y")],
    )
    with pytest.raises(BazofError, match="duplicate"):
        lh.upsert("t", dup)
    with pytest.raises(BazofError, match="empty batch"):
        lh.upsert("t", _df(spark, []))


def test_upsert_composes_with_checkpoint(spark, tmp_path):
    """upsert → checkpoint → upsert: the post-checkpoint delta lands in
    the checkpoint's new open segment, Current reflects everything, and
    pre-checkpoint as-of reads stay bit-identical (the maintenance
    module's guarantee must survive subsequent writes)."""
    from bazof_spark.maintenance import checkpoint_table

    lh = _seed_table(spark, str(tmp_path))
    lh.upsert("t", _df(spark, [("1", ts(2024, 2, 1), "a2")]))
    before = _current(lh, as_of=ts(2024, 1, 15))

    checkpoint_table(lh, "t", at=ts(2024, 6, 1))
    n_files_current = len(
        lh.table("t").get_current_snapshot().get_data_files()
    )
    assert n_files_current == 1  # Current collapsed to the merged base

    lh.upsert("t", _df(spark, [("2", ts(2024, 7, 1), "b2"), ("9", ts(2024, 7, 2), "z1")]))
    assert _current(lh) == [("1", "a2"), ("2", "b2"), ("9", "z1")]
    # pre-checkpoint history unchanged after the write
    assert _current(lh, as_of=ts(2024, 1, 15)) == before
    assert _current(lh, as_of=ts(2024, 2, 15)) == [("1", "a2"), ("2", "b1")]
    validate_table(lh, "t").raise_if_invalid()


def test_scan_is_snapshot_isolated_from_later_upserts(spark, tmp_path):
    """A DataFrame built before an upsert keeps reading its snapshot's
    file list after the commit — the atomic version.txt flip publishes
    for NEW scans only (the reference's read protocol: resolve pointer
    first, crates/azof/src/table.rs:16-41)."""
    lh = _seed_table(spark, str(tmp_path))
    pinned = lh.scan("t")
    lh.upsert("t", _df(spark, [("1", ts(2024, 2, 1), "a2")]))
    got = sorted(
        tuple(r) for r in pinned.select("key", "value").collect()
    )
    assert got == [("1", "a1"), ("2", "b1")]  # pre-upsert state
    assert _current(lh) == [("1", "a2"), ("2", "b1")]  # fresh scan sees it


def test_upsert_after_schema_evolution_nullfills(spark, tmp_path):
    """A producer written before evolve_table_schema keeps working: the
    batch lacking the added nullable column is null-filled; a batch
    carrying it writes real values."""
    from pyspark.sql import functions as F

    from bazof_spark.maintenance import evolve_table_schema
    from bazof_spark.schema import ColumnDef, ColumnType

    lh = _seed_table(spark, str(tmp_path))
    evolve_table_schema(
        lh, "t", add=[ColumnDef("score", ColumnType.INT, nullable=True)]
    )
    # old-producer batch: no `score` column
    lh.upsert("t", _df(spark, [("1", ts(2024, 2, 1), "a2")]))
    # new-producer batch: carries score
    new = _df(spark, [("3", ts(2024, 2, 2), "c1")]).withColumn(
        "score", F.lit(7).cast("long")
    )
    lh.upsert("t", new)

    got = {
        r["key"]: (r["value"], r["score"])
        for r in lh.scan("t").select("key", "value", "score").collect()
    }
    assert got == {"1": ("a2", None), "2": ("b1", None), "3": ("c1", 7)}
    validate_table(lh, "t").raise_if_invalid()


def test_streaming_upsert_sink(spark, tmp_path):
    root = str(tmp_path)
    lh = _seed_table(spark, root)

    # stage a file-source stream with two event batches
    src = os.path.join(root, "incoming")
    _df(spark, [("1", ts(2024, 2, 1), "a2"), ("4", ts(2024, 2, 2), "d1")]).write.mode(
        "append"
    ).parquet(src)
    _df(spark, [("2", ts(2024, 3, 1), "b2")]).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA.to_struct_type())
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        upsert_sink(stream, f"{root}/t", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert _current(lh) == [("1", "a2"), ("2", "b2"), ("4", "d1")]
    assert int(lh.table("t").current_version()) >= 2
    validate_table(lh, "t").raise_if_invalid()
    # history preserved: before the stream's event times
    assert _current(lh, as_of=ts(2024, 1, 15)) == [("1", "a1"), ("2", "b1")]


def test_commit_conflict_detected_and_retry_succeeds(spark, tmp_path):
    """Optimistic concurrency: a version pointer moved by a concurrent
    writer between snapshot read and publish must raise
    CommitConflictError (not silently drop the other commit), and
    upsert_with_retry must succeed by re-deriving from the new
    snapshot."""
    from bazof_spark.errors import CommitConflictError
    from bazof_spark.metadata import Snapshot
    from bazof_spark.writer import _publish_snapshot, upsert_with_retry

    lh = _seed_table(spark, str(tmp_path))
    table = lh.table("t")
    stale_version = table.current_version()
    stale_snapshot = table.get_current_snapshot()

    # concurrent writer lands a commit (pointer moves 1 → 2)
    append_delta(
        spark, table.path, _df(spark, [("3", ts(2024, 1, 2), "c1")])
    )
    assert table.current_version() != stale_version

    # publishing a snapshot derived from the stale version must refuse
    with pytest.raises(CommitConflictError):
        _publish_snapshot(
            table.path,
            stale_version,
            "9",
            Snapshot(
                segments=stale_snapshot.segments,
                schema=stale_snapshot.schema,
            ),
        )
    # the refused publish left no partial state behind
    assert not os.path.exists(os.path.join(table.path, "s9.json"))
    assert table.current_version() == "2"

    # retry loop: plain sequential use never false-positives, and the
    # result includes every committed row
    upsert_with_retry(
        spark, table.path, _df(spark, [("4", ts(2024, 1, 3), "d1")])
    )
    assert _current(lh) == [
        ("1", "a1"), ("2", "b1"), ("3", "c1"), ("4", "d1"),
    ]


def test_commit_delta_files_retries_on_conflict(spark, tmp_path):
    """A concurrent commit that moves the version pointer between this
    commit's read and publish must trigger a re-derive + re-publish of
    the SAME moved files — both commits' rows survive."""
    from datetime import datetime, timezone
    from unittest import mock

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bazof_spark import Lakehouse, writer as W
    from bazof_spark.datasource import write_table

    root = str(tmp_path)

    def mk(keys, iso, value):
        t = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
        return spark.createDataFrame(
            [(k, t, float(value)) for k in keys],
            "key string, event_time timestamp, value double",
        )

    write_table(mk(["a"], "2024-01-01", 1), root, "t", mode="overwrite")
    tdir = tmp_path / "t"

    # stage one parquet by hand (what a DS write task produces)
    staged = tdir / "_stage_x" / "p.parquet"
    staged.parent.mkdir()
    pq.write_table(
        pa.table(
            {
                "key": ["b"],
                "event_time": pa.array(
                    [datetime(2024, 2, 1)], pa.timestamp("us", "UTC")
                ),
                "value": [2.0],
            }
        ),
        str(staged),
    )

    real_publish = W._publish_snapshot
    fired = {"n": 0}

    def racing_publish(*args, **kwargs):
        if fired["n"] == 0:
            fired["n"] += 1
            # competing writer wins the pointer first
            write_table(mk(["c"], "2024-03-01", 3), root, "t", mode="append")
        return real_publish(*args, **kwargs)

    start = datetime(2024, 2, 1, tzinfo=timezone.utc)
    with mock.patch.object(W, "_publish_snapshot", side_effect=racing_publish):
        W.commit_delta_files(str(tdir), [str(staged)], start, start)

    got = {
        r["key"]: r["value"] for r in Lakehouse(spark, root).scan("t").collect()
    }
    assert got == {"a": 1.0, "b": 2.0, "c": 3.0}
    assert fired["n"] == 1  # conflict happened exactly once


def test_concurrent_upserts_lose_nothing(spark, tmp_path):
    """Two writer threads race 6 commits each through upsert_with_retry.
    The local-FS commit lock (writer._commit_lock) makes the pointer
    check→flip a real CAS and the O_EXCL delta-name reservation stops
    same-name clobbering, so EVERY committed delta must survive: all 12
    keys present, version advanced exactly 12 times, snapshot chain
    linear, validation clean."""
    import threading

    from bazof_spark.writer import upsert_with_retry

    lh = _seed_table(spark, str(tmp_path))
    table_path = f"{tmp_path}/t"
    n_each = 6
    errors: list[BaseException] = []

    def writer_thread(tag: str):
        try:
            for i in range(n_each):
                upsert_with_retry(
                    spark,
                    table_path,
                    _df(spark, [(f"{tag}{i}", ts(2024, 2, 1 + i), f"v_{tag}{i}")]),
                    retries=50,
                )
        except BaseException as exc:  # surface in the main thread
            errors.append(exc)

    threads = [
        threading.Thread(target=writer_thread, args=(t,)) for t in ("x", "y")
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    assert lh.table("t").current_version() == str(1 + 2 * n_each)
    got = dict(_current(lh))
    for tag in ("x", "y"):
        for i in range(n_each):
            assert got.get(f"{tag}{i}") == f"v_{tag}{i}", (tag, i, got)
    report = validate_table(lh, "t")
    assert not report.errors, report.errors
    # no lock file left behind
    assert not os.path.exists(os.path.join(table_path, "version.txt.lock"))


def test_stale_commit_lock_is_broken(spark, tmp_path):
    """A lock file abandoned by a crashed writer must not wedge the
    table: the first publish attempt conflicts (and breaks the stale
    lock), the retry loop then commits normally."""
    import time as _time

    from bazof_spark.writer import upsert_with_retry

    lh = _seed_table(spark, str(tmp_path))
    table_path = f"{tmp_path}/t"
    lock = os.path.join(table_path, "version.txt.lock")
    open(lock, "w").close()
    old = _time.time() - 3600
    os.utime(lock, (old, old))

    upsert_with_retry(
        spark, table_path, _df(spark, [("9", ts(2024, 3, 1), "z1")]), retries=3
    )
    assert lh.table("t").current_version() == "2"
    assert ("9", "z1") in _current(lh)
    assert not os.path.exists(lock)


def test_fresh_foreign_lock_conflicts_cleanly(spark, tmp_path):
    """A RECENT lock (another writer mid-commit) raises
    CommitConflictError without being broken."""
    from bazof_spark.errors import CommitConflictError
    from bazof_spark.writer import append_delta as _append

    _seed_table(spark, str(tmp_path))
    table_path = f"{tmp_path}/t"
    lock = os.path.join(table_path, "version.txt.lock")
    open(lock, "w").close()
    with pytest.raises(CommitConflictError, match="lock held"):
        _append(spark, table_path, _df(spark, [("9", ts(2024, 3, 1), "z1")]))
    assert os.path.exists(lock)  # not stolen from a live writer


def test_append_delta_casts_to_declared_types(spark, tmp_path):
    """A batch carrying SQL-flavored types (DECIMAL literal, int where
    the schema says Int64-as-string here) must be cast to the DECLARED
    column types at write: an uncast delta's divergent parquet type
    would break every later explicit-schema scan until RESTORE."""
    from pyspark.sql import functions as F

    from bazof_spark import Lakehouse
    from bazof_spark.writer import append_delta

    lh = _seed_table(spark, str(tmp_path))
    # value column is declared String; hand it an INT batch
    bad = spark.createDataFrame(
        [("9", ts(2024, 2, 1), 123)],
        "key string, event_time timestamp, value int",
    )
    append_delta(spark, f"{tmp_path}/t", bad, create_segment=True)
    got = dict(_current(lh))
    assert got["9"] == "123"  # cast to the declared String
    # and a DECIMAL into a declared-String column also round-trips
    dec = spark.createDataFrame(
        [("8", ts(2024, 2, 2))], "key string, event_time timestamp"
    ).select("key", "event_time", F.lit(1.5).cast("decimal(3,1)").alias("value"))
    append_delta(spark, f"{tmp_path}/t", dec)
    assert dict(_current(lh))["8"] == "1.5"


def test_evolve_races_upserts_without_loss(spark, tmp_path):
    """Schema evolution publishes through the same CAS as data commits:
    a RENAME racing a stream of upserts must neither lose a committed
    delta nor publish a half-applied schema. The evolve side retries on
    conflict (it is metadata-only, so re-deriving is re-running); the
    upsert side uses the standard retry loop. Afterwards: schema is
    renamed, every upsert's key is present, validation is clean."""
    import threading

    from bazof_spark.errors import CommitConflictError
    from bazof_spark.maintenance import evolve_table_schema, validate_table
    from bazof_spark.writer import upsert_with_retry

    lh = _seed_table(spark, str(tmp_path))
    table_path = f"{tmp_path}/t"
    n_each = 5
    errors: list[BaseException] = []

    def writer_thread():
        try:
            for i in range(n_each):
                upsert_with_retry(
                    spark,
                    table_path,
                    _df(spark, [(f"w{i}", ts(2024, 2, 1 + i), f"v{i}")]),
                    retries=50,
                )
        except BaseException as exc:
            errors.append(exc)

    def evolve_thread():
        try:
            for attempt in range(50):
                try:
                    evolve_table_schema(lh, "t", rename={"value": "val2"})
                    return
                except CommitConflictError:
                    continue
            raise AssertionError("evolve never committed")
        except BaseException as exc:
            errors.append(exc)

    threads = [
        threading.Thread(target=writer_thread),
        threading.Thread(target=evolve_thread),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    snap = lh.table("t").get_current_snapshot()
    assert [c.name for c in snap.schema.columns] == ["val2"]
    assert "value" in snap.schema.former_names()
    got = {r["key"]: r["val2"] for r in lh.scan("t").collect()}
    for i in range(n_each):
        assert got.get(f"w{i}") == f"v{i}", (i, got)
    report = validate_table(lh, "t")
    assert not report.errors, report.errors


def test_append_accepts_former_column_spelling(spark, tmp_path):
    """After a RENAME, a producer still shipping the former column name
    keeps working: the writer maps it to the declared name (files store
    the new spelling). A batch with BOTH spellings errors loudly."""
    from bazof_spark import Lakehouse
    from bazof_spark.maintenance import evolve_table_schema
    from bazof_spark.writer import append_delta

    lh = _seed_table(spark, str(tmp_path))
    evolve_table_schema(lh, "t", rename={"value": "val2"})
    # old producer: schema still says 'value'
    append_delta(spark, f"{tmp_path}/t", _df(spark, [("9", ts(2024, 2, 1), "v9")]))
    got = {r["key"]: r["val2"] for r in lh.scan("t").collect()}
    assert got["9"] == "v9"
    both = spark.createDataFrame(
        [("x", ts(2024, 3, 1), "a", "b")],
        "key string, event_time timestamp, value string, val2 string",
    )
    with pytest.raises(BazofError, match="ambiguous"):
        append_delta(spark, f"{tmp_path}/t", both)


def test_append_rejects_two_former_spellings(spark, tmp_path):
    """A twice-renamed column has TWO former spellings; a batch carrying
    both (old producer shipping value AND val2 after value→val2→val3)
    is as ambiguous as declared+former — it must error loudly, not remap
    the first and silently drop the second in the final select."""
    from bazof_spark.maintenance import evolve_table_schema
    from bazof_spark.writer import append_delta

    lh = _seed_table(spark, str(tmp_path))
    evolve_table_schema(lh, "t", rename={"value": "val2"})
    evolve_table_schema(lh, "t", rename={"val2": "val3"})
    both_formers = spark.createDataFrame(
        [("x", ts(2024, 3, 1), "a", "b")],
        "key string, event_time timestamp, value string, val2 string",
    )
    with pytest.raises(BazofError, match="former spellings"):
        append_delta(spark, f"{tmp_path}/t", both_formers)
    # exactly ONE former spelling still remaps fine after two renames
    append_delta(
        spark, f"{tmp_path}/t", _df(spark, [("9", ts(2024, 2, 1), "v9")])
    )
    got = {r["key"]: r["val3"] for r in lh.scan("t").collect()}
    assert got["9"] == "v9"


def test_evolve_rejects_rename_target_colliding_with_add(spark, tmp_path):
    """evolve(add=[X], rename={Y:X}) used to pass both per-list guards
    and commit a snapshot with two 'X' columns, breaking every later
    scan until RESTORE. Both the explicit guard and the TableSchema
    duplicate-name invariant must refuse it — and the table must stay
    readable at its pre-statement version."""
    from bazof_spark.maintenance import evolve_table_schema
    from bazof_spark.schema import ColumnDef, ColumnType

    lh = _seed_table(spark, str(tmp_path))
    before = {r["key"]: r["value"] for r in lh.scan("t").collect()}
    with pytest.raises(BazofError, match="collides with a column added"):
        evolve_table_schema(
            lh,
            "t",
            add=[ColumnDef("x", ColumnType.INT, True)],
            rename={"value": "x"},
        )
    # no corrupt snapshot landed
    assert {r["key"]: r["value"] for r in lh.scan("t").collect()} == before


def test_table_schema_rejects_duplicate_names():
    """The duplicate-name invariant holds at TableSchema construction —
    no caller can serialize a snapshot whose schema is ambiguous."""
    from bazof_spark.errors import MetadataError
    from bazof_spark.schema import ColumnDef, ColumnType, TableSchema

    with pytest.raises(MetadataError, match="duplicate column name"):
        TableSchema(
            (
                ColumnDef("x", ColumnType.INT, True),
                ColumnDef("x", ColumnType.STRING, True),
            )
        )


def test_merge_apply_atomic_single_version(spark, tmp_path):
    """writer.merge_apply: upsert rows AND tombstones land in ONE
    snapshot (one version bump, both effects visible together), empty
    inputs are a version no-op, and a moved pointer raises
    CommitConflictError before anything is written."""
    from bazof_spark.errors import CommitConflictError
    from bazof_spark.writer import merge_apply

    lh = _seed_table(spark, str(tmp_path))
    path = f"{tmp_path}/t"
    v0 = lh.table("t").current_version()
    snap = merge_apply(
        spark,
        path,
        upsert_df=_df(spark, [("3", ts(2024, 2, 1), "c1")]),
        delete_keys_df=spark.createDataFrame([("1",)], "key string"),
        expected_version=v0,
    )
    v1 = lh.table("t").current_version()
    assert int(v1) == int(v0) + 1  # ONE commit for both effects
    assert _current(lh) == [("2", "b1"), ("3", "c1")]
    # both delta files are in the SAME snapshot
    files = snap.get_data_files()
    assert len(files) == len(
        lh.table("t").get_snapshot(v0).get_data_files()
    ) + 2
    # time travel: pre-merge version intact
    assert _current(lh, version=v0) == [("1", "a1"), ("2", "b1")]

    # empty inputs: version no-op (and never flips delete-capable)
    assert merge_apply(
        spark,
        path,
        upsert_df=_df(spark, []),
        delete_keys_df=spark.createDataFrame([], "key string"),
    ) is not None
    assert lh.table("t").current_version() == v1

    # stale expected_version: conflict, nothing committed
    with pytest.raises(CommitConflictError):
        merge_apply(
            spark,
            path,
            upsert_df=_df(spark, [("9", ts(2024, 3, 1), "z")]),
            expected_version=v0,
        )
    assert lh.table("t").current_version() == v1
