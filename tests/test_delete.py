"""DELETE (tombstone) extension: writer.delete_keys / SQL DELETE FROM.

The format is append-only merge-by-key (crates/azof/src/lakehouse.rs:
40-79); deletes are our Delta-Lake-style extension expressed INSIDE
those semantics — a tombstone delta competes in the merge like any
newer version, and a winning tombstone hides its key instead of
surfacing. Invariants under test: time-travel consistency (instants
before the delete still see the row), resurrection by later upsert,
point-lookup pruning agreement, Data-Source read parity, CDF delete
rows, checkpoint/restore/validate compatibility, and zero impact on
delete-free tables (reference snapshots have no tombstone flag).
"""

import os
import sys
from datetime import datetime, timezone

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark import Lakehouse  # noqa: E402
from bazof_spark.metadata import Delta  # noqa: E402
from bazof_spark.schema import ColumnDef, ColumnType, TableSchema  # noqa: E402
from bazof_spark.writer import TableWriter, delete_keys  # noqa: E402


def ts(m, d=1):
    return datetime(2024, m, d, tzinfo=timezone.utc)


SCHEMA = TableSchema((ColumnDef("value", ColumnType.STRING, False),))


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, t, v) for k, t, v in rows], SCHEMA.to_struct_type()
    )


@pytest.fixture()
def lh(spark, tmp_path):
    w = TableWriter(spark, str(tmp_path / "t"), SCHEMA)
    w.add_segment(
        "s1",
        ts(1),
        base_df=_df(
            spark,
            [("a", ts(1), "a1"), ("b", ts(1), "b1"), ("c", ts(1), "c1")],
        ),
    )
    w.commit()
    lh = Lakehouse(spark, str(tmp_path))
    lh.upsert("t", _df(spark, [("a", ts(2), "a2")]))
    return lh


def _state(lh, **kw):
    return {
        r["key"]: r["value"] for r in lh.scan("t", **kw).collect()
    }


def test_delta_tombstone_json_roundtrip():
    d = Delta(file="f.parquet", start=ts(3), end=ts(3), tombstone=True)
    j = d.to_json()
    assert j["tombstone"] is True
    assert Delta.from_json(j).tombstone
    # absent flag (reference-authored snapshots) parses False
    j2 = Delta(file="g.parquet", start=ts(3), end=ts(3)).to_json()
    assert "tombstone" not in j2
    assert not Delta.from_json(j2).tombstone


def test_delete_scan_semantics_time_travel_and_resurrection(spark, lh):
    table_path = lh.table("t").path
    delete_keys(spark, table_path, ["a"], at=ts(3))

    # Current and post-delete instants hide the key
    assert _state(lh) == {"b": "b1", "c": "c1"}
    assert _state(lh, as_of=ts(3)) == {"b": "b1", "c": "c1"}
    # instants BEFORE the delete still see the old versions
    assert _state(lh, as_of=ts(2, 15)) == {"a": "a2", "b": "b1", "c": "c1"}
    assert _state(lh, as_of=ts(1, 15)) == {"a": "a1", "b": "b1", "c": "c1"}

    # point lookups agree with the full scan (zone-map/bloom pruning
    # must keep the tombstone file for its key)
    assert {r["key"] for r in lh.scan("t", keys=["a"]).collect()} == set()
    assert {r["key"] for r in lh.scan("t", keys=["b"]).collect()} == {"b"}

    # a LATER upsert resurrects the key
    lh.upsert("t", _df(spark, [("a", ts(4), "a4")]))
    assert _state(lh) == {"a": "a4", "b": "b1", "c": "c1"}
    assert _state(lh, as_of=ts(3, 15)) == {"b": "b1", "c": "c1"}

    from bazof_spark.maintenance import validate_table

    validate_table(lh, "t").raise_if_invalid()


def test_delete_matches_datasource_read(spark, lh):
    from bazof_spark.datasource import read_table

    delete_keys(spark, lh.table("t").path, ["b"], at=ts(3))
    for as_of in (None, "2024-03-01T00:00:00.000Z", "2024-01-15T00:00:00.000Z"):
        native = lh.scan("t", as_of=as_of)
        via = read_table(spark, lh.root, "t", as_of=as_of)
        assert sorted(map(tuple, via.select(*native.columns).collect())) == sorted(
            map(tuple, native.collect())
        ), as_of


def test_sql_delete_and_cdf(spark, lh):
    v_before = int(lh.table("t").current_version())
    [st] = lh.sql("DELETE FROM t WHERE value = 'a2'").collect()
    assert st["operation"] == "delete"
    assert int(st["version"]) == v_before + 1

    assert {r["key"] for r in lh.sql("SELECT key FROM t").collect()} == {
        "b", "c",
    }
    # the change feed reports the delete (early values, null late side):
    # early = an instant after every upsert but before the delete
    # (SQL DELETE stamps 'now'), late = Current
    feed = lh.scan_changes("t", since="2025-01-01T00:00:00.000Z").collect()
    changes = {r["key"]: r["change_type"] for r in feed}
    assert changes == {"a": "delete"}
    [row] = feed
    assert row["value_early"] == "a2" and row["value_late"] is None
    assert row["event_time_late"] is None

    # DELETE without WHERE empties the table; history remains readable
    lh.sql("DELETE FROM t")
    assert lh.sql("SELECT key FROM t").count() == 0
    assert _state(lh, version=v_before) == {
        "a": "a2", "b": "b1", "c": "c1",
    }


def test_no_match_delete_is_a_noop(spark, lh):
    """A DELETE whose predicate matches zero keys must NOT publish an
    empty tombstone delta: that would permanently flip a delete-free
    table to delete-capable (raw schema gains _tombstone, running
    streams fail fast) without removing any row."""
    v_before = lh.table("t").current_version()
    [st] = lh.sql("DELETE FROM t WHERE key = 'nonexistent'").collect()
    assert st["operation"] == "delete"
    assert lh.table("t").current_version() == v_before
    assert lh.table("t").get_current_snapshot().tombstone_files() == frozenset()
    assert _state(lh) == {"a": "a2", "b": "b1", "c": "c1"}

    # direct DataFrame path: same no-op, returns the current snapshot
    empty = lh.sql("SELECT key FROM t WHERE key = 'zzz'")
    snap = delete_keys(spark, lh.table("t").path, empty, at=ts(3))
    assert snap.tombstone_files() == frozenset()
    assert lh.table("t").current_version() == v_before

    # the iterable path is the SAME documented no-op — both input forms
    # of the same logical request (delete nothing) behave identically
    snap = delete_keys(spark, lh.table("t").path, [], at=ts(3))
    assert snap.tombstone_files() == frozenset()
    assert lh.table("t").current_version() == v_before


def test_checkpoint_and_restore_preserve_deletes(spark, lh):
    table_path = lh.table("t").path
    delete_keys(spark, table_path, ["c"], at=ts(3))
    before_cur = _state(lh)
    before_t2 = _state(lh, as_of=ts(2, 15))
    v_del = lh.table("t").current_version()

    from bazof_spark.maintenance import checkpoint_table, restore_table, validate_table

    checkpoint_table(lh, "t", at=ts(5))
    assert _state(lh) == before_cur  # deleted key absent from the base
    assert _state(lh, as_of=ts(2, 15)) == before_t2  # history intact
    assert _state(lh, as_of=ts(6)) == before_cur
    validate_table(lh, "t").raise_if_invalid()

    restore_table(lh, "t", v_del)
    assert _state(lh) == before_cur


def test_tombstone_files_tracked_in_snapshot(spark, lh):
    table_path = lh.table("t").path
    assert lh.table("t").get_current_snapshot().tombstone_files() == frozenset()
    snap = delete_keys(spark, table_path, ["a"], at=ts(3))
    tomb = snap.tombstone_files()
    assert len(tomb) == 1
    # the flag survives the JSON round trip
    reread = lh.table("t").get_current_snapshot()
    assert reread.tombstone_files() == tomb


def test_raw_load_carries_tombstone_marker(spark, lh):
    """Delete-capable tables expose _tombstone on the raw source load
    (constant per file, like _rank); delete-free tables keep the
    historical schema."""
    from bazof_spark.datasource import BazofDataSource

    spark.dataSource.register(BazofDataSource)

    def raw():
        return (
            spark.read.format("bazof")
            .option("path", lh.root)
            .option("table", "t")
            .load()
        )

    assert "_tombstone" not in raw().columns  # no deletes yet
    delete_keys(spark, lh.table("t").path, ["a"], at=ts(3))
    df = raw()
    assert "_tombstone" in df.columns
    marked = {(r["key"], r["_tombstone"]) for r in df.collect()}
    assert ("a", True) in marked          # the tombstone row
    assert ("a", False) in marked         # the original versions
    assert ("b", True) not in marked


def _deltas_only_lh(spark, tmp_path, name="ts"):
    """Base-less table (deltas only): replaying a stream from version 0
    needs version 1 to be delta-only (a base file reads as a rewrite —
    the same shape the events materialization uses)."""
    w = TableWriter(spark, str(tmp_path / name), SCHEMA)
    seg = w.add_segment("s1", ts(1))
    seg.add_delta(
        _df(spark, [("a", ts(1), "a1"), ("b", ts(1), "b1")]),
        start=ts(1),
        end=ts(2),
    )
    w.commit()
    lh = Lakehouse(spark, str(tmp_path))
    lh.upsert(name, _df(spark, [("a", ts(2), "a2")]))
    return lh


def test_stream_reads_tombstone_versions_marked(spark, tmp_path):
    """readStream from version 0 over a history containing a delete:
    the tombstone rows arrive marked, and folding latest-state with
    latest_wins_ordering('stream') + the marker equals the batch scan."""
    from pyspark.sql import functions as F

    from bazof_spark.datasource import BazofDataSource
    from bazof_spark.ordering import latest_wins_ordering

    spark.dataSource.register(BazofDataSource)
    lh = _deltas_only_lh(spark, tmp_path)
    delete_keys(spark, lh.table("ts").path, ["a"], at=ts(3))

    stream = (
        spark.readStream.format("bazof")
        .option("path", lh.root)
        .option("table", "ts")
        .option("startingVersion", "0")
        .load()
    )
    out = str(tmp_path / "sink")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert "_tombstone" in got.columns
    assert got.filter("_tombstone").count() == 1  # exactly the delete row

    payload = F.struct("event_time", "value", "_tombstone")
    folded = (
        got.groupBy("key")
        .agg(F.max_by(payload, latest_wins_ordering("stream")).alias("_w"))
        .filter(~F.col("_w._tombstone"))
        .select("key", "_w.value")
    )
    batch = {r["key"]: r["value"] for r in lh.scan("ts").collect()}
    assert {r["key"]: r["value"] for r in folded.collect()} == batch


def test_stream_started_before_first_delete_fails_fast(spark, tmp_path):
    """A stream whose schema predates the table's first tombstone must
    refuse the delete version loudly (restart contract), never deliver
    deleted keys as unmarked null rows."""
    from bazof_spark.datasource import BazofDataSource

    spark.dataSource.register(BazofDataSource)
    lh = _deltas_only_lh(spark, tmp_path)
    stream = (
        spark.readStream.format("bazof")
        .option("path", lh.root)
        .option("table", "ts")
        .option("startingVersion", "0")
        .load()
    )
    assert "_tombstone" not in stream.columns  # schema fixed pre-delete
    delete_keys(spark, lh.table("ts").path, ["a"], at=ts(3))
    q = (
        stream.writeStream.format("memory")
        .queryName("predelete_stream")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="_tombstone|tombstone"):
        q.awaitTermination(120)


def test_stream_ignore_deletes_skips_tombstone_files(spark, tmp_path):
    """.option('ignoreDeletes','true'): a pre-delete-schema stream
    skips tombstone files instead of failing (Delta's ignoreDeletes
    contract) — appends still deliver."""
    from bazof_spark.datasource import BazofDataSource

    spark.dataSource.register(BazofDataSource)
    lh = _deltas_only_lh(spark, tmp_path)
    stream = (
        spark.readStream.format("bazof")
        .option("path", lh.root)
        .option("table", "ts")
        .option("startingVersion", "0")
        .option("ignoreDeletes", "true")
        .load()
    )
    assert "_tombstone" not in stream.columns
    delete_keys(spark, lh.table("ts").path, ["a"], at=ts(3))
    out = str(tmp_path / "sink_id")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_id"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # every append row delivered, tombstone rows skipped
    assert got.count() == 3  # a1, b1, a2
    assert {r["key"] for r in got.collect()} == {"a", "b"}


def test_stream_mixed_merge_version_delivers_both_effects(spark, tmp_path):
    """writer.merge_apply publishes a MIXED version — a data delta AND
    a tombstone delta in one snapshot (the atomic multi-clause MERGE,
    round 8). The stream source plans per FILE, so (a) a post-merge
    stream delivers both the upserted row and the marked tombstone row
    from that single version, and (b) a pre-delete-schema stream with
    ignoreDeletes skips ONLY the tombstone file — the same version's
    data delta still streams (a wholesale version skip would silently
    drop committed upserts)."""
    from pyspark.sql import functions as F

    from bazof_spark.datasource import BazofDataSource
    from bazof_spark.ordering import latest_wins_ordering
    from bazof_spark.writer import merge_apply

    spark.dataSource.register(BazofDataSource)
    lh = _deltas_only_lh(spark, tmp_path)
    # pre-merge stream handle: schema fixed BEFORE the first tombstone
    pre = (
        spark.readStream.format("bazof")
        .option("path", lh.root)
        .option("table", "ts")
        .option("startingVersion", "0")
        .option("ignoreDeletes", "true")
        .load()
    )
    assert "_tombstone" not in pre.columns

    v0 = lh.table("ts").current_version()
    merge_apply(
        spark,
        lh.table("ts").path,
        upsert_df=_df(spark, [("c", ts(4), "c1")]),
        delete_keys_df=spark.createDataFrame([("a",)], "key string"),
        at=ts(3),
        expected_version=v0,
    )
    assert int(lh.table("ts").current_version()) == int(v0) + 1

    # (a) post-merge stream: both effects of the mixed version arrive
    stream = (
        spark.readStream.format("bazof")
        .option("path", lh.root)
        .option("table", "ts")
        .option("startingVersion", "0")
        .load()
    )
    out = str(tmp_path / "sink_mixed")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck_mixed"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.filter("_tombstone").count() == 1  # the delete of 'a'
    assert got.filter("key = 'c' AND NOT _tombstone").count() == 1
    payload = F.struct("event_time", "value", "_tombstone")
    folded = (
        got.groupBy("key")
        .agg(F.max_by(payload, latest_wins_ordering("stream")).alias("_w"))
        .filter(~F.col("_w._tombstone"))
        .select("key", "_w.value")
    )
    batch = {r["key"]: r["value"] for r in lh.scan("ts").collect()}
    assert {r["key"]: r["value"] for r in folded.collect()} == batch

    # (b) pre-delete-schema stream + ignoreDeletes: the mixed version's
    # DATA delta still delivers; only the tombstone file is skipped
    out2 = str(tmp_path / "sink_pre")
    q2 = (
        pre.writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", str(tmp_path / "ck_pre"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out2)
    assert {r["key"] for r in got2.collect()} == {"a", "b", "c"}
    assert got2.filter("key = 'c'").count() == 1
