"""Object-store dry run: the writer→metadata→scan loop on a NON-file
scheme, executed for real.

`$BAZOF_FS_EMULATE=s3` makes iofs serve `s3://bucket/key` from the
local filesystem at `$BAZOF_FS_EMULATE_ROOT/s3/bucket/key` (the bucket
authority is part of the mapping — distinct buckets never alias), so
every URI code branch — `is_uri` joins, the object-store single-PUT
branch of `replace_text`, FileSelector listings, existence probes, the
writer's filesystem-routed parquet writes — executes against a real
pyarrow FileSystem with only the transport swapped. Emulated PUTs are
atomic (temp+rename) like a real S3 PUT, and auto-create parent
prefixes like a real store (which has no directories). This is the
closest a network-less sandbox gets to an S3 integration run (the
reference runs on any object_store backend,
/root/reference/README.md:47); the remaining untested surface is the
real S3 client itself and the JVM-side Hadoop connector.

Because `iofs.emulated_mirror(uri)` exposes the backing local path, a
LOCAL-rooted Lakehouse can scan the table authored through s3:// URIs
and verify content.
"""

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row  # noqa: E402

from bazof_spark import Lakehouse, iofs  # noqa: E402
from bazof_spark.maintenance import validate_table  # noqa: E402
from bazof_spark.schema import ColumnDef, ColumnType, TableSchema  # noqa: E402
from bazof_spark.writer import TableWriter, append_delta  # noqa: E402

UTC = dt.timezone.utc


@pytest.fixture()
def s3_root(tmp_path, monkeypatch):
    monkeypatch.setenv("BAZOF_FS_EMULATE", "s3")
    monkeypatch.setenv("BAZOF_FS_EMULATE_ROOT", str(tmp_path))
    uri = "s3://test-bucket/lake"
    return uri, iofs.emulated_mirror(uri)


def test_bucket_authority_never_aliases(tmp_path, monkeypatch):
    """s3://bucket-a/p and s3://bucket-b/p are DIFFERENT objects — the
    bucket is part of the local mapping."""
    monkeypatch.setenv("BAZOF_FS_EMULATE", "s3")
    monkeypatch.setenv("BAZOF_FS_EMULATE_ROOT", str(tmp_path))
    iofs.write_text("s3://bucket-a/p/version.txt", "A")
    iofs.write_text("s3://bucket-b/p/version.txt", "B")
    assert iofs.read_text("s3://bucket-a/p/version.txt") == "A"
    assert iofs.read_text("s3://bucket-b/p/version.txt") == "B"
    assert iofs.emulated_mirror("s3://bucket-a/p") != iofs.emulated_mirror(
        "s3://bucket-b/p"
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(key=k, event_time=t, value=v) for k, t, v in rows]
    )


def test_iofs_primitives_on_s3_scheme(s3_root):
    uri, local = s3_root
    iofs.makedirs(iofs.join(uri, "meta"))
    p = iofs.join(uri, "meta", "version.txt")
    iofs.write_text(p, "1")
    assert iofs.read_text(p) == "1"
    # replace_text takes the object-store PUT branch (no temp+rename)
    iofs.replace_text(p, "2")
    assert iofs.read_text(p) == "2"
    assert iofs.exists(p)
    assert iofs.listdir(iofs.join(uri, "meta")) == ["version.txt"]
    # the bytes really live on the local mirror of the same path
    with open(os.path.join(local, "meta", "version.txt")) as f:
        assert f.read() == "2"
    iofs.move(p, iofs.join(uri, "meta", "v2.txt"))
    assert not iofs.exists(p)
    iofs.delete(iofs.join(uri, "meta", "v2.txt"))
    assert iofs.listdir(iofs.join(uri, "meta")) == []


def test_writer_scan_sql_loop_on_s3_scheme(spark, s3_root):
    uri, local = s3_root
    table_uri = iofs.join(uri, "t0")
    schema = TableSchema(
        columns=(
            ColumnDef(name="value", data_type=ColumnType.STRING, nullable=False),
        )
    )

    w = TableWriter(spark, table_uri, schema)
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    w.add_segment(
        "seg1",
        start=t0,
        base_df=_batch(spark, [("a", t0, "a1"), ("b", t0, "b1")]),
    )
    w.commit("1")
    assert iofs.read_text(iofs.join(table_uri, "version.txt")) == "1"

    # upsert through the s3 spelling: delta parquet written driver-side
    # through the iofs-resolved filesystem, snapshot + pointer PUT
    t1 = dt.datetime(2024, 2, 1, tzinfo=UTC)
    append_delta(
        spark, table_uri, _batch(spark, [("a", t1, "a2"), ("c", t1, "c1")])
    )
    assert iofs.read_text(iofs.join(table_uri, "version.txt")) == "2"
    assert iofs.exists(iofs.join(table_uri, "s2.json"))

    # metadata-side validation directly on the s3 root: before the iofs
    # existence fix this reported EVERY data file missing on URI roots
    s3_lh = Lakehouse(spark, uri)
    report = validate_table(s3_lh, "t0", data_checks=False)
    assert not [e for e in report.errors if "missing" in e], report.errors

    # the same bytes scan + SQL through the local mirror (the sandbox
    # JVM has no s3 connector; on a real cluster the s3 root scans too)
    lh = Lakehouse(spark, local)
    got = {r["key"]: r["value"] for r in lh.scan("t0").collect()}
    assert got == {"a": "a2", "b": "b1", "c": "c1"}
    early = {
        r["key"]: r["value"]
        for r in lh.sql(
            "SELECT key, value FROM t0 AT ('2024-01-15T00:00:00.000Z')"
        ).collect()
    }
    assert early == {"a": "a1", "b": "b1"}
    full_report = validate_table(lh, "t0")
    assert not full_report.errors, full_report.errors


def test_emulation_requires_optin(tmp_path, monkeypatch):
    """Without the env knob, s3:// still resolves through the REAL
    pyarrow backend — emulation never kicks in silently."""
    monkeypatch.delenv("BAZOF_FS_EMULATE", raising=False)
    from pyarrow.fs import LocalFileSystem

    fs, _rel = iofs.split(str(tmp_path))
    assert isinstance(fs, LocalFileSystem)
    # an s3 URI must NOT fall back to the local filesystem
    try:
        fs2, rel2 = iofs.split("s3://bucket/x")
    except Exception:
        return  # backend may refuse outright without credentials: fine
    assert not isinstance(fs2, LocalFileSystem)


def test_concurrent_writers_on_s3_scheme_lose_nothing(spark, s3_root):
    """Multi-writer stress on the EMULATED object-store scheme: with
    the mirror-locked conditional-put stand-in (commitguard.guard_for
    routes emulated schemes to a FileLockGuard on the local mirror),
    two racing writer threads must lose no committed delta — the same
    contract tests/test_upsert.py pins for local tables. On a real S3
    deployment this is the guard a conditional-put/DynamoDB LogStore
    implementation plugs into via register_commit_guard."""
    import threading

    from bazof_spark.writer import upsert_with_retry

    uri, local = s3_root
    table_uri = iofs.join(uri, "race")
    w = TableWriter(
        spark,
        table_uri,
        TableSchema(
            columns=(
                ColumnDef(name="value", data_type=ColumnType.STRING, nullable=False),
            )
        ),
    )
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    w.add_segment("s1", start=t0, base_df=_batch(spark, [("seed", t0, "s0")]))
    w.commit("1")

    n_each = 5
    errors: list[BaseException] = []

    def writer_thread(tag: str):
        try:
            for i in range(n_each):
                upsert_with_retry(
                    spark,
                    table_uri,
                    _batch(
                        spark,
                        [(f"{tag}{i}", dt.datetime(2024, 2, 1 + i, tzinfo=UTC),
                          f"v_{tag}{i}")],
                    ),
                    retries=50,
                )
        except BaseException as exc:
            errors.append(exc)

    threads = [
        threading.Thread(target=writer_thread, args=(t,)) for t in ("x", "y")
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # every commit survived: linear version chain, all 10 keys present
    assert iofs.read_text(iofs.join(table_uri, "version.txt")) == str(
        1 + 2 * n_each
    )
    lh = Lakehouse(spark, local)
    got = {r["key"]: r["value"] for r in lh.scan("race").collect()}
    for tag in ("x", "y"):
        for i in range(n_each):
            assert got.get(f"{tag}{i}") == f"v_{tag}{i}", (tag, i, got)
    # the guard released cleanly on the mirror
    assert not os.path.exists(
        os.path.join(iofs.emulated_mirror(table_uri), "version.txt.lock")
    )


def test_maintenance_on_s3_scheme(spark, s3_root):
    """restore / vacuum / evolve_table_schema now run on URI roots
    through iofs (they previously refused any '://' path). The full
    lifecycle executes on the s3 spelling: upsert → restore to v1 →
    vacuum the abandoned branch → evolve the schema."""
    from bazof_spark.maintenance import (
        evolve_table_schema,
        restore_table,
        vacuum_table,
    )
    from bazof_spark.schema import ColumnDef, ColumnType

    uri, local = s3_root
    table_uri = iofs.join(uri, "t1")
    w = TableWriter(
        spark,
        table_uri,
        TableSchema(
            columns=(
                ColumnDef(name="value", data_type=ColumnType.STRING, nullable=False),
            )
        ),
    )
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    w.add_segment("s1", start=t0, base_df=_batch(spark, [("a", t0, "a1")]))
    w.commit("1")
    t1 = dt.datetime(2024, 2, 1, tzinfo=UTC)
    append_delta(spark, table_uri, _batch(spark, [("a", t1, "a2")]))

    s3_lh = Lakehouse(spark, uri)
    restore_table(s3_lh, "t1", 1)  # re-publishes v1's content as v3
    assert iofs.read_text(iofs.join(table_uri, "version.txt")) == "3"

    # the restored branch abandoned s2's delta: vacuum collects it
    # min_age_s=0: the abandoned branch's files are seconds old and no
    # writer is live; production keeps the retention window
    res = vacuum_table(s3_lh, "t1", keep_versions=1, min_age_s=0)
    assert res["removed_snapshots"], res
    assert any(f.endswith(".parquet") for f in res["removed_files"]), res

    evolve_table_schema(
        s3_lh,
        "t1",
        add=[ColumnDef(name="note", data_type=ColumnType.STRING, nullable=True)],
    )
    assert iofs.read_text(iofs.join(table_uri, "version.txt")) == "4"

    # scan the surviving state through the local mirror
    lh = Lakehouse(spark, local)
    rows = lh.scan("t1").collect()
    assert [(r["key"], r["value"], r["note"]) for r in rows] == [("a", "a1", None)]


def test_cli_stats_on_s3_scheme(spark, s3_root, capsys):
    """The no-Spark-session `stats` subcommand resolves s3:// roots
    through iofs like every other metadata read — and the writer's
    commit-time blooms round-trip through the object-store branch."""
    from bazof_spark.cli import main

    uri, _local = s3_root
    table_uri = iofs.join(uri, "t0")
    schema = TableSchema(
        columns=(
            ColumnDef(name="value", data_type=ColumnType.STRING, nullable=False),
        )
    )
    w = TableWriter(spark, table_uri, schema)
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    w.add_segment(
        "seg1",
        start=t0,
        base_df=_batch(spark, [("a", t0, "a1"), ("b", t0, "b1")]),
    )
    w.commit("1")
    assert main(["stats", "--path", uri, "--table", "t0"]) == 0
    out = capsys.readouterr().out
    assert "version 1" in out
    assert "1 with key bounds" in out and "1 with blooms" in out


def test_delete_keys_on_s3_scheme(spark, s3_root):
    """Tombstone DELETE through the emulated object-store spelling: the
    tombstone delta PUTs through iofs, the flagged snapshot publishes
    through the staged commit path, and the scan (via the local mirror
    — the sandbox JVM has no s3 connector) hides the key with full
    time-travel consistency."""
    uri, local = s3_root
    table_uri = iofs.join(uri, "td")
    schema = TableSchema(
        columns=(
            ColumnDef(name="value", data_type=ColumnType.STRING, nullable=False),
        )
    )
    w = TableWriter(spark, table_uri, schema)
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    w.add_segment(
        "seg1",
        start=t0,
        base_df=_batch(spark, [("a", t0, "a1"), ("b", t0, "b1")]),
    )
    w.commit("1")

    from bazof_spark.writer import delete_keys

    t1 = dt.datetime(2024, 2, 1, tzinfo=UTC)
    snap = delete_keys(spark, table_uri, ["a"], at=t1)
    assert len(snap.tombstone_files()) == 1
    assert iofs.read_text(iofs.join(table_uri, "version.txt")) == "2"

    lh = Lakehouse(spark, local)
    assert {r["key"] for r in lh.scan("td").collect()} == {"b"}
    assert {
        r["key"]
        for r in lh.scan("td", as_of="2024-01-15T00:00:00.000Z").collect()
    } == {"a", "b"}
    report = validate_table(Lakehouse(spark, uri), "td", data_checks=False)
    assert not report.errors, report.errors


def test_widen_and_rename_on_s3_scheme(spark, s3_root):
    """Schema evolution on an object-store root: RENAME is metadata-only
    (iofs snapshot PUT), WIDEN's file rewrite routes every read/write
    through the iofs seam — both must work on URI table paths, not just
    local directories."""
    import pyspark.sql.functions as F
    from pyspark.sql import Row

    from bazof_spark.maintenance import evolve_table_schema, validate_table
    from bazof_spark.schema import ColumnType

    uri, local = s3_root
    table_uri = iofs.join(uri, "ev")
    schema = TableSchema(
        columns=(ColumnDef(name="n", data_type=ColumnType.INT, nullable=False),)
    )
    w = TableWriter(spark, table_uri, schema)
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    w.add_segment(
        "s1",
        start=t0,
        base_df=spark.createDataFrame(
            [Row(key="a", event_time=t0, n=1), Row(key="b", event_time=t0, n=2)]
        ).withColumn("n", F.col("n").cast("bigint")),
    )
    w.commit("1")

    s3_lh = Lakehouse(spark, uri)
    evolve_table_schema(s3_lh, "ev", rename={"n": "qty"})
    evolve_table_schema(s3_lh, "ev", widen={"qty": ColumnType.FLOAT})
    # metadata-side validation on the URI root stays clean (rewritten
    # files exist at their URI paths)
    report = validate_table(s3_lh, "ev", data_checks=False)
    assert not report.errors, report.errors
    # scan through the mirror: values survived rename + cast
    lh = Lakehouse(spark, iofs.emulated_mirror(uri))
    got = {r["key"]: r["qty"] for r in lh.scan("ev").collect()}
    assert got == {"a": 1.0, "b": 2.0}
    assert dict(lh.scan("ev").dtypes)["qty"] == "double"


def test_distributed_multifile_delta_on_s3_scheme(spark, s3_root):
    """Round-9: distributed multi-file writes take the executor-side
    iofs staging branch on ANY object-store URI — under emulation the
    same branch lands in the local mirror (env snapshot forwarded into
    the task closure, since workers inherit the JVM's launch-time env,
    not the driver's current one)."""
    import datetime as dt

    from bazof_spark.writer import TableWriter, append_delta
    from bazof_spark.schema import ColumnDef, ColumnType, TableSchema

    uri, _mirror = s3_root
    table_uri = iofs.join(uri, "dist")
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    schema = TableSchema(
        (ColumnDef("value", ColumnType.STRING, nullable=False),)
    )
    w = TableWriter(spark, table_uri, schema)
    seg = w.add_segment("s1", start=t0)
    big = _batch(
        spark, [(str(i), t0, f"v{i}") for i in range(60)]
    )
    seg.add_delta_distributed(
        big, start=t0, end=t0 + dt.timedelta(days=1), num_files=3
    )
    snap = w.commit("1")
    assert len(snap.get_data_files()) == 3
    append_delta(
        spark,
        table_uri,
        _batch(spark, [("7", t0 + dt.timedelta(days=2), "updated")]),
        distributed=True,
        num_files=2,
    )
    from bazof_spark import Lakehouse

    got = {
        r["key"]: r["value"]
        for r in Lakehouse(spark, uri).scan("dist").collect()
    }
    assert len(got) == 60 and got["7"] == "updated" and got["3"] == "v3"
    assert not [
        n for n in iofs.listdir(table_uri) if "_stage" in n
    ]
