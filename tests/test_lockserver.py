"""Out-of-process CAS commit guard (bazof_spark/lockserver.py): the
registry seam carrying a REAL network lock service, not the in-process
file-lock emulation. The server runs as a separate Python process;
every assertion below crosses a socket.

Covers: acquire/verify/release semantics over the wire, token-verified
stale takeover (the survivor's verify() fails — the lost-update guard),
release-by-token (a stale-broken holder's release can't remove the
successor's lock), per-resource independence, unreachable-server
behavior (clean conflict, never an unguarded publish), and the
multi-writer stress contract: two threads racing commits on an
emulated-s3 table THROUGH the out-of-process guard lose nothing.
"""

import datetime as dt
import os
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.errors import CommitConflictError  # noqa: E402
from bazof_spark.lockserver import (  # noqa: E402
    LockServerGuard,
    register_lockserver_guard,
)

UTC = dt.timezone.utc


@pytest.fixture(scope="module")
def server():
    """The lock server as a genuinely separate OS process."""
    proc = subprocess.Popen(
        [sys.executable, "-m", "bazof_spark.lockserver", "--port", "0"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = proc.stdout.readline().strip()
    assert line.startswith("PORT "), line
    port = int(line.split()[1])
    yield ("127.0.0.1", port)
    proc.terminate()
    proc.wait(timeout=10)


def test_acquire_verify_release_over_the_wire(server):
    host, port = server
    g = LockServerGuard(host, port, "t1")
    held = g.acquire()
    held.verify()
    # a second writer conflicts while held
    with pytest.raises(CommitConflictError, match="concurrent writer"):
        LockServerGuard(host, port, "t1").acquire()
    held.release()
    held.release()  # idempotent
    # free again after release
    LockServerGuard(host, port, "t1").acquire().release()


def test_resources_are_independent(server):
    host, port = server
    a = LockServerGuard(host, port, "s3://bucket/table_a").acquire()
    b = LockServerGuard(host, port, "s3://bucket/table_b").acquire()
    a.verify()
    b.verify()
    a.release()
    b.release()


def test_stale_takeover_fails_survivor_verify(server):
    """The lost-update litmus over the network: A acquires, stalls past
    the stale window; B's acquire takes over (CAS on the server); A's
    verify() before its pointer flip must fail — A can never overwrite
    B's publish."""
    host, port = server
    a = LockServerGuard(host, port, "t_stale", stale_after=0.2).acquire()
    time.sleep(0.4)
    b = LockServerGuard(host, port, "t_stale", stale_after=0.2).acquire()
    with pytest.raises(CommitConflictError, match="broken as stale"):
        a.verify()
    # A's release is token-verified server-side: B's lock survives it
    a.release()
    b.verify()
    b.release()


def test_fresh_lock_not_stolen(server):
    host, port = server
    a = LockServerGuard(host, port, "t_fresh", stale_after=60).acquire()
    with pytest.raises(CommitConflictError):
        LockServerGuard(host, port, "t_fresh", stale_after=60).acquire()
    a.verify()  # still ours — conflict never broke a fresh lock
    a.release()


def test_unreachable_server_is_a_conflict_not_unguarded(server):
    """If the service is down, publishes must FAIL CLOSED (conflict →
    retry), never proceed unguarded."""
    g = LockServerGuard("127.0.0.1", 1, "t")  # port 1: nothing listens
    with pytest.raises(CommitConflictError, match="unreachable"):
        g.acquire()


def test_cli_lock_server_flag_routes_commits(spark, tmp_path, server):
    """--lock-server HOST:PORT on the CLI registers the out-of-process
    guard for the root's scheme: with a live server the upsert commits;
    pointed at a dead port the commit FAILS CLOSED (proof the flag
    actually routes the publish window through the server)."""
    import pyspark.sql.functions as F

    from bazof_spark import cli
    from bazof_spark.commitguard import register_commit_guard
    from bazof_spark.lakehouse import Lakehouse
    from bazof_spark.writer import TableWriter
    from bazof_spark.schema import ColumnDef, ColumnType, TableSchema

    host, port = server
    root = f"file://{tmp_path}/lake"
    schema = TableSchema((ColumnDef("value", ColumnType.STRING, False),))
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    w = TableWriter(spark, f"{root}/t", schema)
    w.add_segment(
        "s1",
        start=t0,
        base_df=spark.createDataFrame(
            [("a", t0, "a1")], schema.to_struct_type()
        ),
    )
    w.commit("1")
    csv = tmp_path / "batch.csv"
    csv.write_text("b,2024-02-01T00:00:00,b1\n")
    try:
        # live server: commit succeeds through the network guard
        rc = cli.main([
            "--lock-server", f"{host}:{port}",
            "upsert", "--path", root, "--table", "t",
            "--file", str(csv),
        ])
        assert rc == 0
        lh = Lakehouse(spark, root)
        assert {r["key"] for r in lh.scan("t").collect()} == {"a", "b"}

        # dead server: the publish must fail closed, not fall back to
        # an unguarded (or file-lock) commit
        csv2 = tmp_path / "batch2.csv"
        csv2.write_text("c,2024-03-01T00:00:00,c1\n")
        with pytest.raises(Exception, match="unreachable|conflict|lock"):
            cli.main([
                "--lock-server", "127.0.0.1:1",
                "upsert", "--path", root, "--table", "t",
                "--file", str(csv2),
            ])
        assert "c" not in {r["key"] for r in lh.scan("t").collect()}
    finally:
        register_commit_guard("file", None)
    with pytest.raises(SystemExit, match="bad --lock-server"):
        cli.main(["--lock-server", "nope", "scan", "--path", str(tmp_path),
                  "--table", "t"])


def test_concurrent_writers_through_lockserver_lose_nothing(
    spark, tmp_path, monkeypatch, server
):
    """The multi-writer stress contract (tests/test_upsert.py /
    test_object_store_emulation.py) holds when the commit guard is the
    OUT-OF-PROCESS server: registry precedence routes every emulated-s3
    publish through the network CAS, and two racing writers lose no
    committed delta."""
    import threading

    from bazof_spark import iofs
    from bazof_spark.commitguard import guard_for, register_commit_guard
    from bazof_spark.lakehouse import Lakehouse
    from bazof_spark.maintenance import validate_table
    from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
    from bazof_spark.writer import TableWriter, upsert_with_retry

    host, port = server
    monkeypatch.setenv("BAZOF_FS_EMULATE", "s3")
    monkeypatch.setenv("BAZOF_FS_EMULATE_ROOT", str(tmp_path / "mirror"))
    register_lockserver_guard("s3", host, port)
    try:
        uri = f"s3://lockserver-race{tmp_path.name}/root"
        table_uri = iofs.join(uri, "t")
        # registry precedence: the scheme now resolves to the server
        assert isinstance(guard_for(table_uri), LockServerGuard)

        schema = TableSchema(
            (ColumnDef("value", ColumnType.STRING, False),)
        )
        t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
        w = TableWriter(spark, table_uri, schema)
        w.add_segment(
            "s1",
            start=t0,
            base_df=spark.createDataFrame(
                [("seed", t0, "s0")], schema.to_struct_type()
            ),
        )
        w.commit("1")

        n_each = 5
        errors: list[BaseException] = []

        def writer_thread(tag: str):
            try:
                for i in range(n_each):
                    upsert_with_retry(
                        spark,
                        table_uri,
                        spark.createDataFrame(
                            [(
                                f"{tag}{i}",
                                dt.datetime(2024, 2, 1 + i, tzinfo=UTC),
                                f"v_{tag}{i}",
                            )],
                            schema.to_struct_type(),
                        ),
                        retries=50,
                    )
            except BaseException as exc:
                errors.append(exc)

        threads = [
            threading.Thread(target=writer_thread, args=(t,))
            for t in ("x", "y")
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors

        # pointer/metadata checks on the s3 spelling; the parquet scan
        # reads the same bytes through the local mirror (the sandbox
        # JVM has no s3 connector — same device as the emulation suite)
        s3_lh = Lakehouse(spark, uri)
        assert s3_lh.table("t").current_version() == str(1 + 2 * n_each)
        lh = Lakehouse(spark, iofs.emulated_mirror(uri))
        got = {
            r["key"]: r["value"] for r in lh.scan("t").collect()
        }
        for tag in ("x", "y"):
            for i in range(n_each):
                assert got.get(f"{tag}{i}") == f"v_{tag}{i}", (tag, i, got)
        report = validate_table(lh, "t")
        assert not report.errors, report.errors
    finally:
        register_commit_guard("s3", None)
