"""Multi-PROCESS concurrent-writer serializability stress: N separate
OS processes (own JVMs, real O_EXCL file-lock contention — not
threads sharing one lock object) upsert OVERLAPPING keys through
``upsert_with_retry``, then the snapshot chain is proven to be a
serializable history:

- the chain is LINEAR: versions contiguous, each commit's returned
  version unique;
- NO LOST UPDATE: every commit's delta appears in exactly one version
  diff and survives into the final snapshot;
- every intermediate version is readable and as-of scans are
  bit-stable across the chain: reading at each commit's instant
  returns exactly that commit's values for the contended keys.

Conflict model (documented in README): optimistic concurrency — the
commit lock only serializes the version-pointer CAS; writers that
lose re-read, re-derive, retry. Overlap resolution is the format's
own precedence (newest event_time wins; ties by file precedence), so
a 'lost update' can only mean a dropped delta, which this test rules
out."""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark import Lakehouse  # noqa: E402
from bazof_spark.maintenance import validate_table  # noqa: E402
from bazof_spark.table import Table  # noqa: E402

N_PROCS = 3
N_COMMITS = 3  # per process
HOT_KEYS = [f"k{i}" for i in range(6)]  # every commit rewrites all six

_WORKER = r"""
import json, sys
proc, n_commits, table_path, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
from datetime import datetime, timedelta, timezone
from bazof_spark.session import get_spark
from bazof_spark.writer import upsert_with_retry

spark = get_spark(app_name=f"stress-w{proc}", shuffle_partitions=2)
T0 = datetime(2024, 8, 1, tzinfo=timezone.utc)
hot = %r
versions = []
for it in range(n_commits):
    seq = it * %d + proc  # globally unique instant per commit
    at = T0 + timedelta(minutes=seq)
    tag = f"p{proc}_i{it}"
    rows = [(k, at, f"{tag}:{k}") for k in hot] + [(tag, at, tag)]
    df = spark.createDataFrame(rows, "key string, event_time timestamp, value string")
    snap_version = upsert_with_retry(
        spark, table_path, df, retries=200
    )
    versions.append(seq)
with open(out_path, "w") as f:
    json.dump({"proc": proc, "seqs": versions}, f)
""" % (HOT_KEYS, N_PROCS)


@pytest.fixture(scope="module")
def stressed(spark, tmp_path_factory):
    """Seed a table, then let N_PROCS real processes race commits."""
    from datetime import datetime, timezone

    from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
    from bazof_spark.writer import TableWriter

    root = str(tmp_path_factory.mktemp("stress"))
    table_path = os.path.join(root, "t")
    t0 = datetime(2024, 7, 1, tzinfo=timezone.utc)
    w = TableWriter(
        spark,
        table_path,
        TableSchema((ColumnDef("value", ColumnType.STRING, False),)),
    )
    seg = w.add_segment("s1", t0)
    seg.add_delta(
        spark.createDataFrame(
            [(k, t0, "seed") for k in HOT_KEYS],
            "key string, event_time timestamp, value string",
        ),
        t0,
        t0,
    )
    w.commit()

    procs = []
    for p in range(N_PROCS):
        out = os.path.join(root, f"w{p}.json")
        procs.append(
            (
                subprocess.Popen(
                    [
                        sys.executable,
                        "-c",
                        _WORKER,
                        str(p),
                        str(N_COMMITS),
                        table_path,
                        out,
                    ],
                    cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    stdout=subprocess.PIPE,
                    stderr=subprocess.PIPE,
                ),
                out,
            )
        )
    results = []
    for proc, out in procs:
        _, err = proc.communicate(timeout=420)
        assert proc.returncode == 0, err.decode()[-2000:]
        with open(out) as f:
            results.append(json.load(f))
    return root, table_path, results


def test_chain_is_linear_with_no_lost_commit(spark, stressed):
    root, table_path, results = stressed
    total = N_PROCS * N_COMMITS
    t = Table(path=table_path, name="t")
    assert t.current_version() == str(1 + total)
    # every version diff introduces EXACTLY the one racing commit's
    # delta, and every (proc, iter) tag lands exactly once
    import pyarrow.parquet as pq

    seen_tags = []
    for v in range(2, 2 + total):
        prev = {
            d.file for s in t.get_snapshot(str(v - 1)).segments for s_d in [s] for d in s_d.delta
        }
        new = [
            d.file
            for s in t.get_snapshot(str(v)).segments
            for d in s.delta
            if d.file not in prev
        ]
        assert len(new) == 1, (v, new)
        rows = pq.read_table(os.path.join(table_path, new[0])).to_pylist()
        tags = {r["value"] for r in rows if r["key"] not in HOT_KEYS}
        assert len(tags) == 1
        seen_tags.append(tags.pop())
    assert sorted(seen_tags) == sorted(
        f"p{p}_i{i}" for p in range(N_PROCS) for i in range(N_COMMITS)
    )


def test_every_version_readable_and_asof_bit_stable(spark, stressed):
    """Replay the chain: version v's Current state must equal the
    serial application of commits 1..v-1 (newest event_time wins), and
    the FINAL version's as-of scan at each commit instant must return
    exactly that commit's values — time travel is bit-stable however
    interleaved the writers were."""
    from datetime import datetime, timedelta, timezone

    root, table_path, results = stressed
    lh = Lakehouse(spark, root)
    total = N_PROCS * N_COMMITS
    T0 = datetime(2024, 8, 1, tzinfo=timezone.utc)

    # map each version to its commit tag by reading the chain once
    import pyarrow.parquet as pq

    t = Table(path=table_path, name="t")
    tag_by_version = {}
    for v in range(2, 2 + total):
        prev = {
            d.file for s in t.get_snapshot(str(v - 1)).segments for d in s.delta
        }
        (new,) = [
            d.file
            for s in t.get_snapshot(str(v)).segments
            for d in s.delta
            if d.file not in prev
        ]
        rows = pq.read_table(os.path.join(table_path, new)).to_pylist()
        (tag,) = {r["value"] for r in rows if r["key"] not in HOT_KEYS}
        tag_by_version[v] = tag

    def seq_of(tag):
        p, i = tag[1:].split("_i")
        return int(i) * N_PROCS + int(p)

    # every intermediate version readable; hot keys show the commit
    # with the max instant among those applied up to that version
    for v in range(1, 2 + total):
        got = {
            r["key"]: r["value"]
            for r in lh.scan("t", version=str(v)).collect()
        }
        applied = [tag_by_version[x] for x in range(2, v + 1)]
        if applied:
            winner = max(applied, key=seq_of)
            for k in HOT_KEYS:
                assert got[k] == f"{winner}:{k}", (v, k)
        else:
            assert all(got[k] == "seed" for k in HOT_KEYS)
        for tag in applied:  # marker keys accumulate, never vanish
            assert got[tag] == tag
    # as-of at each commit instant on the FINAL version: exactly that
    # commit's hot values (it has the max event_time <= the instant)
    for tag in tag_by_version.values():
        at = T0 + timedelta(minutes=seq_of(tag))
        got = {
            r["key"]: r["value"]
            for r in lh.scan("t", as_of=at.strftime("%Y-%m-%dT%H:%M:%S.000Z")).collect()
        }
        for k in HOT_KEYS:
            assert got[k] == f"{tag}:{k}", (tag, k)
    report = validate_table(lh, "t")
    assert not report.errors, report.errors
    # no lock debris
    assert not os.path.exists(os.path.join(table_path, "version.txt.lock"))
