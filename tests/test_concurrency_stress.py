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


_CKPT_WORKER = r"""
import os, sys, time
from datetime import datetime, timedelta, timezone
from bazof_spark.session import get_spark
from bazof_spark import Lakehouse
from bazof_spark.maintenance import checkpoint_table
from bazof_spark.errors import CommitConflictError
root, out = sys.argv[1], sys.argv[2]
spark = get_spark(app_name="stress-ckpt", shuffle_partitions=2)
lh = Lakehouse(spark, root)
T0 = datetime(2024, 8, 1, tzinfo=timezone.utc)

def wait_version(n, timeout_s=240):
    # genuine interleaving: don't checkpoint until the writers have
    # actually landed commits to race against
    deadline = time.time() + timeout_s
    ptr = os.path.join(root, "t", "version.txt")
    while time.time() < deadline:
        try:
            if int(open(ptr).read().strip()) >= n:
                return
        except (OSError, ValueError):
            pass
        time.sleep(0.2)

done = 0
for k, min_version in ((0, 3), (1, 6)):
    wait_version(min_version)
    for attempt in range(300):
        try:
            checkpoint_table(lh, "t", at=T0 + timedelta(hours=1 + k))
            done += 1
            break
        except CommitConflictError:
            time.sleep(0.05)
with open(out, "w") as f:
    f.write(str(done))
"""


@pytest.fixture(scope="module")
def ckpt_stressed(spark, tmp_path_factory):
    """The thread-level checkpoint-vs-upserts race
    (tests/test_maintenance.py) across REAL PROCESSES: two writer
    JVMs commit overlapping keys while a third process runs
    checkpoint_table through the same commit CAS. This is the
    interleaving the once-seen full-suite flake implicated
    (ROUND_NOTES_r12.md); at process granularity the lock contention
    is the production shape."""
    from datetime import datetime, timezone

    from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
    from bazof_spark.writer import TableWriter

    root = str(tmp_path_factory.mktemp("ckptstress"))
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

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for p in range(2):
        out = os.path.join(root, f"w{p}.json")
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, "-c", _WORKER, str(p), str(N_COMMITS),
                     table_path, out],
                    cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                ),
                out,
            )
        )
    ck_out = os.path.join(root, "ckpt.txt")
    ck = subprocess.Popen(
        [sys.executable, "-c", _CKPT_WORKER, root, ck_out],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    for proc, _ in procs:
        _, err = proc.communicate(timeout=420)
        assert proc.returncode == 0, err.decode()[-2000:]
    _, err = ck.communicate(timeout=420)
    assert ck.returncode == 0, err.decode()[-2000:]
    return root, table_path, ck_out


def _all_data_files(snapshot):
    out = set()

    def walk(seg):
        for sub in seg.segments:
            walk(sub)
        for d in seg.delta:
            out.add((d.file, d.tombstone))
        if seg.file is not None:
            out.add((seg.file, False))

    for s in snapshot.segments:
        walk(s)
    return out


def test_checkpoints_race_writer_processes_loses_nothing(
    spark, ckpt_stressed
):
    """Interleaving-INDEPENDENT serializability properties (the as-of
    view of a commit whose event_time precedes an already-published
    checkpoint's `at` is legitimately frozen — see
    test_late_write_after_checkpoint_semantics in test_maintenance.py
    — so per-commit as-of assertions would encode a race):
    every writer commit and both checkpoints present exactly once in
    the chain; each version's CURRENT state equals the serial replay
    of the writer commits applied up to it; markers accumulate and
    never vanish; validation clean, no lock debris."""
    import pyarrow.parquet as pq

    root, table_path, ck_out = ckpt_stressed
    assert open(ck_out).read() == "2"  # both checkpoints won a round
    t = Table(path=table_path, name="t")
    current = int(t.current_version())
    # 1 seed + 6 writer commits + 2 checkpoints
    assert current == 9
    assert any(
        s.id.startswith("checkpoint_")
        for s in t.get_current_snapshot().segments
    )

    # classify each version: a checkpoint adds a checkpoint_* base,
    # a writer commit adds exactly one ordinary delta file
    def seq_of(tag):
        # _WORKER spaces instants as seq = i * N_PROCS + p (N_PROCS
        # is 3 regardless of how many writers this fixture launches)
        p, i = tag[1:].split("_i")
        return int(i) * N_PROCS + int(p)

    tag_by_version = {}
    for v in range(2, current + 1):
        prev = _all_data_files(t.get_snapshot(str(v - 1)))
        new = [
            f
            for f, tomb in _all_data_files(t.get_snapshot(str(v))) - prev
        ]
        if any(f.endswith("_base.parquet") for f in new):
            continue  # a checkpoint version: compacted base, no new
            # data (writer deltas inside a post-checkpoint segment
            # inherit the segment's checkpoint_* NAME prefix, so the
            # base suffix — not the prefix — is the classifier)
        assert len(new) == 1, (v, new)
        rows = pq.read_table(os.path.join(table_path, new[0])).to_pylist()
        (tag,) = {r["value"] for r in rows if r["key"] not in HOT_KEYS}
        tag_by_version[v] = tag
    tags = [f"p{p}_i{i}" for p in range(2) for i in range(N_COMMITS)]
    assert sorted(tag_by_version.values()) == sorted(tags)  # none lost

    # serial replay: version v's CURRENT state = max-seq commit
    # applied so far on the hot keys; markers accumulate
    lh = Lakehouse(spark, root)
    for v in range(1, current + 1):
        got = {
            r["key"]: r["value"]
            for r in lh.scan("t", version=str(v)).collect()
        }
        applied = [
            tag_by_version[x] for x in range(2, v + 1) if x in tag_by_version
        ]
        if applied:
            winner = max(applied, key=seq_of)
            for k in HOT_KEYS:
                assert got[k] == f"{winner}:{k}", (v, k, got[k])
        else:
            assert all(got[k] == "seed" for k in HOT_KEYS)
        for tag in applied:
            assert got[tag] == tag  # markers survive every compaction
    report = validate_table(lh, "t")
    assert not report.errors, report.errors
    assert not os.path.exists(os.path.join(table_path, "version.txt.lock"))


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
