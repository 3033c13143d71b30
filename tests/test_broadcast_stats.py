"""Statistics-driven broadcast for Data Source scans
(datasource.broadcast_hint_if_small): the Python Data Source API
reports no relation statistics, so Spark sizes every format("bazof")
scan at defaultSizeInBytes and never auto-broadcasts it. The snapshot
records per-file byte sizes at commit; a scan whose recorded total
fits autoBroadcastJoinThreshold gets the broadcast hint Spark would
have derived from file sizes on a JVM parquet scan. Gates pinned:
missing sizes → no hint; over-threshold → no hint."""

import json
import os
import sys
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.datasource import (  # noqa: E402
    _bytes_conf,
    read_table,
    write_table,
)
from bazof_spark.plans.inspect import broadcast_join_count  # noqa: E402

T1 = datetime(2024, 5, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def dim_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bstats"))
    dim = spark.createDataFrame(
        [(str(i), T1, i * 10) for i in range(3)],
        "key string, event_time timestamp, tier long",
    )
    write_table(dim, root, "dim", mode="overwrite")
    return root


N_FACT = 2_000_000  # big enough that Spark never broadcasts the fact


def _join_plan(spark, dim_df):
    fact = spark.range(0, N_FACT).select(
        (F.col("id") % 3).cast("string").alias("fk"),
        F.col("id").alias("amount"),
    )
    joined = fact.join(dim_df, fact.fk == dim_df.key)
    return joined, joined._jdf.queryExecution().executedPlan().toString()


def test_small_dim_scan_broadcasts(spark, dim_root):
    dim = read_table(spark, dim_root, "dim")
    joined, plan = _join_plan(spark, dim)
    assert broadcast_join_count(joined) >= 1
    assert "SortMergeJoin" not in plan
    # and the join is CORRECT through the hinted scan
    assert joined.count() == N_FACT


def test_no_recorded_sizes_no_hint(spark, dim_root, tmp_path):
    """A snapshot without recorded file sizes (reference-era) must not
    be hinted — the gate is knowledge, not hope."""
    import shutil

    root = str(tmp_path / "nosizes")
    shutil.copytree(os.path.join(dim_root, "dim"), os.path.join(root, "dim"))
    spath = None
    for f in os.listdir(os.path.join(root, "dim")):
        if f.startswith("s") and f.endswith(".json"):
            spath = os.path.join(root, "dim", f)
            data = json.load(open(spath))

            def strip(node):
                node.pop("size", None)
                for k in ("segments", "delta"):
                    for sub in node.get(k) or []:
                        strip(sub)

            for seg in data.get("segments") or []:
                strip(seg)
            json.dump(data, open(spath, "w"))
    assert spath is not None
    dim = read_table(spark, root, "dim")
    joined, plan = _join_plan(spark, dim)
    assert broadcast_join_count(joined) == 0
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_over_threshold_no_hint(spark, dim_root):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
    try:
        dim = read_table(spark, dim_root, "dim")
        joined, plan = _join_plan(spark, dim)
        assert broadcast_join_count(joined) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_lakehouse_object_store_scan_broadcasts(
    spark, dim_root, tmp_path, monkeypatch
):
    """The Lakehouse object-store branch (emulated s3 root) attaches
    the same hint — the path where the missing statistics actually
    bite (JVM parquet scans have real sizes; Python DS scans do not)."""
    import shutil

    from bazof_spark.lakehouse import Lakehouse

    mirror = tmp_path / "mirror"
    (mirror / "s3" / "bkt").mkdir(parents=True)
    shutil.copytree(
        os.path.join(dim_root, "dim"), str(mirror / "s3" / "bkt" / "dim")
    )
    monkeypatch.setenv("BAZOF_FS_EMULATE", "s3")
    monkeypatch.setenv("BAZOF_FS_EMULATE_ROOT", str(mirror))
    lh = Lakehouse(spark, "s3://bkt")
    dim = lh.scan("dim")
    joined, plan = _join_plan(spark, dim)
    assert broadcast_join_count(joined) >= 1
    assert "SortMergeJoin" not in plan
    got = {r["key"]: r["tier"] for r in dim.collect()}
    assert got == {"0": 0, "1": 10, "2": 20}


def test_bytes_conf_parses_spark_forms():
    assert _bytes_conf("10485760b") == 10 * 1024 * 1024
    assert _bytes_conf("10MB") == 10 * 1024 * 1024
    assert _bytes_conf("512k") == 512 * 1024
    assert _bytes_conf("-1") == -1
    assert _bytes_conf("1g") == 1 << 30
    assert _bytes_conf("nope") is None
