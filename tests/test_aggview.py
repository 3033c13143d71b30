"""Incremental aggregate view (operators/ivm.py + the
`cdf_agg_view_scan` fixture): a GROUP BY rollup maintained by delta
propagation over the change feed must (a) equal a from-scratch GROUP
BY at EVERY instant, (b) apply each window touching ONLY the affected
groups (the view's delta files are per-group replacement rows, never a
rewrite of the bootstrap base), (c) tombstone a group whose count
reaches zero, and (d) produce identical results through the
above-the-gate shuffled arm."""

import os
import sys
from datetime import datetime, timezone

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.sources import cdfmirror  # noqa: E402
from bazof_spark.table import Table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def agg_lh(spark):
    return cdfmirror.agg_view_lakehouse(spark, SF_DIR)


@pytest.fixture(scope="module")
def src_lh(spark):
    return cdfmirror.cdf_mirror_lakehouse(spark, SF_DIR)


def _view_rows(lh_, as_of=None):
    return {
        r["key"]: (r["cnt"], r["balance_sum"])
        for r in lh_.scan(cdfmirror.AGG_VIEW, as_of=as_of).collect()
    }


def _recomputed(src, as_of=None):
    return {
        r["key"]: (r["cnt"], r["balance_sum"])
        for r in (
            src.scan(cdfmirror.SOURCE, as_of=as_of)
            .groupBy(F.col("status").alias("key"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("cnt"),
                F.sum("balance").cast("long").alias("balance_sum"),
            )
            .collect()
        )
    }


def test_view_equals_groupby_at_every_instant(spark, agg_lh, src_lh):
    """Maintained rollup == from-scratch GROUP BY over the source at
    the bootstrap instant, between v2/v3, and Current (count + integer
    sum are order-independent, so equality is exact)."""
    for as_of in (
        "2024-05-15T00:00:00.000Z",
        cdfmirror.BETWEEN_V2,
        None,
    ):
        got = _view_rows(agg_lh, as_of)
        want = _recomputed(src_lh, as_of)
        assert got == want, f"agg view diverged at as_of={as_of}"
        assert got  # non-vacuous


def test_incremental_applies_touch_only_affected_groups(spark, agg_lh):
    """Window 1 (v1→v2: updates 'new'→'upd', deletes from 'new')
    touches exactly {new, upd}; window 2 (reinserts 'back', updates
    'new'/'upd'→'u2') exactly {new, upd, u2, back}. Each version's
    delta files hold one replacement row per touched group and
    nothing else; the bootstrap base is never rewritten."""
    path = os.path.join(agg_lh.root, cdfmirror.AGG_VIEW)
    t = Table(path=path, name=cdfmirror.AGG_VIEW)
    assert t.current_version() == "3"  # bootstrap + one bump per window

    def version_delta_rows(v):
        prev = {
            (d.file, d.tombstone)
            for s in t.get_snapshot(str(v - 1)).segments
            for d in s.delta
        }
        data = tomb = 0
        for s in t.get_snapshot(str(v)).segments:
            for d in s.delta:
                if (d.file, d.tombstone) in prev:
                    continue
                n = pq.ParquetFile(
                    os.path.join(path, d.file)
                ).metadata.num_rows
                if d.tombstone:
                    tomb += n
                else:
                    data += n
        return data, tomb

    assert version_delta_rows(2) == (2, 0)  # {new, upd}
    assert version_delta_rows(3) == (4, 0)  # {new, upd, u2, back}
    v1_files = {
        d.file for s in t.get_snapshot("1").segments for d in s.delta
    }
    v3_files = {
        d.file for s in t.get_snapshot("3").segments for d in s.delta
    }
    assert v1_files <= v3_files  # bootstrap base shared, not rewritten


def test_gate_above_threshold_matches(spark, agg_lh):
    """point_read_max_groups=0 forces every apply through the shuffled
    full-outer arm (no driver-side touched-key list); the maintained
    view is bit-identical to the point-read build at every instant."""
    gated = cdfmirror.agg_view_lakehouse(
        spark, SF_DIR, point_read_max_groups=0
    )
    for as_of in (
        "2024-05-15T00:00:00.000Z",
        cdfmirror.BETWEEN_V2,
        None,
    ):
        assert _view_rows(gated, as_of) == _view_rows(agg_lh, as_of)


def test_group_vanishing_tombstones(spark, tmp_path):
    """A group whose count reaches zero is tombstoned in the same
    atomic apply (and stays visible at instants before the window) —
    the view's DELETE path."""
    from bazof_spark.lakehouse import Lakehouse
    from bazof_spark.operators.ivm import apply_changes_agg
    from bazof_spark.writer import TableWriter, merge_apply

    t1 = datetime(2024, 5, 1, tzinfo=timezone.utc)
    t2 = datetime(2024, 6, 1, tzinfo=timezone.utc)
    src = str(tmp_path / "src")
    rows = spark.createDataFrame(
        [("k1", t1, 1, "a"), ("k2", t1, 2, "b")],
        "key string, event_time timestamp, balance long, status string",
    )
    w = TableWriter(spark, src, cdfmirror.ACCT_SCHEMA)
    seg = w.add_segment("s1", t1)
    seg.add_delta(rows, t1, t1)
    w.commit()
    # v2: k1 moves group a → b, leaving group a EMPTY
    merge_apply(
        spark,
        src,
        upsert_df=spark.createDataFrame(
            [("k1", t2, 1, "b")],
            "key string, event_time timestamp, balance long, status string",
        ),
        at=t2,
    )
    lh = Lakehouse(spark, str(tmp_path))
    view = str(tmp_path / "view")
    apply_changes_agg(
        spark, lh, "src", view, "status", ("balance",),
        since=t1, until=t1, at=t1,
    )
    apply_changes_agg(
        spark, lh, "src", view, "status", ("balance",),
        since=t1, until=t2, at=t2,
    )
    vlh = Lakehouse(spark, str(tmp_path))
    cur = {
        r["key"]: (r["cnt"], r["balance_sum"])
        for r in vlh.scan("view").collect()
    }
    assert cur == {"b": (2, 3)}  # group 'a' gone via tombstone
    before = {
        r["key"]: (r["cnt"], r["balance_sum"])
        for r in vlh.scan("view", as_of=t1).collect()
    }
    assert before == {"a": (1, 1), "b": (1, 2)}  # time travel intact
    # the tombstone landed in the SAME version as the 'b' replacement
    t = Table(path=view, name="view")
    assert t.current_version() == "2"
