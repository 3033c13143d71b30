"""Versioned ANN index (sources/annindex.py): the IVF list membership
lives in an azof table, so index refresh is an upsert and the old
index stays queryable — as-of between the versions must serve v1's
half-corpus assignments; Current must serve the refreshed full index
with the rebalanced (% 6 == 0 → second-best list) rows shadowing v1."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.sources import annindex  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lh(spark):
    return annindex.ann_index_lakehouse(spark, SF_DIR)


@pytest.fixture(scope="module")
def assigns(spark):
    return {
        int(r["vec_id"]): (int(r["list_id"]), int(r["alt_list_id"]))
        for r in annindex._assignments(spark, SF_DIR).collect()
    }


def _index(lh_, as_of=None):
    return {
        int(r["key"]): int(r["list_id"])
        for r in lh_.scan(annindex.TABLE_NAME, as_of=as_of).collect()
    }


def test_v1_serves_half_corpus_best_lists(lh, assigns):
    v1 = _index(lh, annindex.BETWEEN)
    assert set(v1) == {v for v in assigns if v % 2 == 0}
    assert all(v1[v] == assigns[v][0] for v in v1)


def test_refresh_shadows_and_extends(lh, assigns):
    cur = _index(lh)
    assert set(cur) == set(assigns)  # full corpus indexed
    for v, lid in cur.items():
        best, alt = assigns[v]
        assert lid == (alt if v % 6 == 0 else best)
    # the rebalanced rows SHADOW their v1 assignment (non-vacuous:
    # some even % 6 == 0 vector must actually change list)
    v1 = _index(lh, annindex.BETWEEN)
    moved = [v for v in v1 if v % 6 == 0 and cur[v] != v1[v]]
    assert moved, "rebalancing must move at least one v1-indexed vector"


def test_maintenance_composes_with_index_state(spark, lh, tmp_path):
    """The index is an ordinary azof table, so maintenance applies to
    derived state too: OPTIMIZE (Z-order by list_id — clustering the
    inverted lists physically) must keep every as-of read bit-stable
    and validation clean."""
    import shutil

    from bazof_spark import Lakehouse
    from bazof_spark.maintenance import optimize_table, validate_table

    root = str(tmp_path / "ix")
    shutil.copytree(
        __import__("os").path.join(lh.root, annindex.TABLE_NAME),
        __import__("os").path.join(root, annindex.TABLE_NAME),
    )
    lh2 = Lakehouse(spark, root)
    before_v1 = _index(lh2, annindex.BETWEEN)
    before_cur = _index(lh2)
    from datetime import datetime, timezone

    optimize_table(
        lh2,
        annindex.TABLE_NAME,
        datetime(2024, 5, 1, tzinfo=timezone.utc),  # after both versions
        cluster_by=["list_id"],
    )
    assert _index(lh2, annindex.BETWEEN) == before_v1
    assert _index(lh2) == before_cur
    report = validate_table(lh2, annindex.TABLE_NAME)
    assert not report.errors, report.errors
