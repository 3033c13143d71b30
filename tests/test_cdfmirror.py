"""CDC mirror pipeline (sources/cdfmirror.py): a downstream table
maintained purely from the change feed must (a) be bit-identical to
the source at EVERY instant, and (b) apply each feed window touching
ONLY the changed keys — its delta files are exactly the feed rows,
never a rewrite of the mirror's base."""

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.sources import cdfmirror  # noqa: E402
from bazof_spark.table import Table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lh(spark):
    return cdfmirror.cdf_mirror_lakehouse(spark, SF_DIR)


def _rows(lh_, table, as_of=None):
    return {
        r["key"]: (r["balance"], r["status"])
        for r in lh_.scan(table, as_of=as_of).collect()
    }


def test_mirror_bit_identical_at_every_instant(spark, lh):
    """B == A at the bootstrap instant, between v2/v3, and Current."""
    for as_of in (
        "2024-05-15T00:00:00.000Z",
        cdfmirror.BETWEEN_V2,
        None,
    ):
        a = _rows(lh, cdfmirror.SOURCE, as_of)
        b = _rows(lh, cdfmirror.MIRROR, as_of)
        assert a == b, f"mirror diverged at as_of={as_of}"
        assert a  # non-vacuous


def test_incremental_applies_touch_only_changed_keys(spark, lh):
    """Version 2's delta files hold exactly the v1→v2 feed (updates as
    data rows, deletes as a tombstone delta); version 3's exactly the
    v2→v3 feed. The bootstrap rows never rewrite."""
    keys = {
        int(r["k"])
        for r in cdfmirror._keys(spark, SF_DIR).collect()
    }
    upd2 = {k for k in keys if k % 7 == 0 and k % 31 != 5}
    del2 = {k for k in keys if k % 31 == 5}
    ups3 = {k for k in keys if k % 62 == 5} | {
        k for k in keys if k % 13 == 2 and k % 31 != 5 and k % 62 != 5
    }
    path = os.path.join(lh.root, cdfmirror.MIRROR)
    t = Table(path=path, name=cdfmirror.MIRROR)
    assert t.current_version() == "3"  # bootstrap + one bump per window

    def version_delta_rows(v):
        """(data rows, tombstone rows) added by snapshot v vs v-1."""
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
                n = pq.ParquetFile(os.path.join(path, d.file)).metadata.num_rows
                if d.tombstone:
                    tomb += n
                else:
                    data += n
        return data, tomb

    assert version_delta_rows(2) == (len(upd2), len(del2))
    assert version_delta_rows(3) == (len(ups3), 0)
    # the bootstrap's base delta is shared by every snapshot (no rewrite)
    v1_files = {
        d.file for s in t.get_snapshot("1").segments for d in s.delta
    }
    v3_files = {
        d.file for s in t.get_snapshot("3").segments for d in s.delta
    }
    assert v1_files <= v3_files


def test_feed_apply_is_atomic_per_window(spark, lh):
    """Each window lands as ONE version bump (merge_apply): the mirror
    never exposes a half-applied state — version 2 IS the full v2
    state including the deletes."""
    b2 = _rows(lh, cdfmirror.MIRROR, cdfmirror.BETWEEN_V2)
    deleted = {k for k in b2 if int(k) % 31 == 5}
    assert deleted == set()  # deletes applied in the same version
