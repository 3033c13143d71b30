"""Driver-window rotation ordering (workload._rotation_order).

Rounds 7 AND 8 each shipped with hand-maintained checked-set literals
one round stale, so round 9 made the ordering self-updating: the green
sets are derived at import time from the CORRECTNESS_r{N}.json
artifacts the driver itself writes. These tests pin the derivation
contract — committing a new artifact IS the rotation update.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.workload import (  # noqa: E402
    QUERIES,
    _driver_checked_rounds,
    _rotation_order,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_checked_rounds_derive_from_artifacts():
    rounds = dict(_driver_checked_rounds())
    # every artifact on disk is represented, in ascending round order
    on_disk = sorted(
        int(f[len("CORRECTNESS_r"):-len(".json")])
        for f in os.listdir(REPO)
        if f.startswith("CORRECTNESS_r") and f.endswith(".json")
    )
    assert sorted(rounds) == on_disk
    # green = rows+schema+hash all passing; red rows are EXCLUDED (the
    # r7 artifact recorded embedding_pca_project red — it must not
    # count as checked there)
    r7 = json.load(open(os.path.join(REPO, "CORRECTNESS_r07.json")))
    assert "embedding_pca_project" in r7
    assert "embedding_pca_project" not in rounds[7]
    assert len(rounds[7]) == 49 and len(rounds[8]) == 50


def test_rotation_fronts_never_green_then_stalest():
    latest = {}
    for rnd, green in _driver_checked_rounds():
        for n in green:
            latest[n] = rnd
    names = list(QUERIES)
    order = _rotation_order(names)
    assert sorted(order) == sorted(names)  # a permutation, nothing lost
    ranks = [latest.get(n, 0) for n in order]  # 0 = never green
    # never-green lead; checked names follow in non-decreasing staleness
    checked = [r for r in ranks if r > 0]
    first_checked = ranks.index(checked[0]) if checked else len(ranks)
    assert all(r == 0 for r in ranks[:first_checked])
    assert checked == sorted(checked)
    # the registry itself is rotation-ordered (driver reads dict order)
    assert names == _rotation_order(names)


def test_rotation_survives_missing_artifacts(monkeypatch, tmp_path):
    # with no artifacts every query ranks never-checked → natural order
    import bazof_spark.workload as w

    monkeypatch.setattr(
        w, "_driver_checked_rounds", lambda: []
    )
    names = ["b", "a", "c"]
    assert w._rotation_order(names) == names
