"""Property check: operators/scd.scd2_from_log against an independent
pure-Python reference — per key, sort by (ts, tiebreak), compress runs
of equal (null-safe) attributes, close each version's interval at the
next version's start. Generated logs deliberately include duplicate
timestamps per key (tiebreak must totalize the order), null attribute
values (null-safe compression), and single-observation keys.
"""

from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bazof_spark.operators.scd import scd2_from_log

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

_row = st.tuples(
    st.sampled_from(["k1", "k2", "k3"]),
    st.integers(min_value=0, max_value=12),  # hour offset (dups likely)
    st.sampled_from(["a", "b", None]),
)


def _reference(rows):
    """(key, attr, from_h, to_h|None, is_current) set, pure Python."""
    by_key = {}
    for i, (k, h, a) in enumerate(rows):
        by_key.setdefault(k, []).append((h, i, a))
    out = []
    for k, obs in by_key.items():
        obs.sort(key=lambda t: (t[0], t[1]))
        versions = []
        sentinel = object()
        prev = sentinel
        for h, _i, a in obs:
            # Python `None != None` is False, i.e. null-safe natively
            if prev is sentinel or a != prev:
                versions.append((h, a))
            prev = a
        for j, (h, a) in enumerate(versions):
            nxt = versions[j + 1][0] if j + 1 < len(versions) else None
            out.append((k, a, h, nxt, nxt is None))
    return sorted(
        out, key=lambda t: tuple((x is None, 0 if x is None else x) for x in t)
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_row, min_size=1, max_size=30))
def test_scd2_matches_reference(spark, rows):
    # a unique, order-following event id is the tiebreak — same ts rows
    # keep list order in BOTH implementations
    data = [
        (k, T0 + timedelta(hours=h), i, a)
        for i, (k, h, a) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "k string, ts timestamp, eid long, attr string"
    )
    got = sorted(
        (
            (
                r["k"],
                r["attr"],
                int((r["valid_from"] - T0.replace(tzinfo=None)).total_seconds() // 3600),
                int((r["valid_to"] - T0.replace(tzinfo=None)).total_seconds() // 3600)
                if r["valid_to"] is not None
                else None,
                r["is_current"],
            )
            for r in scd2_from_log(
                df, "k", "ts", ["attr"], tiebreak_cols=["eid"]
            ).collect()
        ),
        key=lambda t: tuple((x is None, 0 if x is None else x) for x in t),
    )
    assert got == _reference(rows)
