"""Property check: operators/asof.asof_join (union + LOCF window
encoding, with and without tolerance) against pandas.merge_asof — an
independent reference implementation of point-in-time join semantics.

Probe/build sets are generated with unique build timestamps per key
(the determinism precondition the operator documents); tolerance
boundary rows (exactly `tolerance` old) are generated often because
both engines must agree on the inclusive bound.
"""

from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bazof_spark.operators.asof import asof_join

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

_probe_row = st.tuples(
    st.sampled_from(["u1", "u2", "u3"]),
    st.integers(min_value=0, max_value=48),  # hour offsets
)
_build_row = st.tuples(
    st.sampled_from(["u1", "u2", "u3"]),
    st.integers(min_value=0, max_value=48),
    st.integers(min_value=-9, max_value=9),
)


def _dedup_build(rows):
    seen, out = set(), []
    for k, h, v in rows:
        if (k, h) not in seen:
            seen.add((k, h))
            out.append((k, h, v))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    probes=st.lists(_probe_row, min_size=1, max_size=10),
    builds=st.lists(_build_row, min_size=0, max_size=10).map(_dedup_build),
    tol_hours=st.none() | st.integers(min_value=1, max_value=12),
    how=st.sampled_from(["left", "inner"]),
)
def test_asof_join_matches_pandas_merge_asof(
    spark, probes, builds, tol_hours, how
):
    pdf_p = pd.DataFrame(
        [
            {"pid": i, "k": k, "pts": T0 + timedelta(hours=h)}
            for i, (k, h) in enumerate(probes)
        ]
    )
    pdf_b = pd.DataFrame(
        [
            {"k": k, "bts": T0 + timedelta(hours=h), "v": v}
            for k, h, v in builds
        ],
        columns=["k", "bts", "v"],
    )
    if pdf_b.empty:
        pdf_b = pdf_b.astype({"bts": "datetime64[ns, UTC]", "v": "int64"})

    probe = spark.createDataFrame(pdf_p, "pid long, k string, pts timestamp")
    build = spark.createDataFrame(pdf_b, "k string, bts timestamp, v long")
    got = asof_join(
        probe,
        build,
        key="k",
        probe_ts="pts",
        build_ts="bts",
        how=how,
        tolerance=timedelta(hours=tol_hours) if tol_hours else None,
    ).toPandas()

    exp = pd.merge_asof(
        pdf_p.sort_values("pts", kind="stable"),
        pdf_b.sort_values("bts", kind="stable"),
        left_on="pts",
        right_on="bts",
        by="k",
        direction="backward",
        tolerance=pd.Timedelta(hours=tol_hours) if tol_hours else None,
    )
    if how == "inner":
        exp = exp[exp["bts"].notna()]

    def norm(df):
        out = []
        for _, r in df.iterrows():
            bts = r["bts"]
            out.append(
                (
                    int(r["pid"]),
                    None if pd.isna(bts) else pd.Timestamp(bts).value,
                    None if pd.isna(r["v"]) else int(r["v"]),
                )
            )
        return sorted(out, key=lambda t: (t[0], t[1] is None, t[1] or 0))

    assert norm(got) == norm(exp)
