"""latest_wins_ordering: the one place owning both _rank conventions
(batch file-precedence vs stream snapshot-version) — see
bazof_spark/ordering.py and the CAUTION note in datasource.py's
BazofStreamReader."""

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row, functions as F  # noqa: E402

from bazof_spark.ordering import latest_wins_ordering  # noqa: E402


def _raw(spark, rows):
    """rows: (key, event_time, value, _rank, _row_idx)"""
    return spark.createDataFrame(
        [Row(key=k, event_time=t, value=v, _rank=r, _row_idx=i)
         for k, t, v, r, i in rows]
    )


def _winners(df, source):
    payload = F.struct(F.col("event_time"), F.col("value"))
    out = df.groupBy("key").agg(
        F.max_by(payload, latest_wins_ordering(source)).alias("_w")
    )
    return {r["key"]: r["_w"]["value"] for r in out.collect()}


T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)


def test_batch_lower_rank_wins(spark):
    # batch: _rank is the file-precedence index — LOWER wins even
    # against a newer event_time in a lower-precedence file
    df = _raw(spark, [("a", T0, "delta", 0, 0), ("a", T1, "base", 1, 0)])
    assert _winners(df, "batch") == {"a": "delta"}


def test_stream_higher_version_wins(spark):
    # stream: _rank is the committing snapshot version — HIGHER wins
    df = _raw(spark, [("a", T1, "v1", 1, 0), ("a", T0, "v2", 2, 0)])
    assert _winners(df, "stream") == {"a": "v2"}


def test_shared_tiebreaks(spark):
    # same rank: newest event_time wins; same (rank, event_time): the
    # FIRST physical row in the file wins (the reference's intra-file
    # rule, lakehouse.rs:54-79) — identically in both conventions
    df = _raw(
        spark,
        [
            ("a", T0, "older", 5, 0),
            ("a", T1, "newer", 5, 1),
            ("b", T0, "first", 5, 0),
            ("b", T0, "second", 5, 1),
        ],
    )
    for source in ("batch", "stream"):
        assert _winners(df, source) == {"a": "newer", "b": "first"}, source


def test_unknown_source_rejected():
    with pytest.raises(ValueError, match="batch"):
        latest_wins_ordering("nope")
