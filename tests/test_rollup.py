"""Incremental rollup (operators/rollup.Rollup): materialized ∪ tail
must equal the full recompute after build, refresh, and late-data
reconcile — the exactness contract that lets a 100 TB log answer
bucketed aggregates without re-scanning history."""

import shutil
import tempfile
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from bazof_spark.operators.rollup import Rollup, aggregate_bucketed

TS = lambda d, h=0, m=0: datetime(2024, 1, d, h, m, tzinfo=timezone.utc)  # noqa: E731

def MEASURES():
    # built lazily: Column construction needs an active SparkContext
    return {
        "n": (F.count(F.lit(1)), "sum"),
        "s": (F.sum(F.col("v").cast("decimal(18,6)")), "sum"),
        "mx": (F.max("v"), "max"),
    }


def _events(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, k string, v double")


def _full(events):
    return aggregate_bucketed(events, "ts", ["k"], MEASURES(), 3600)


def _sorted_rows(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


@pytest.fixture
def tmp_path_rollup():
    d = tempfile.mkdtemp(prefix="bazof_rollup_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mk(spark, path):
    return Rollup(spark, path, "ts", ["k"], MEASURES(), 3600)


ROWS_EARLY = [
    (TS(1, 0, 5), "a", 1.5),
    (TS(1, 0, 40), "a", 2.0),
    (TS(1, 1, 10), "b", 3.25),
    (TS(2, 4, 0), "a", 7.0),
]
ROWS_MID = [(TS(3, 2, 30), "b", 1.0), (TS(3, 3, 1), "a", 0.5)]
ROWS_TAIL = [(TS(5, 9, 0), "a", 4.0)]


def test_build_then_read_equals_full_recompute(spark, tmp_path_rollup):
    ev = _events(spark, ROWS_EARLY + ROWS_TAIL)
    r = _mk(spark, tmp_path_rollup)
    wm = r.build(ev, TS(3))
    assert wm == TS(3)
    assert _sorted_rows(r.read(ev)) == _sorted_rows(_full(ev))


def test_refresh_advances_watermark_incrementally(spark, tmp_path_rollup):
    ev1 = _events(spark, ROWS_EARLY)
    r = _mk(spark, tmp_path_rollup)
    r.build(ev1, TS(3))
    ev2 = _events(spark, ROWS_EARLY + ROWS_MID + ROWS_TAIL)
    wm = r.refresh(ev2, TS(4, 12))  # floors to bucket boundary 12:00
    assert wm == TS(4, 12)
    assert _sorted_rows(r.read(ev2)) == _sorted_rows(_full(ev2))
    # no-op refresh below the watermark keeps state unchanged
    assert r.refresh(ev2, TS(4)) == TS(4, 12)
    assert _sorted_rows(r.read(ev2)) == _sorted_rows(_full(ev2))


def test_reconcile_folds_late_rows_into_history(spark, tmp_path_rollup):
    late = [(TS(1, 0, 59), "a", 10.0), (TS(2, 4, 30), "c", 2.5)]
    r = _mk(spark, tmp_path_rollup)
    r.build(_events(spark, ROWS_EARLY), TS(3))
    # late batch arrives with event times far below the watermark
    r.reconcile(_events(spark, late))
    ev_all = _events(spark, ROWS_EARLY + late)
    assert _sorted_rows(r.read(ev_all)) == _sorted_rows(_full(ev_all))


def test_streaming_foreach_batch_continuous_aggregate(
    spark, tmp_path_rollup
):
    """Structured Streaming → rollup: foreachBatch folds each
    micro-batch's partials; the materialized view equals the full
    GROUP BY over everything streamed (late rows included)."""
    import json
    import os
    import tempfile

    src = tempfile.mkdtemp(prefix="bazof_rollup_stream_")
    rows = ROWS_EARLY + ROWS_MID + ROWS_TAIL
    # two source files → availableNow processes them as micro-batches
    for i, chunk in enumerate((rows[:3], rows[3:])):
        with open(os.path.join(src, f"b{i}.json"), "w") as f:
            for ts_, k, v in chunk:
                f.write(
                    json.dumps(
                        {"ts": ts_.strftime("%Y-%m-%d %H:%M:%S"), "k": k, "v": v}
                    )
                    + "\n"
                )
    r = _mk(spark, tmp_path_rollup)
    stream = (
        spark.readStream.schema("ts timestamp, k string, v double")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        stream.writeStream.foreachBatch(r.foreach_batch())
        .option(
            "checkpointLocation",
            os.path.join(src, "_ckpt"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    ev = _events(spark, rows)
    assert _sorted_rows(r.read_materialized()) == _sorted_rows(_full(ev))


def test_read_requires_build(spark, tmp_path_rollup):
    r = _mk(spark, tmp_path_rollup)
    with pytest.raises(ValueError):
        r.read(_events(spark, ROWS_EARLY))
