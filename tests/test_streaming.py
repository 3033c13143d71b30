"""Structured Streaming extension tests: streaming scan over a table's
delta files + watermarked windowed aggregation, driven with
trigger(availableNow) into a memory sink."""

from datetime import datetime, timezone

import pytest

from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
from bazof_spark.streaming.stream import (
    latest_rows_stream,
    read_table_stream,
    windowed_latest_counts,
)
from bazof_spark.table import Table
from bazof_spark.writer import TableWriter


def ts(d, h=0):
    return datetime(2024, 1, d, h, tzinfo=timezone.utc)


SCHEMA = TableSchema((ColumnDef("value", ColumnType.STRING, False),))


@pytest.fixture()
def stream_table(spark, tmp_path):
    w = TableWriter(spark, str(tmp_path / "t"), SCHEMA)
    seg = w.add_segment("s1", ts(1))
    seg.add_delta(
        spark.createDataFrame(
            [("k1", ts(1, 5), "a"), ("k2", ts(1, 6), "b")],
            SCHEMA.to_struct_type(),
        ),
        start=ts(1),
        end=ts(2),
    )
    seg.add_delta(
        spark.createDataFrame(
            [("k1", ts(2, 5), "c"), ("k3", ts(2, 6), "d")],
            SCHEMA.to_struct_type(),
        ),
        start=ts(2),
        end=ts(3),
    )
    w.commit()
    return Table(path=str(tmp_path / "t"), name="t")


def test_streaming_windowed_counts(spark, stream_table):
    stream = read_table_stream(spark, stream_table)
    assert stream.isStreaming
    agg = windowed_latest_counts(stream, window="1 day", watermark="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select * from win_counts").collect()
    by_start = {r["window_start"].day: r["n_keys"] for r in rows}
    assert by_start == {1: 2, 2: 2}


def test_streaming_latest_rows_state(spark, stream_table):
    """applyInPandasWithState latest-row-per-key matches the batch
    Current scan over the same deltas."""
    stream = read_table_stream(spark, stream_table)
    latest = latest_rows_stream(stream, SCHEMA, watermark="10 days")
    q = (
        latest.writeStream.format("memory")
        .queryName("latest_rows")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select key, value from latest_rows order by key"
    ).collect()
    # last update per key wins across micro-batches
    final = {r["key"]: r["value"] for r in rows}
    assert final == {"k1": "c", "k2": "b", "k3": "d"}
