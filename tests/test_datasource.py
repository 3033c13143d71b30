"""spark.read.format("bazof") — the Python Data Source surface must
agree with Lakehouse.scan (the native fast path) on the reference's
own golden tables, at Current and at every interesting as-of instant,
including file-precedence ties resolved by (_rank, _row_idx)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark import Lakehouse  # noqa: E402
from bazof_spark.datasource import BazofDataSource, read_table  # noqa: E402

REF = "/root/reference/test-data"


def rows(df, cols=("key",)):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize(
    "table,as_of",
    [
        ("table0", None),
        ("table0", "2024-01-15T00:00:00.000Z"),
        ("table0", "2024-02-17T00:00:00.000Z"),
        ("financials", None),
        ("financials", "2019-01-17T00:00:00.000Z"),
        ("financials", "2020-06-01T00:00:00.000Z"),
    ],
)
def test_source_matches_native_scan(spark, table, as_of):
    native = Lakehouse(spark, REF).scan(table, as_of=as_of)
    via_source = read_table(spark, REF, table, as_of=as_of)
    assert sorted(via_source.columns) == sorted(native.columns)
    assert rows(via_source.select(*native.columns)) == rows(native)


def test_raw_load_carries_rank_and_rowidx(spark):
    spark.dataSource.register(BazofDataSource)
    df = (
        spark.read.format("bazof")
        .option("path", REF)
        .option("table", "table0")
        .load()
    )
    assert {"_rank", "_row_idx"} <= set(df.columns)
    # base + delta files present with distinct ranks
    assert df.select("_rank").distinct().count() == 2


def test_as_of_prunes_rows_in_reader(spark):
    spark.dataSource.register(BazofDataSource)
    early = (
        spark.read.format("bazof")
        .option("path", REF)
        .option("table", "table0")
        .option("asOf", "2024-01-15T00:00:00.000Z")
        .load()
    )
    # the delta's 2024-02 row must never cross into the JVM
    assert early.filter("event_time >= '2024-02-01'").count() == 0
