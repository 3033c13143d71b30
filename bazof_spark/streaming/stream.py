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

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bazof_spark.schema import EVENT_TIME_COL, KEY_COL, TableSchema
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


def latest_rows_stream(
    stream: DataFrame, schema: TableSchema, watermark: str = "1 hour"
) -> DataFrame:
    """Continuously-maintained latest ROW per key — the streaming twin of
    the as-of ``Current`` scan, carrying full values (not just the
    winning timestamp). A custom stateful operator via
    ``applyInPandasWithState``: per-key state holds the current winner;
    each micro-batch emits keys whose winner changed.

    Scale: state is one row per key, sharded by the groupBy shuffle
    across executors' state stores; Arrow-batched per micro-batch, no
    per-row Python overhead. Upserts arriving out of order within the
    watermark resolve to the max-event-time row, matching the batch
    as-of semantics (file precedence does not apply here: a live stream
    has a single total order of arrivals per key, ties broken by latest
    arrival — documented deviation for the streaming surface)."""
    struct = schema.to_struct_type()  # key, event_time, *values
    value_cols = [f.name for f in struct.fields if f.name != KEY_COL]

    def update_latest(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        best = None  # tuple aligned with value_cols
        if state.exists:
            best = tuple(state.get)
        changed = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            row = pdf.loc[pdf[EVENT_TIME_COL].idxmax()]
            cand = tuple(row[c] for c in value_cols)
            if best is None or cand[0] >= best[0]:
                best, changed = cand, True
        if changed:
            state.update(best)
            yield pd.DataFrame(
                [{KEY_COL: key[0], **dict(zip(value_cols, best))}]
            )[[KEY_COL, *value_cols]]

    state_struct = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in struct.fields
        if f.name != KEY_COL
    )
    return (
        stream.withWatermark(EVENT_TIME_COL, watermark)
        .groupBy(KEY_COL)
        .applyInPandasWithState(
            update_latest,
            outputStructType=struct,
            stateStructType=state_struct,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def session_stream(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``:
    per-key state holds the OPEN session (start/end/count); each
    micro-batch folds its events in event-time order, emits every
    session it closed plus the updated open session. Downstream, the
    final state of a session id (key, start) is its max-end/max-count
    emission — the same update-mode reduction as latest_rows_stream.

    Equals batch sessionization (lag/gap cumulative-sum) when each
    key's events arrive across micro-batches in event-time order — true
    for the azof delta layout, whose files split on disjoint time
    ranges. Output: key, session_start_us, session_end_us, n_events.

    Scale: state is ONE open session per key (three longs), sharded by
    the groupBy shuffle; emissions are Arrow-batched; the watermark
    bounds how long an idle key's state lingers."""
    gap_us = gap_seconds * 1_000_000

    def update_sessions(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        open_s = tuple(state.get) if state.exists else None  # (start,end,n)
        out: list[tuple] = []
        ts_all: list[int] = []
        for pdf in pdfs:
            if len(pdf):
                ts_all.extend(
                    int(t.value // 1_000) for t in pdf[EVENT_TIME_COL]
                )
        for t in sorted(ts_all):
            if open_s is None:
                open_s = (t, t, 1)
            elif t - open_s[1] >= gap_us:
                out.append(open_s)  # closed by the gap
                open_s = (t, t, 1)
            else:
                open_s = (open_s[0], max(open_s[1], t), open_s[2] + 1)
        if open_s is not None and ts_all:
            state.update(open_s)
            out.append(open_s)  # update-mode emission of the open session
        if out:
            yield pd.DataFrame(
                [
                    {
                        KEY_COL: key[0],
                        "session_start_us": s,
                        "session_end_us": e,
                        "n_events": n,
                    }
                    for s, e, n in out
                ]
            )

    return (
        stream.withWatermark(EVENT_TIME_COL, watermark)
        .groupBy(KEY_COL)
        .applyInPandasWithState(
            update_sessions,
            outputStructType=(
                f"{KEY_COL} string, session_start_us long, "
                "session_end_us long, n_events long"
            ),
            stateStructType="start_us long, end_us long, n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def distinct_stream(
    stream: DataFrame,
    cols: list[str],
    watermark_col: str = EVENT_TIME_COL,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact-dedup with engine-managed state: emit each
    distinct `cols` tuple once. ``dropDuplicatesWithinWatermark`` (not
    plain ``dropDuplicates``) so the seen-keys state EXPIRES as the
    watermark advances — unbounded-state dedup does not survive an
    unbounded stream. Callers should project away non-key columns after
    this (which physical first-occurrence row carried the tuple is
    scheduling-dependent; the tuple itself is not)."""
    return stream.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(cols)


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
