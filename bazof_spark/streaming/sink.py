"""Structured Streaming sink INTO an azof table: each micro-batch
becomes one delta file + one snapshot version.

The reference's write path is entirely on its roadmap (README.md:152
writers, README.md:158 streaming); this is the Spark-native shape of
both at once: ``stream.writeStream.foreachBatch(upsert)``. Combined
with :func:`bazof_spark.streaming.stream.read_table_stream` the format
becomes a continuously-ingesting upsert log whose history stays
queryable at any past instant via the as-of scan.

Semantics and durability:

- each micro-batch appends a delta whose ``[start, end]`` is the
  batch's event-time span, then publishes ``s{v+1}.json`` and flips
  ``version.txt`` — the same atomic-pointer publish as batch commits,
  so concurrent readers always see a consistent snapshot;
- on restart after a failure between delta write and checkpoint
  commit, Structured Streaming replays the last micro-batch: the
  replayed rows land in a *second* delta file with identical content.
  The merge is idempotent to this (same (key, event_time) rows → the
  same winner; the duplicate file only costs a re-read), so the sink
  is effectively exactly-once at the query-result level while being
  at-least-once at the file level — the standard foreachBatch
  contract;
- scale: ``distributed=True`` turns each micro-batch into one
  repartition-by-key write job (many files, one delta entry each), so
  a high-volume stream never funnels through the driver.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

from bazof_spark.writer import append_delta


def upsert_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    create_segment: bool = True,
    distributed: bool = False,
    num_files: int | None = None,
    **writer_options: Any,
) -> DataStreamWriter:
    """Build a ``writeStream`` that upserts every micro-batch into the
    azof table at ``table_path``. Returns the unstarted writer so the
    caller picks the trigger (``.trigger(availableNow=True)`` for
    catch-up runs, processingTime for continuous ingest) and calls
    ``.start()``.
    """

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_delta(
            batch_df.sparkSession,
            table_path,
            batch_df,
            create_segment=create_segment,
            distributed=distributed,
            num_files=num_files,
        )

    writer = stream.writeStream.foreachBatch(_write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    for k, v in writer_options.items():
        writer = writer.option(k, v)
    return writer
