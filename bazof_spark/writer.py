"""Writers: CSV→parquet generation and table/snapshot authoring.

The reference ships only test tooling for writes — ``azof-cli gen``
converts a headerless CSV next to the table into one parquet file
(crates/azof-cli/src/main.rs:61-99, crates/azof-cli/src/test_bench.rs:14-51)
— and roadmaps a real writer (README.md:152). This module provides both:

- :func:`csv_to_dataframe` / :func:`dataframe_to_parquet_file` — the gen
  path, preserving the physical-layout invariant the merge relies on:
  files sorted by ``event_time`` DESC, unique (key, event_time) per file
  (crates/azof-cli/src/test_bench.rs:103-121; SURVEY §1.3);
- :class:`TableWriter` — authors ``version.txt`` + ``s{N}.json`` +
  base/delta parquet files, i.e. the writer the reference lacks
  (snapshot JSON format per docs/architecture.md:127-139 and
  test-data/*/s1.json).

Single data files are written driver-side via Arrow (these are batch
-sized artifacts: one base or delta). Nothing here sits on the 100 TB
read path — large tables are built by appending many delta files, each
written from one batch.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bazof_spark.asof import format_rfc3339_ms
from bazof_spark.errors import BazofError
from bazof_spark.metadata import Snapshot
from bazof_spark.schema import EVENT_TIME_COL, KEY_COL, TableSchema
from bazof_spark.table import VERSION_FILE


def csv_to_dataframe(
    spark: SparkSession, csv_path: str, schema: TableSchema
) -> DataFrame:
    """Headerless CSV ``key,event_time,values...`` per the declared schema
    (crates/azof-cli/src/test_bench.rs:14-51)."""
    struct = schema.to_struct_type()
    return (
        spark.read.schema(struct)
        .option("header", "false")
        .option("timestampFormat", "yyyy-MM-dd[['T']HH:mm:ss[.SSS]['Z']]")
        .csv(csv_path)
    )


def dataframe_to_parquet_file(
    df: DataFrame, dest_path: str, timestamp_unit: str = "us"
) -> None:
    """Write ONE parquet file (not a Spark directory), sorted by
    ``event_time`` DESC — the layout invariant
    (crates/azof-cli/src/test_bench.rs:103-121). Gen tooling: batch-sized
    data, driver-side Arrow write.

    ``timestamp_unit``: the reference's Arrow schema is ms
    (crates/azof/src/schema.rs:188-197); we default to µs — Spark's
    native TimestampType resolution — so no precision is lost writing
    Spark data. Pass "ms" for byte-level reference compatibility."""
    tbl = df.orderBy(F.col(EVENT_TIME_COL).desc()).toArrow()
    fields = []
    for f in tbl.schema:
        if pa.types.is_timestamp(f.type):
            fields.append(
                pa.field(f.name, pa.timestamp(timestamp_unit, tz="UTC"), f.nullable)
            )
        else:
            fields.append(f)
    tbl = tbl.cast(pa.schema(fields))
    pq.write_table(tbl, dest_path)


def validate_data_file_invariants(df: DataFrame) -> None:
    """Check unique (key, event_time) pairs — the invariant that makes
    the as-of dedup well-defined (SURVEY §7.4)."""
    dupes = (
        df.groupBy(KEY_COL, EVENT_TIME_COL).count().filter(F.col("count") > 1).count()
    )
    if dupes:
        raise BazofError(f"{dupes} duplicate (key, event_time) pairs in data file")


def _ts(dt: datetime) -> str:
    return format_rfc3339_ms(dt)


class SegmentBuilder:
    """Builds one segment subtree (JSON shape per test-data/*/s1.json)."""

    def __init__(self, writer: "TableWriter", node: dict):
        self._writer = writer
        self._node = node

    def add_delta(
        self,
        df: DataFrame,
        start: datetime,
        end: datetime,
        name: str | None = None,
        validate: bool = True,
    ) -> "SegmentBuilder":
        deltas = self._node.setdefault("delta", [])
        file_name = name or f"{self._node['id']}_delta{len(deltas) + 1}.parquet"
        self._writer._write_file(df, file_name, validate)
        deltas.append({"file": file_name, "start": _ts(start), "end": _ts(end)})
        return self

    def add_delta_distributed(
        self,
        df: DataFrame,
        start: datetime,
        end: datetime,
        num_files: int | None = None,
        validate: bool = True,
    ) -> "SegmentBuilder":
        """Write ONE logical delta as MANY parquet files in a single
        distributed Spark job — the 100-TB write path (the single-file
        ``add_delta`` materializes through the driver).

        Each output file becomes its own delta entry with the same
        ``[start, end]`` range. Correctness: rows are repartitioned by
        ``key``, so a key lives in exactly one file and the merge's
        file-precedence order among the sibling entries (stable sort on
        equal ``start``) can never arbitrate between two versions of the
        same key. Files keep the event_time-DESC order invariant via
        ``sortWithinPartitions``."""
        if validate:
            validate_data_file_invariants(df)
        ordered = df.select(
            KEY_COL, EVENT_TIME_COL, *self._writer.schema.column_names()
        )
        if num_files:
            ordered = ordered.repartition(num_files, KEY_COL)
        else:
            ordered = ordered.repartition(KEY_COL)
        ordered = ordered.sortWithinPartitions(F.col(EVENT_TIME_COL).desc())

        deltas = self._node.setdefault("delta", [])
        stem = f"{self._node['id']}_delta{len(deltas) + 1}"
        out_dir = os.path.join(self._writer.path, f"_{stem}_job")
        ordered.write.mode("overwrite").parquet(out_dir)
        part_files = sorted(
            f
            for f in os.listdir(out_dir)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        for i, part in enumerate(part_files):
            file_name = f"{stem}_p{i:05d}.parquet"
            os.replace(
                os.path.join(out_dir, part),
                os.path.join(self._writer.path, file_name),
            )
            deltas.append(
                {"file": file_name, "start": _ts(start), "end": _ts(end)}
            )
        import shutil

        shutil.rmtree(out_dir)
        return self

    def add_child(
        self,
        segment_id: str,
        start: datetime,
        end: datetime | None = None,
        base_df: DataFrame | None = None,
        validate: bool = True,
    ) -> "SegmentBuilder":
        node: dict = {"id": segment_id, "start": _ts(start)}
        if end is not None:
            node["end"] = _ts(end)
        if base_df is not None:
            file_name = f"{segment_id}_base.parquet"
            self._writer._write_file(base_df, file_name, validate)
            node["file"] = file_name
        self._node.setdefault("segments", []).append(node)
        return SegmentBuilder(self._writer, node)


class TableWriter:
    """Author an azof-format table directory (the writer the reference
    roadmaps at README.md:152)."""

    def __init__(self, spark: SparkSession, table_path: str, schema: TableSchema):
        self.spark = spark
        self.path = table_path
        self.schema = schema
        self._segments: list[dict] = []
        os.makedirs(table_path, exist_ok=True)

    def _write_file(self, df: DataFrame, file_name: str, validate: bool) -> None:
        ordered = df.select(KEY_COL, EVENT_TIME_COL, *self.schema.column_names())
        if validate:
            validate_data_file_invariants(ordered)
        dataframe_to_parquet_file(ordered, os.path.join(self.path, file_name))

    def add_segment(
        self,
        segment_id: str,
        start: datetime,
        end: datetime | None = None,
        base_df: DataFrame | None = None,
        validate: bool = True,
    ) -> SegmentBuilder:
        node: dict = {"id": segment_id, "start": _ts(start)}
        if end is not None:
            node["end"] = _ts(end)
        if base_df is not None:
            file_name = f"{segment_id}_base.parquet"
            self._write_file(base_df, file_name, validate)
            node["file"] = file_name
        self._segments.append(node)
        return SegmentBuilder(self, node)

    def commit(self, version: str = "1") -> Snapshot:
        """Write ``s{version}.json`` then flip ``version.txt`` — readers
        resolve the pointer first, so the pointer flip is the atomic
        publish step."""
        doc = {"schema": self.schema.to_json(), "segments": self._segments}
        raw = json.dumps(doc, indent=2)
        snapshot = Snapshot.deserialize(raw)  # validates what we wrote
        with open(os.path.join(self.path, f"s{version}.json"), "w") as f:
            f.write(raw)
        with open(os.path.join(self.path, VERSION_FILE), "w") as f:
            f.write(version)
        return snapshot
