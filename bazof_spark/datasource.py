"""`spark.read.format("bazof")` — catalog-style integration via Spark 4's
Python Data Source API.

The reference exposes its tables to a SQL engine through a DataFusion
``TableProvider`` (crates/azof-datafusion/src/lib.rs:60-133); the
primary analog here is the temp-view mechanism in ``Lakehouse.sql``
(native parquet scans + whole-stage codegen — the fast path). This
module adds the *reader-API* analog on top, so bazof tables also work
through Spark's standard source plumbing with zero ``Lakehouse``
handle:

    spark.dataSource.register(BazofDataSource)
    raw = (spark.read.format("bazof")
                .option("path", "/lake/root").option("table", "financials")
                .option("asOf", "2019-01-17T00:00:00.000Z").load())

What the source can and cannot do, honestly:

- Snapshot resolution, segment-tree temporal FILE PRUNING and the
  event-time row filter all run here (pruning driver-side on metadata,
  the filter inside the Arrow reader) — the scan never touches files
  or rows beyond the as-of bound.
- The latest-per-key MERGE is a global shuffle, which no data source
  can perform; ``load()`` therefore returns the pruned *versioned*
  rows carrying ``(_rank, _row_idx)``, and :func:`read_table` applies
  the identical ``max_by(payload, (-rank, ts, -row_idx))`` merge the
  native scan uses. This split is exactly how Delta's CDF/log readers
  layer over their file source.
- Rows move worker→JVM as Arrow batches (pyarrow scan). That is an
  extra hop vs the native parquet reader, so this surface is for
  catalog-style compatibility; ``Lakehouse.scan``/``sql`` remain the
  performance path. On a cluster, ship the package to workers
  (``--py-files``/conda env) like any Python source.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import LongType, StructField, StructType

from bazof_spark.asof import AsOf, Current, parse_rfc3339
from bazof_spark.table import Table


def _resolve(options: dict):
    root = options.get("path")
    name = options.get("table")
    if not root or not name:
        raise ValueError("bazof source needs .option('path', …) and .option('table', …)")
    from bazof_spark import iofs

    table = Table(path=iofs.join(root, name), name=name)
    version = options.get("version")
    snapshot = (
        table.get_snapshot(str(version))
        if version is not None
        else table.get_current_snapshot()
    )
    as_of_raw = options.get("asof") or options.get("asOf")
    as_of = AsOf.event_time(parse_rfc3339(as_of_raw)) if as_of_raw else Current
    return table, snapshot, as_of


class _FilePartition(InputPartition):
    def __init__(self, path: str, rank: int):
        self.path = path
        self.rank = rank


class BazofReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        table, snapshot, as_of = _resolve(options)
        self._files = [
            (table.data_file_path(f), r)
            for f, r in snapshot.ranked_data_files(as_of)
        ]
        self._columns = [
            f.name for f in schema.fields if f.name not in ("_rank", "_row_idx")
        ]
        self._field_order = [f.name for f in schema.fields]
        # Spark's Arrow bridge accepts only µs timestamps; the format's
        # parquet may carry ms/ns — cast every batch to the declared
        # schema's exact Arrow types before handing it over
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        # nullable variants: arrow's cast refuses null values into
        # non-nullable fields, and Spark does not enforce declared
        # non-nullability on read anyway (the native scan behaves the same)
        self._arrow_schema = pa.schema(
            [f.with_nullable(True) for f in to_arrow_schema(schema)]
        )
        self._as_of_dt = as_of.event_time_at
        self._pushed: list[tuple[str, str, object]] = []

    _COMPARATORS = {
        EqualTo: "equal",
        GreaterThan: "greater",
        GreaterThanOrEqual: "greater_equal",
        LessThan: "less",
        LessThanOrEqual: "less_equal",
    }

    def pushFilters(self, filters: list[Filter]):
        """Catalyst offers its pushable predicates; accept simple
        comparisons on top-level data columns and evaluate them inside
        the Arrow reader (so filtered rows, like as-of-pruned ones,
        never cross into the JVM). Everything else is handed back for
        Spark to evaluate — correctness never depends on the pushdown
        (Spark re-checks accepted filters only if we mis-declare, so
        only comparisons with exact arrow-comparable semantics are
        accepted: no strings-vs-numeric coercions, no nested paths)."""
        import pyarrow as pa

        def _acceptable(col: str | None, value) -> bool:
            if col not in self._columns:
                return False
            ftype = self._arrow_schema.field(col).type
            if isinstance(value, bool):
                return pa.types.is_boolean(ftype)
            if isinstance(value, int):
                return pa.types.is_integer(ftype)
            if isinstance(value, float):
                return pa.types.is_floating(ftype)
            if isinstance(value, str):
                return pa.types.is_string(ftype) or pa.types.is_large_string(ftype)
            return False

        for f in filters:
            op = self._COMPARATORS.get(type(f))
            col = f.attribute[0] if len(getattr(f, "attribute", ())) == 1 else None
            if op is not None and _acceptable(col, getattr(f, "value", None)):
                self._pushed.append((op, col, f.value))
            else:
                yield f  # unsupported → Spark evaluates it

    def partitions(self):  # one task per ranked data file
        return [_FilePartition(p, r) for p, r in self._files]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        row_idx = 0
        f = pq.ParquetFile(partition.path)
        for batch in f.iter_batches(columns=self._columns):
            n = batch.num_rows
            t = pa.Table.from_batches([batch])
            t = t.append_column(
                "_rank", pa.array([partition.rank] * n, type=pa.int64())
            ).append_column(
                "_row_idx",
                pa.array(range(row_idx, row_idx + n), type=pa.int64()),
            )
            row_idx += n
            t = t.select(self._field_order).cast(self._arrow_schema)
            if self._as_of_dt is not None:
                # event-time bound applied IN the reader: rows past the
                # as-of instant never cross into the JVM. Naive parquet
                # timestamps are treated as UTC instants (same
                # convention as sources/tables._normalize_ntz).
                col = t.column("event_time")
                if getattr(col.type, "tz", None):
                    target = pa.timestamp("us", col.type.tz)
                    bound = pa.scalar(self._as_of_dt, type=target)
                else:
                    target = pa.timestamp("us")
                    bound = pa.scalar(
                        self._as_of_dt.replace(tzinfo=None), type=target
                    )
                t = t.filter(pc.less_equal(pc.cast(col, target), bound))
            for op, name, value in self._pushed:
                col = t.column(name)
                t = t.filter(
                    getattr(pc, op)(col, pa.scalar(value, type=col.type))
                )
            yield from t.to_batches()


class BazofDataSource(DataSource):
    """Register once per session: ``spark.dataSource.register(BazofDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "bazof"

    def schema(self) -> StructType:
        _, snapshot, _ = _resolve(self.options)
        base = snapshot.schema.to_struct_type()
        # nullable like the native scan: spark.read.parquet always
        # yields nullable fields, and golden data does carry nulls in
        # columns the snapshot declares non-nullable — declaring them
        # non-null here would NPE the unsafe-row writer
        fields = [
            StructField(f.name, f.dataType, True) for f in base.fields
        ]
        return StructType(
            fields
            + [
                StructField("_rank", LongType(), False),
                StructField("_row_idx", LongType(), False),
            ]
        )

    def reader(self, schema: StructType) -> BazofReader:
        return BazofReader(self.options, schema)


def read_table(spark, root: str, name: str, as_of: str | None = None,
               version: str | None = None):
    """Merged point-in-time state through the registered source: the
    same ``max_by(payload, struct(-rank, event_time, -row_idx))``
    latest-per-key reduction as ``Lakehouse.scan`` (one shuffle of
    map-side-combined winners), over the source's pruned scan."""
    from pyspark.sql import functions as F

    spark.dataSource.register(BazofDataSource)
    # pushFilters() requires this capability flag (off by default in
    # Spark 4.1; pre-set in session.get_spark, repeated here for
    # sessions built elsewhere — runtime-settable)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    reader = (
        spark.read.format("bazof").option("path", root).option("table", name)
    )
    if as_of is not None:
        reader = reader.option("asOf", as_of)
    if version is not None:
        reader = reader.option("version", version)
    df = reader.load()
    value_cols = [
        c for c in df.columns
        if c not in ("key", "event_time", "_rank", "_row_idx")
    ]
    payload = F.struct(
        F.col("event_time").alias("event_time"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    precedence = F.struct(
        (-F.col("_rank")).alias("neg_rank"),
        F.col("event_time").alias("ts"),
        (-F.col("_row_idx")).alias("neg_row_idx"),
    )
    winner = df.groupBy("key").agg(F.max_by(payload, precedence).alias("_w"))
    return winner.select("key", "_w.*")
