"""bazof_spark — a PySpark-native lakehouse engine with event-time travel.

A from-scratch re-expression of the capabilities of MaciekLesiczka/bazof
(published crate name *azof*) on Apache Spark:

- a table format: directory of parquet files + JSON snapshot metadata
  (``version.txt`` + ``s{N}.json``) describing a segment tree of base and
  delta files over event time (reference: ``crates/azof/src/metadata.rs``),
- temporal file pruning + as-of merge-dedup scan returning a lazy
  ``DataFrame`` (reference: ``crates/azof/src/lakehouse.rs:29-86``),
- SQL with time-travel syntax ``AT('ts')`` / ``AT(TIMESTAMP => 'ts')`` /
  ``FOR SYSTEM_TIME AS OF 'ts'`` (reference:
  ``crates/azof-datafusion/src/parse.rs:17-118``), with the whole relational
  surface provided by Spark SQL the way DataFusion provides it upstream,
- writers/generators the reference only roadmaps, and
- large-scale training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal columns) designed for 100 TB / multi-executor
  scale even though tests run on ``local[*]``.
"""

from bazof_spark.asof import AsOf, Current, EventTime
from bazof_spark.errors import BazofError
from bazof_spark.lakehouse import Lakehouse
from bazof_spark.maintenance import (
    checkpoint_table,
    optimize_table,
    evolve_table_schema,
    restore_table,
    vacuum_table,
    validate_snapshot,
    validate_table,
)
from bazof_spark.metadata import Delta, Segment, Snapshot
from bazof_spark.ordering import latest_wins_ordering
from bazof_spark.projection import Projection
from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
from bazof_spark.table import Table
from bazof_spark.writer import TableWriter, append_delta

__version__ = "0.1.0"

__all__ = [
    "AsOf",
    "BazofError",
    "ColumnDef",
    "ColumnType",
    "Current",
    "Delta",
    "EventTime",
    "Lakehouse",
    "Projection",
    "Segment",
    "Snapshot",
    "Table",
    "TableWriter",
    "__version__",
    "append_delta",
    "checkpoint_table",
    "latest_wins_ordering",
    "optimize_table",
    "evolve_table_schema",
    "restore_table",
    "vacuum_table",
    "validate_snapshot",
    "validate_table",
]
