"""Table schema: JSON column declarations ↔ Spark ``StructType``.

Reference: crates/azof/src/schema.rs. Four primitive value types plus two
implicit system columns prepended to every table
(``crates/azof/src/schema.rs:12-13,173-203``):

    key: string NOT NULL, event_time: timestamp NOT NULL

The reference materializes Arrow batches through typed builders
(``schema.rs:35-171``); in Spark the scan stays a columnar DataFrame, so
only the schema mapping survives here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from bazof_spark.errors import MetadataError
from bazof_spark.projection import Projection

KEY_COL = "key"
EVENT_TIME_COL = "event_time"
SYSTEM_COLUMNS = (KEY_COL, EVENT_TIME_COL)


class ColumnType(str, Enum):
    """Azof value column types (crates/azof/src/schema.rs:15-21), plus
    ``Float`` and ``Binary`` extensions the reference lacks (documented
    superset — Float for real-valued measures, Binary for opaque media
    payloads so blobs get the SAME time travel / DML / CDF as scalar
    columns; snapshots using either are not readable by the
    reference)."""

    STRING = "String"
    INT = "Int"
    BOOLEAN = "Boolean"
    DATETIME = "DateTime"
    FLOAT = "Float"  # extension
    BINARY = "Binary"  # extension

    def to_spark(self) -> DataType:
        # Mapping mirrors the reference's Arrow mapping
        # (crates/azof/src/schema.rs:188-197): Utf8 / Int64 / Boolean /
        # Timestamp(ms, UTC). Spark timestamps are µs-resolution,
        # session-timezone UTC — a superset of ms.
        return _SPARK_TYPES[self]


_SPARK_TYPES: dict[ColumnType, DataType] = {
    ColumnType.STRING: StringType(),
    ColumnType.INT: LongType(),
    ColumnType.BOOLEAN: BooleanType(),
    ColumnType.DATETIME: TimestampType(),
    ColumnType.FLOAT: DoubleType(),
    ColumnType.BINARY: BinaryType(),
}


def column_type_from_spark(dt: DataType) -> ColumnType:
    """Inverse of :meth:`ColumnType.to_spark`, with lossless widenings
    (int8/16/32 → Int, float32 → Float) so any Spark frame whose columns
    fit the format's five value types can author a table."""
    from pyspark.sql.types import (
        ByteType,
        DecimalType,
        FloatType,
        IntegerType,
        ShortType,
    )

    name = type(dt).__name__
    if isinstance(dt, StringType):
        return ColumnType.STRING
    if isinstance(dt, BinaryType):
        return ColumnType.BINARY
    if isinstance(dt, (LongType, IntegerType, ShortType, ByteType)):
        return ColumnType.INT
    if isinstance(dt, BooleanType):
        return ColumnType.BOOLEAN
    if isinstance(dt, TimestampType):
        return ColumnType.DATETIME
    if isinstance(dt, (DoubleType, FloatType, DecimalType)):
        # decimal → double is a documented narrowing (SQL literals like
        # `1.0` arrive as DECIMAL; the format has no decimal type) —
        # exact for ≤15 significant digits
        return ColumnType.FLOAT
    raise MetadataError(
        f"Spark type {name} has no azof column type (supported: "
        "string, integral, boolean, timestamp, floating, decimal, "
        "binary)"
    )


@dataclass(frozen=True)
class ColumnDef:
    """One declared value column (crates/azof/src/schema.rs:23-28).

    ``formers`` (ours — RENAME COLUMN support): earlier names this
    column was stored under. Data files written before a rename carry
    the old name; readers include every former as a nullable read field
    of the same type and COALESCE into the declared name (a file stores
    exactly one spelling, so coalesce is a disjoint-union, never a
    merge). Serialized only when non-empty, so reference-authored and
    never-renamed snapshots are byte-identical to before."""

    name: str
    data_type: ColumnType
    nullable: bool = False
    formers: tuple[str, ...] = ()

    @staticmethod
    def from_json(obj: dict) -> "ColumnDef":
        try:
            return ColumnDef(
                name=obj["name"],
                data_type=ColumnType(obj["data_type"]),
                nullable=bool(obj.get("nullable", False)),
                formers=tuple(obj.get("formers", ())),
            )
        except (KeyError, ValueError) as exc:
            raise MetadataError(f"bad column definition {obj!r}: {exc}") from exc

    def to_json(self) -> dict:
        out = {
            "name": self.name,
            "data_type": self.data_type.value,
            "nullable": self.nullable,
        }
        if self.formers:
            out["formers"] = list(self.formers)
        return out


@dataclass(frozen=True)
class TableSchema:
    """Declared value columns; system columns are implicit.

    Duplicate declared names are rejected at construction: a snapshot
    whose schema carries two columns with one name is unreadable (every
    explicit-schema scan is ambiguous), so the invariant holds HERE —
    before any snapshot can be serialized — rather than in each caller
    (evolve's add/rename interaction was one past escape)."""

    columns: tuple[ColumnDef, ...] = field(default_factory=tuple)

    def __post_init__(self):
        names = [c.name for c in self.columns]
        dupes = sorted({n for n in names if names.count(n) > 1})
        if dupes:
            raise MetadataError(
                f"duplicate column name(s) in schema: {dupes}"
            )

    @staticmethod
    def from_json(obj: dict) -> "TableSchema":
        cols = obj.get("columns", [])
        return TableSchema(tuple(ColumnDef.from_json(c) for c in cols))

    @staticmethod
    def from_struct_type(struct: StructType) -> "TableSchema":
        """Declared value columns for a Spark write schema: ``key`` and
        ``event_time`` are the implicit system columns (required,
        validated), every other field maps through
        :func:`column_type_from_spark` keeping its nullability."""
        names = [f.name for f in struct.fields]
        missing = [c for c in SYSTEM_COLUMNS if c not in names]
        if missing:
            raise MetadataError(
                f"write schema must carry system columns {missing} "
                f"(got {names})"
            )
        if not isinstance(struct[KEY_COL].dataType, StringType):
            raise MetadataError(
                f"key column must be string, got {struct[KEY_COL].dataType}"
            )
        if not isinstance(struct[EVENT_TIME_COL].dataType, TimestampType):
            raise MetadataError(
                "event_time column must be timestamp, got "
                f"{struct[EVENT_TIME_COL].dataType}"
            )
        return TableSchema(
            tuple(
                ColumnDef(
                    name=f.name,
                    data_type=column_type_from_spark(f.dataType),
                    nullable=f.nullable,
                )
                for f in struct.fields
                if f.name not in SYSTEM_COLUMNS
            )
        )

    def to_json(self) -> dict:
        return {"columns": [c.to_json() for c in self.columns]}

    def column_names(self) -> list[str]:
        return [c.name for c in self.columns]

    def output_columns(self, projection: Projection) -> list[str]:
        """Projected output order: key, event_time, then value columns in
        declared order, each included only if projected
        (crates/azof/src/schema.rs:148-171,173-186)."""
        out = [c for c in SYSTEM_COLUMNS if projection.contains(c)]
        out.extend(c.name for c in self.columns if projection.contains(c.name))
        return out

    def to_struct_type(self, projection: Projection | None = None) -> StructType:
        """Spark schema honoring the projection
        (crates/azof/src/schema.rs:173-203)."""
        projection = projection or Projection.all()
        fields = []
        for name in self.output_columns(projection):
            if name == KEY_COL:
                fields.append(StructField(KEY_COL, StringType(), False))
            elif name == EVENT_TIME_COL:
                fields.append(StructField(EVENT_TIME_COL, TimestampType(), False))
            else:
                col = next(c for c in self.columns if c.name == name)
                fields.append(
                    StructField(col.name, col.data_type.to_spark(), col.nullable)
                )
        return StructType(fields)

    def has_formers(self) -> bool:
        return any(c.formers for c in self.columns)

    def to_read_struct_type(self) -> StructType:
        """The READ schema for data files: every declared field PLUS a
        nullable field per former name (same type — a rename never
        changes the type). Pre-rename files populate the former field
        and null-fill the declared one; post-rename files the reverse;
        :meth:`former_coalesce_exprs` folds them back together. When no
        column has formers this is exactly :meth:`to_struct_type`."""
        fields = list(self.to_struct_type().fields)
        for col in self.columns:
            for former in col.formers:
                fields.append(
                    StructField(former, col.data_type.to_spark(), True)
                )
        return StructType(fields)

    def former_names(self) -> set[str]:
        return {f for c in self.columns for f in c.formers}
