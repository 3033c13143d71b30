"""Column projection: ``All`` or an explicit column set
(reference: crates/azof/src/projection.rs:3-17).

In Spark a projection becomes ``df.select(...)`` and Catalyst pushes the
column pruning into the parquet scan; this class only carries the user's
intent plus the reference's output-ordering rules (via
``TableSchema.output_columns``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable


@dataclass(frozen=True)
class Projection:
    columns: frozenset[str] | None = None  # None ⇒ All

    @staticmethod
    def all() -> "Projection":
        return Projection(None)

    @staticmethod
    def of(columns: Iterable[str]) -> "Projection":
        return Projection(frozenset(columns))

    @property
    def is_all(self) -> bool:
        return self.columns is None

    def contains(self, name: str) -> bool:
        return self.columns is None or name in self.columns


def coerce_projection(columns: Iterable[str] | Projection | None) -> Projection:
    if columns is None:
        return Projection.all()
    if isinstance(columns, Projection):
        return columns
    return Projection.of(columns)
