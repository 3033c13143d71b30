"""Z-order (Morton) clustering codes for multi-column data skipping.

Parquet readers skip row groups whose column min/max stats exclude the
predicate. A file sorted by ONE column gives perfect skipping on that
column and none on others; interleaving the bits of several columns'
normalized ranks gives every listed column locality, so selective
predicates on ANY of them prune most row groups — the layout trick
behind Delta OPTIMIZE ZORDER BY and ClickHouse/Databricks clustering.

Everything is built-in JVM expressions (shift/and/or chains unrolled in
Python at plan-build time): no UDF, fully codegen-able, scales as a
plain projection + sort. Range normalization uses per-column min/max
collected in one tiny aggregate job (driver-side metadata, like
snapshot resolution).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bazof_spark.errors import BazofError


def _as_double(df: DataFrame, col: str) -> Column:
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    if dt in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    if dt == "date":
        return F.datediff(c, F.lit("1970-01-01").cast("date")).cast("double")
    if dt in ("string",):
        raise BazofError(
            f"zorder: column {col!r} is a string; cluster on numeric, "
            "date or timestamp columns (string ranks are not "
            "range-normalizable without a dictionary pass)"
        )
    return c.cast("double")


def zorder_code(
    df: DataFrame, cols: Sequence[str], bits: int = 12
) -> Column:
    """Morton code over ``cols``: each column min-max-normalized to a
    ``bits``-bit integer, bits interleaved column-major (column j
    contributes bit i to output bit ``i*n + j``). Nulls sort first
    (code 0). ``bits * len(cols)`` must fit a signed long (≤ 62)."""
    n = len(cols)
    if n < 1:
        raise BazofError("zorder: need at least one column")
    if bits * n > 62:
        raise BazofError(f"zorder: {bits} bits × {n} cols exceeds a long")
    # one tiny agg job for the ranges — O(columns), metadata-scale
    aggs = []
    for c in cols:
        d = _as_double(df, c)
        aggs += [F.min(d).alias(f"mn_{c}"), F.max(d).alias(f"mx_{c}")]
    row = df.agg(*aggs).first()
    top = (1 << bits) - 1
    code = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
        d = _as_double(df, c)
        if mn is None or mx is None or mx == mn:
            scaled = F.lit(0).cast("long")
        else:
            scaled = F.least(
                F.lit(top).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    ((d - F.lit(mn)) * (top / (mx - mn))).cast("long"),
                ),
            )
        scaled = F.coalesce(scaled, F.lit(0).cast("long"))
        for i in range(bits):
            bit = F.shiftright(scaled, i).bitwiseAND(F.lit(1).cast("long"))
            code = code.bitwiseOR(F.shiftleft(bit, i * n + j))
    return code
