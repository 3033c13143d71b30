"""SCD2 (slowly-changing-dimension type 2) history build from a
change/event log.

The dimension-table counterpart of the lakehouse's change-data-feed
(lakehouse.scan_changes): given an append-only log of (key, ts, attrs)
observations, produce one row per (key, attribute-version) with
``valid_from`` / ``valid_to`` interval columns and an ``is_current``
flag — the standard warehouse shape for as-of dimension joins. The
reference's format stores full version history per key
(crates/azof/src/metadata.rs segment/delta trees); this operator turns
any such log into the interval form analytics tools expect.

Scale shape: ONE hash shuffle on the key columns; both window passes
(change compression, interval close) share that partitioning, so
Catalyst plans a single Exchange with in-partition sorts. No joins, no
state beyond a per-partition sort — at 100 TB the cost is the one
shuffle, same class as any groupBy(key).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_from_log(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse an observation log into SCD2 intervals.

    Consecutive observations (per key, ordered by ``ts_col`` then
    ``tiebreak_cols``) with unchanged attributes are compressed into
    one version; each version's ``valid_to`` is the next version's
    ``valid_from`` (null on the current version, which also gets
    ``is_current = true``). Attribute comparison is null-safe.

    ``tiebreak_cols`` make the ordering total when one key can carry
    several observations at the same timestamp (pass a unique event
    id); without a total order the compression would be
    nondeterministic across engines and runs.

    Output: key columns, attribute columns, ``valid_from``,
    ``valid_to``, ``is_current``.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    attrs = list(attr_cols)
    if not attrs:
        raise ValueError("attr_cols must be non-empty")
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    cur = F.struct(*[F.col(c) for c in attrs])
    # lag() is NULL on the first row per key; cur (a struct literal) is
    # never NULL, so eqNullSafe alone marks the first row as changed
    changed = ~cur.eqNullSafe(F.lag(cur).over(w))
    versions = (
        df.select(*keys, ts_col, *tiebreak_cols, *attrs)
        .withColumn("_chg", changed)
        .filter(F.col("_chg"))
    )
    # same partitioning ⇒ no second exchange; the filter only thins the
    # sorted runs
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*keys, *attrs, "valid_from", "valid_to", "is_current")
    )
