"""Skew-mitigation join utilities.

AQE's skew-join split (``spark.sql.adaptive.skewJoin.enabled``, on in
our session defaults) handles most skew by splitting oversized
partitions at runtime. Salting is the explicit fallback for the cases
AQE can't fix — e.g. one join key so hot that even a split partition's
BUILD side rows must be replicated, or aggregations where a single
group dominates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed ``big`` side against ``small`` with an ``n_salts``-way
    key split: big rows get a deterministic salt (hash of the whole row,
    so the hot key's rows spread over ``n_salts`` partitions), the small
    side is replicated once per salt. Result equals ``big.join(small,
    on, how)`` for inner/left joins; shuffle skew on the hot key drops
    by ~n_salts× at the cost of replicating the small side.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, on=[*keys, "_salt"], how=how).drop("_salt")


def salted_group_count(
    df: DataFrame, key_cols: str | Sequence[str], n_salts: int = 16
) -> DataFrame:
    """Two-phase count for a dominated group-by: pre-aggregate on
    (key, salt), then combine — the hot group's rows never land in one
    partition. (Spark's hash aggregate already does map-side partial
    combine; explicit salting matters when upstream partitioning defeats
    it, e.g. after a join that co-located the hot key.)"""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return partial.groupBy(*keys).agg(F.sum("_c").alias("count"))
