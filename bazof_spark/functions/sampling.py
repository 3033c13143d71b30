"""Deterministic dataset splitting & sampling for training pipelines.

At 100 TB you cannot re-randomize: the train/val/test assignment of a
document must be a pure function of its identity so every pipeline run,
every engine, and every incremental re-processing agrees. Standard
practice is hash-bucketing: bucket = md5(id) mod N; splits are bucket
ranges. All JVM-side expressions (no UDF, no RNG, no shuffle — a split
assignment is a map-only projection), reproducible bit-for-bit in any
engine with md5 (the DuckDB oracles recompute it).

``Sampling`` by rate is the same mechanism with a finer modulus: keep a
row iff its bucket over 1e6 falls below rate*1e6 — stable under data
growth (a kept row stays kept), unlike ``df.sample`` whose output
depends on partitioning and seed plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars of md5 → 60-bit uint, same cross-engine idiom as the
# simhash/minhash operators (DuckDB: CAST('0x' || substr(md5(x),1,15)
# AS BIGINT))
_MOD_FINE = 1_000_000


def hash_bucket(id_col: Column, n_buckets: int, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets) from the row identity. ``salt``
    derives independent bucketings (e.g. one for split, one for
    sampling) from the same ids."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % n_buckets


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (language rebalancing, domain
    mixing): keep a row iff its identity bucket over 1e6 falls below
    its stratum's rate — a map-only projection, stable under appends
    and engine-portable like the rest of this module. Strata absent
    from ``fractions`` keep ``default`` (0 = drop).

    Cutoffs are integerized DRIVER-side (round(rate*1e6)): an in-plan
    `rate * 1e6` cast differs between engines for rates whose product
    lands just below an integer in float64 (Spark's cast truncates,
    DuckDB's rounds — e.g. 0.35 → 349999.99999999994), so the integer
    grid is fixed once here and both engines compare against the same
    literals."""
    bucket = hash_bucket(F.col(id_col), _MOD_FINE, salt)
    mapping = F.create_map(
        *[
            lit
            for s, rate in fractions.items()
            for lit in (F.lit(s), F.lit(int(round(rate * _MOD_FINE))))
        ]
    )
    cutoff = F.coalesce(
        mapping[F.col(strata_col)],
        F.lit(int(round(float(default) * _MOD_FINE))),
    )
    return df.filter(bucket < cutoff)


def assign_split(
    id_col: Column,
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "",
) -> Column:
    """'train' | 'val' | 'test' with the given fractions (test gets the
    remainder). Fractions are applied on a 1e6-bucket grid, so
    train=0.8 means exactly buckets [0, 800000)."""
    if not 0 < train < 1 or val < 0 or train + val > 1:
        raise ValueError("need 0 < train < 1, val >= 0, train + val <= 1")
    b = hash_bucket(id_col, _MOD_FINE, salt)
    t_hi = int(train * _MOD_FINE)
    v_hi = t_hi + int(val * _MOD_FINE)
    return (
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def deterministic_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen purely by identity hash: stable
    across runs, engines, and incremental appends (a row's fate never
    changes). Map-only — the filter pushes into the scan's projection
    pipeline; no shuffle, no RNG state."""
    if not 0 < rate <= 1:
        raise ValueError("rate must be in (0, 1]")
    keep = int(rate * _MOD_FINE)
    return df.filter(hash_bucket(F.col(id_col), _MOD_FINE, salt) < keep)
