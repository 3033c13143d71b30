"""Loaders for the driver's parquet tables.

``events.parquet`` carries parquet ``TIMESTAMP(NANOS)`` which Spark's
vectorized reader refuses outright (PARQUET_TYPE_ILLEGAL). The portable
path: read nanos as raw int64 (``spark.sql.legacy.parquet.nanosAsLong``,
runtime-settable) and convert to Spark's native µs timestamps with
``timestamp_micros(ns div 1000)`` — the same floor-truncation DuckDB
applies casting TIMESTAMP_NS → TIMESTAMP, so oracles agree.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def rebalance_if_undersplit(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Small-file handling for MAP-ONLY pipelines: a single parquet file
    with one row group reads as ONE partition, serializing the whole
    pipeline onto one core when there is no shuffle downstream to fan it
    out. One cheap shuffle buys n-way compute. Use it only where
    per-row compute dominates and no shuffle follows — queries that
    already join/aggregate repartition at their first exchange, and an
    extra up-front shuffle measurably slows them. At real scale inputs
    arrive as thousands of splits and this is a no-op; Catalyst still
    pushes filters/pruning through the Repartition node."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 4):
        return df.repartition(target)
    return df


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Parquet naive timestamps (isAdjustedToUTC=false) read as
    TIMESTAMP_NTZ under Spark 4's default inference; the oracles (and the
    rest of this codebase) treat them as instants in the UTC session.
    Cast NTZ → TIMESTAMP so both sides agree regardless of which parquet
    flavor the driver generated.

    Fallback only: :func:`load_table` disables NTZ inference before the
    scan, which yields TIMESTAMP columns directly with NO cast on top of
    the scan — a post-read cast wraps the column in an expression that
    blocks parquet predicate pushdown and row-group min/max skipping on
    every date filter (measured 1.4-2.8× on the date-filtered TPC-H
    queries). This function only fires for DataFrames planned before the
    conf was set."""
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        # the cast interprets naive values in the SESSION timezone; pin
        # it to UTC so epochs agree with the oracle even when the
        # driver's session was built without our session.py defaults
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Read naive parquet timestamps as session-tz TIMESTAMP at the scan
    # itself (runtime-settable, re-read at each query's planning): same
    # UTC-instant semantics as the NTZ→TIMESTAMP cast, but filters on
    # those columns keep reaching the parquet reader (PushedFilters +
    # row-group skipping), which a cast-wrapped column forfeits.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return _normalize_ntz(spark.read.parquet(path))
    spark.conf.set(NANOS_CONF, "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _normalize_ntz(df)


def source_tag(sf_dir: str, *tables: str) -> str:
    """Cache tag for materializations derived from driver parquet:
    hashes the source files' (path, size, mtime) so a regenerated
    testdata directory (same path, new contents) invalidates the
    cache instead of serving stale data."""
    import hashlib
    import os

    h = hashlib.md5(os.path.abspath(sf_dir).encode())
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            h.update(f"{t}:{st.st_size}:{int(st.st_mtime)}".encode())
        except OSError:
            h.update(f"{t}:missing".encode())
    return h.hexdigest()[:12]
