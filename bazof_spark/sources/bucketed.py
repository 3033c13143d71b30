"""Bucketed (pre-shuffled) table layout for co-located joins.

At 100 TB the dominant cost of fact⋈fact joins (lineitem⋈orders,
events⋈events) is the shuffle of both sides on the join key. Bucketing
pays that shuffle ONCE at write time: both tables are hash-partitioned
into the same number of buckets on the join key and sorted within each
bucket, so every subsequent join (and groupBy on the key) runs
shuffle-free — Spark's scan reports the bucket layout as its output
partitioning and Catalyst drops the Exchange on both sides.

The reference has no analogous machinery (its scans are single
partition, crates/azof-datafusion/src/lib.rs:199-204); this is the
Spark-native answer to "reuse a partitioning across stages".

Usage:
    write_bucketed(orders, "orders_b", "o_orderkey", 32)
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 32)
    j = bucketed_join(spark, "lineitem_b", "orders_b",
                      "l_orderkey", "o_orderkey")
    # tests assert shuffle_count(j) == 0

Bucket-count sizing: buckets × target-file-size should cover the
table; at 100 TB with 256 MB files that's ~4096 buckets (buckets are
read one-per-task, so they also bound scan parallelism). Keep the
count identical across tables that join together — Spark requires
equal bucket counts to elide both exchanges (with
spark.sql.bucketing.coalesceBucketsInJoin.enabled it can coalesce a
2× mismatch at half the benefit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist df as a bucketed parquet table (external at ``path`` if
    given — keeps data out of the session warehouse dir). Sorting
    within buckets makes the downstream join a zero-sort merge as
    well."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        num_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys. With
    matching layouts Catalyst plans a SortMergeJoin with NO Exchange on
    either side (and no Sort, if the tables were written sorted)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)


def bucketed_group_by(
    spark: SparkSession, table: str, bucket_col: str
) -> "DataFrame":
    """GroupBy on the bucket key of a bucketed table — aggregates
    without any exchange (the scan's hash partitioning satisfies the
    aggregate's distribution requirement)."""
    return spark.table(table).groupBy(bucket_col)
