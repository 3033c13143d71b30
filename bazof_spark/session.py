"""SparkSession factory with scale-appropriate defaults.

Tests/bench run on ``local[N]``; the same settings are what we'd ship on
a 1000-executor cluster: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), UTC session timezone (the format's
timestamps are UTC, SURVEY §7.4), Arrow-batched Python interop for the
few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bazof-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE sizes post-shuffle partitions by BYTES (parallelismFirst
        # target = shuffle bytes / parallelism, floored at
        # minPartitionSize, default 1m). Per-row CPU cost is invisible
        # to it: a small-byte exchange feeding a CPU-heavy stage (the
        # simhash/minhash signature folds after the exact-dup collapse)
        # coalesces to ONE partition and serializes onto one core
        # (measured 5.6 s -> 1.45 s on dedup_simhash at sf0.1 with a
        # 64k floor). Lowering the floor keeps such stages at cluster
        # parallelism; on production-scale shuffles the bytes/
        # parallelism target is orders of magnitude above either floor,
        # so the setting is inert there — env-overridable for clusters
        # that want the stock 1m.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("BAZOF_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # naive parquet timestamps → session-tz TIMESTAMP at the scan:
        # keeps date filters pushed into the parquet reader, where the
        # default NTZ inference + post-read cast would block pushdown
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # the bazof Python Data Source implements pushFilters(); the
        # capability is gated off by default in Spark 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(cpus)),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("BAZOF_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
