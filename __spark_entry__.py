"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``bazof_spark.workload``; this module is the
stable driver-facing surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: time-travel SQL over an azof-format materialization of
    the events log at sf0.001 — the reference's core capability
    (event-time travel + full SQL) end-to-end on driver data."""
    from bazof_spark.sources.events import events_lakehouse

    lh = events_lakehouse(spark, "/root/testdata/sf0.001")
    return lh.sql(
        """
        SELECT key, value, event_type
          FROM events_versioned AT ('2024-01-15T00:00:00.000Z')
         ORDER BY value DESC, key
         LIMIT 10
        """
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bazof_spark.workload import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from bazof_spark.workload import ORACLES

    return dict(ORACLES)
