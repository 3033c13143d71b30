"""Hive-style partition layout: at 100 TB the events log would be
written date-partitioned; a filtered query must prune partitions at
PLANNING time (PartitionFilters in the scan node), reading only the
matching directories — distinct from row-group stats pruning, which
still lists and opens every file."""

import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.plans.inspect import formatted_plan  # noqa: E402
from bazof_spark.sources.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_at_planning_time(spark):
    out = tempfile.mkdtemp(prefix="bazof_part_")
    try:
        ev = load_table(spark, SF_DIR, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        ev.write.partitionBy("event_date").mode("overwrite").parquet(out)

        part_dirs = [d for d in os.listdir(out) if d.startswith("event_date=")]
        assert len(part_dirs) > 1, "expected multiple date partitions"

        one_day = sorted(part_dirs)[0].split("=", 1)[1]
        df = spark.read.parquet(out).filter(F.col("event_date") == one_day)
        plan = formatted_plan(df)
        assert "PartitionFilters" in plan and "event_date" in plan.split(
            "PartitionFilters", 1
        )[1].split("]", 1)[0], "date filter must prune partitions at planning time"

        # the pruned read returns exactly that day's rows
        n_got = df.count()
        n_exp = (
            load_table(spark, SF_DIR, "events")
            .filter(F.to_date("ts") == one_day)
            .count()
        )
        assert n_got == n_exp > 0
    finally:
        shutil.rmtree(out, ignore_errors=True)
