"""Per-query profiler for optimization work (guide §1): time named
workload queries in isolation with the bench's exact protocol (warmup,
clearCache between reps, noop sink, min-of-n) and optionally dump the
EXPLAIN FORMATTED plan to a file.

Usage:
    python tools/qprof.py q1_pricing_summary sketch_set_intersection
    python tools/qprof.py --plan plans/r12 --suffix before q1_pricing_summary
    python tools/qprof.py --reps 5 dedup_simhash
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.plans.inspect import formatted_plan  # noqa: E402
from bazof_spark.session import get_spark  # noqa: E402
from bazof_spark.sources.events import events_lakehouse  # noqa: E402
from bazof_spark.workload import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dir to write plans into")
    ap.add_argument("--suffix", default="plan", help="plan file suffix")
    ap.add_argument("--no-time", action="store_true", help="plan only")
    args = ap.parse_args()

    spark = get_spark(app_name="bazof-qprof")
    spark.sparkContext.setLogLevel("ERROR")
    events_lakehouse(spark, SF_DIR)
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    for name in args.queries:
        fn = QUERIES[name]
        if args.plan:
            df = fn(spark, SF_DIR)
            path = os.path.join(args.plan, f"{name}_{args.suffix}.txt")
            with open(path, "w", encoding="utf-8") as f:
                f.write(formatted_plan(df))
            print(f"{name}: plan -> {path}")
            spark.catalog.clearCache()
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        runs = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"rep{i}:{name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        runs.sort()
        print(
            f"{name}: min {runs[0]:.3f}  med {runs[len(runs) // 2]:.3f}  "
            f"max {runs[-1]:.3f}  (n={len(runs)})"
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
