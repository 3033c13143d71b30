"""Generate bench_budget.json from a recorded bench_results.json.

The budget table is a MEASUREMENT RECORD: per query, the load-
normalized min and max of the recorded spread (seconds divided by that
run's sentinel_factor, so budgets are in load-free seconds and compare
against future runs' own normalized times). bench.py flags any
pre-existing query whose normalized min-of-n moves past 1.5x its
recorded max — the guard that keeps a real regression from hiding
inside "new queries were added this round".

Regenerate ONLY when a new round's record becomes the baseline:

    python3 tools/make_bench_budget.py [bench_results.json] > bench_budget.json
"""

from __future__ import annotations

import json
import os
import sys


def build(record: dict) -> dict:
    factor = record.get("sentinel_factor") or 1.0
    queries = {}
    for name, min_sec in record.get("queries", {}).items():
        spread = record.get("spread", {}).get(name, {})
        queries[name] = {
            "min": round(min_sec / factor, 3),
            "max": round((spread.get("max") or min_sec) / factor, 3),
        }
    return {
        "source": {
            "sf": record.get("sf"),
            "sentinel_factor": record.get("sentinel_factor"),
            "n_queries": record.get("n_queries"),
            "total_sec": record.get("value"),
        },
        "tolerance": 1.5,
        "queries": queries,
    }


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results.json",
    )
    with open(path, encoding="utf-8") as f:
        print(json.dumps(build(json.load(f)), indent=1, sort_keys=True))
