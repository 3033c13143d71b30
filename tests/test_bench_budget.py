"""The bench budget guard: per-query normalized-time budgets from the
recorded spread, violations flagged at >1.5x, load drift normalized
out via the sentinel factor."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_check_budgets_flags_intentional_violation():
    from bench import check_budgets

    budgets = {
        "q1_pricing_summary": {"min": 0.5, "max": 0.7},
        "dedup_minhash_lsh": {"min": 1.0, "max": 1.2},
    }
    # intentional violation: 1.2 s against a 0.7 s budget (1.71x > 1.5x)
    timings = {"q1_pricing_summary": 1.2, "dedup_minhash_lsh": 1.25}
    v = check_budgets(timings, 1.0, budgets)
    assert set(v) == {"q1_pricing_summary"}
    assert v["q1_pricing_summary"]["family"] == "tpch"
    assert v["q1_pricing_summary"]["limit_sec"] == 1.05
    # the sentinel factor normalizes host load out: the same wall times
    # on a 2x-loaded box are within budget
    assert check_budgets(timings, 2.0, budgets) == {}
    # queries added after the record are unchecked
    assert check_budgets({"brand_new_query": 99.0}, 1.0, budgets) == {}
    # a missing timing (subset run) is not a violation
    assert check_budgets({}, 1.0, budgets) == {}


def test_query_family_grouping():
    from bench import query_family

    assert query_family("q19_disjunctive_filter") == "tpch"
    assert query_family("dedup_minhash_lsh") == "dedup"
    assert query_family("multimodal_flac_decode") == "multimodal"
    assert query_family("quality_distilled_classifier") == "quality"


def test_budget_table_is_generated_from_the_record():
    from tools.make_bench_budget import build

    record = {
        "sentinel_factor": 2.0,
        "sf": 0.1,
        "n_queries": 1,
        "value": 3.0,
        "queries": {"a": 1.0},
        "spread": {"a": {"median": 1.2, "max": 1.5, "n": 3}},
    }
    table = build(record)
    assert table["queries"]["a"] == {"min": 0.5, "max": 0.75}
    assert table["tolerance"] == 1.5


def test_checked_in_budgets_cover_existing_queries():
    """Every budgeted query still exists in the workload registry (a
    renamed/removed query must drop out of the table at regeneration,
    not linger as a dead entry)."""
    from bazof_spark.workload import QUERIES

    with open(os.path.join(REPO, "bench_budget.json"), encoding="utf-8") as f:
        budgets = json.load(f)
    missing = set(budgets["queries"]) - set(QUERIES)
    assert not missing, missing
