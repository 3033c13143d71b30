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


def test_line_payload_reserves_budget_for_query_times():
    """Opt round 2 (VERDICT r12 item 2): a violation-heavy (i.e.
    loaded) session must still print per-query times on the one-line
    JSON — r12 printed n_queries_shown=0 because the full violations
    dict starved the 1900-char budget, costing the driver its geomean,
    per-query deltas, and scaling block. Violations compress to a
    count + worst-3 inline; detail lives in bench_results.json."""
    import json

    from bench import build_line_payload

    timings = {f"query_{i:03d}": round(0.1 + i * 0.01, 3) for i in range(179)}
    violations = {
        f"query_{i:03d}": {
            "now_norm_sec": 2.0,
            "budget_max_sec": 0.5,
            "limit_sec": 0.75,
            "ratio": round(4.0 - i * 0.1, 2),
            "family": "query",
        }
        for i in range(17)  # the r12 session flagged 17
    }
    payload = {
        "metric": "workload_total_runtime",
        "value": 100.0,
        "budget_violations": violations,
        "unit": "sec",
        "sentinel_factor": 1.7,
        "sentinels": {f"s{i}": {"ref_sec": 0.5, "now_sec": 0.9, "ratio": 1.8}
                      for i in range(6)},
        "sentinel_spread": {f"s{i}": {"min": 0.9, "median": 1.0, "max": 1.1,
                                      "n": 3} for i in range(6)},
        "n_queries": len(timings),
        "queries": timings,
        "streaming": {f"streaming_{i}": 10.0 for i in range(8)},
        "spread": {k: {"median": v, "max": v, "n": 3}
                   for k, v in timings.items()},
        "sf": 0.1,
    }
    line = build_line_payload(payload, violations, timings)
    # the line fits the driver's tail cap with margin
    encoded = json.dumps(line, separators=(",", ":"))
    assert len(encoded) <= 1900
    # per-query times survive violation spam: slowest-first, >= 25 shown
    assert line["n_queries_shown"] >= 25
    assert len(line["queries"]) == line["n_queries_shown"]
    slowest = max(timings, key=timings.get)
    assert slowest in line["queries"]
    # violations compressed to count + worst 3 (full detail in file)
    assert line["budget_violations"]["n"] == 17
    assert len(line["budget_violations"]["worst"]) == 3
    assert max(v["ratio"] for v in violations.values()) in line[
        "budget_violations"]["worst"].values()
    # contract fields intact
    assert line["metric"] == "workload_total_runtime"
    assert line["unit"] == "sec"
    assert line["sf"] == 0.1
    assert "spread" not in line
    # no violations: key stays an empty dict, queries still shown
    line2 = build_line_payload(dict(payload, budget_violations={}), {}, timings)
    assert line2["budget_violations"] == {}
    assert line2["n_queries_shown"] >= line["n_queries_shown"]
