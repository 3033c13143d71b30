"""Benchmark: run the workload's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE
JSON line with per-query wall seconds.

Each query is forced with the noop sink (full execution, no driver
collect). First run of the as-of queries includes the one-time azof
materialization of the events log; it is built before timing starts so
measured numbers are steady-state scan cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bazof_spark.session import get_spark  # noqa: E402
from bazof_spark.sources.events import events_lakehouse  # noqa: E402
from bazof_spark.workload import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Full workload; every SURVEY §2 operator family is represented. The
# streaming_* queries are excluded: they spin up Structured Streaming
# availableNow pipelines whose per-micro-batch startup dominates at
# local scale — they are correctness surfaces (oracle-matched vs
# batch), not throughput ones. Sorted ALPHABETICALLY, deliberately
# decoupled from the registry's driver-rotation order: early-session
# queries pay JVM/JIT warm-up that late ones don't (measured ~1.5-2.5×
# on the queries the round-3 rotation moved to the front), so a stable
# execution order is what makes per-query times comparable across
# rounds.
BENCH_QUERIES = sorted(q for q in QUERIES if not q.startswith("streaming_"))

# Optional comma-separated subset (e.g. re-measuring one family without
# the 20-minute full sweep): SPARK_GRAFT_BENCH_ONLY=bm25_search,...
_only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
if _only.strip():
    wanted = {q.strip() for q in _only.split(",") if q.strip()}
    BENCH_QUERIES = [q for q in BENCH_QUERIES if q in wanted]

# Host-drift sentinels (round 7, automating the round-6 hand-run
# adjudication): three queries whose CODE has been frozen since round 1
# (plain TPC-H shapes touching only parquet + built-in exchanges),
# with REFERENCE seconds frozen at the minimum ever recorded across
# BENCH_r01–r06 (the load-free-cost estimator the headline uses).
# sentinel_factor = median(current_min / reference) — a pure host/JVM
# condition measurement, since the numerators' code cannot have
# changed. A factor near 1.0 means totals are directly comparable with
# prior rounds; >1 means the box is slower this session and
# value_normalized (= value / sentinel_factor) is the comparable
# number. The constants are a measurement record: do NOT update them
# when re-benching — that would erase the drift they exist to expose.
SENTINELS = {
    "q1_pricing_summary": 0.764,  # r4
    "q5_local_supplier_volume": 0.895,  # r5
    "q6_revenue_change": 0.188,  # r1
}

# Round-8 widening: BENCH_r07 showed two asof-family queries moving
# +69%/+101% with UNTOUCHED code while the 3-query sentinel set (all
# scan→agg profiles) read only 1.037 — the set under-determined drift
# for window/join-shaped plans. Two FROZEN-COPY sentinels below close
# that: their code lives HERE (plain parquet reads + built-in ops, no
# bazof_spark operator imports), so no future workload/operator commit
# can change what they measure — one asof/window profile, one
# shuffle-heavy multi-join profile. Reference seconds measured r8
# (min of 3 warm runs, load-checked against the legacy sentinels
# reading ~1.0); same do-NOT-update rule as above.
def _sentinel_asof_frozen(spark, sf_dir):
    """FROZEN as-of/window profile: for each click, the latest purchase
    value by the same user at or before it — the union-marker as-of
    join (one user_id exchange + one ordered window), the plan family
    asof_join_events/asof_join_tolerance exercise."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("double").alias("pv"),
        F.lit(1).alias("is_probe"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ets"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("value").alias("pv"),
        F.lit(0).alias("is_probe"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ets").asc(), F.col("is_probe").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    return (
        clicks.unionByName(purchases)
        .withColumn("last_pv", F.last("pv", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select("click_id", "user_id", "ets", "last_pv")
    )


def _sentinel_q18_frozen(spark, sf_dir):
    """FROZEN shuffle-heavy profile: TPC-H Q18 shape — big lineitem
    aggregation, join back to orders and customer, global top-20."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 150)
    )
    return (
        big.join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice", "_qty")
        .orderBy(F.col("_qty").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def _sentinel_iterative_frozen(spark, sf_dir):
    """FROZEN iterative-join profile (round 10): two fixed supersteps
    of degree-normalized rank propagation over lineitem's (suppkey,
    partkey) pairs folded onto one 9973-node domain — the superstep-
    join-then-reaggregate plan family graph_pagerank_supply exercises,
    which none of the five prior sentinels covered (r9 saw +10-20%
    drift in untouched pagerank/ADC code with no instrument to
    adjudicate it). Deliberately cache-free (a persist would be
    unpersisted by the bench's between-rep clearCache and re-pay
    materialization with high variance): each superstep re-scans two
    int columns and runs one broadcast rank join plus one shuffle
    re-aggregation — fixed, deterministic work. Plain parquet +
    built-in exchanges only; no bazof_spark operator imports, so no
    future commit can change what this measures."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    edges = li.select(
        (F.col("l_suppkey") % 9973).cast("long").alias("src"),
        (F.col("l_partkey") % 9973).cast("long").alias("dst"),
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(F.col("src").alias("id"), F.lit(1.0).alias("rank"))
    for _ in range(2):
        ranks = (
            edges.join(deg, "src")
            .join(ranks, F.col("src") == F.col("id"))
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg((F.lit(0.15) + F.lit(0.85) * F.sum("c")).alias("rank"))
            .select(F.col("dst").alias("id"), "rank")
        )
    return ranks.orderBy(F.col("rank").desc(), "id").limit(50)


FROZEN_SENTINELS = {
    "sentinel_asof_frozen": _sentinel_asof_frozen,
    "sentinel_q18_frozen": _sentinel_q18_frozen,
    "sentinel_iterative_frozen": _sentinel_iterative_frozen,
}
# Reference seconds for the frozen sentinels, established r8 (their
# calibration round): initially estimated as session-min / co-measured
# legacy factor under mild load, then REFINED within the same round
# when a genuinely quiet session (legacy factor 1.005) recorded the
# true load-free minima directly — 0.229 and 0.431 — the same
# "minimum ever recorded" convention the legacy refs use. From r9 on
# the do-NOT-update rule applies: these are the measurement record
# drift is judged against.
_FROZEN_REFS = {
    "sentinel_asof_frozen": 0.229,  # r8, legacy factor 1.005 session
    "sentinel_q18_frozen": 0.431,
    # r10 calibration (see ROUND_NOTES_r10): first estimated as subset
    # session-min / co-measured factor (0.703/1.384 -> 0.508 — an
    # over-correction, subset sessions inflate the legacy factor with
    # early-session JIT warm-up), then REFINED to the direct minimum
    # across the round's two quiet FULL sessions (0.565 at factor
    # 0.939, 0.525 at factor 1.002) — the same minimum-ever-recorded
    # convention as the other refs. Frozen from r11 on, same
    # do-NOT-update rule as the other five.
    "sentinel_iterative_frozen": 0.525,
}


def query_family(name: str) -> str:
    """Budget-report grouping: q<N>_* TPC-H shapes share one family,
    everything else groups by its leading underscore token."""
    head = name.split("_", 1)[0]
    if head and head[0] == "q" and head[1:].isdigit():
        return "tpch"
    return head


def check_budgets(
    timings: dict[str, float],
    sentinel_factor: float | None,
    budgets: dict[str, dict],
    tolerance: float = 1.5,
) -> dict[str, dict]:
    """Per-query time-budget guard (round 10): nothing stops 164-and-
    growing query accretion from burying a real regression inside 'new
    queries got added', so every PRE-EXISTING query's load-normalized
    time (min-of-n / sentinel_factor) is checked against its recorded
    budget — the load-normalized max of its recorded spread — and a
    move past ``tolerance``× that band is a violation reported in the
    payload and on stderr. Budgets live in bench_budget.json (generate
    with tools/make_bench_budget.py from a recorded bench_results.json
    — a measurement record, regenerated only when a new round's record
    becomes the baseline). Queries not in the table (added after the
    record) are unchecked until the next regeneration."""
    out: dict[str, dict] = {}
    f = sentinel_factor or 1.0
    for name, rec in budgets.items():
        now = timings.get(name)
        if now is None or not rec.get("max"):
            continue
        norm = now / f
        limit = rec["max"] * tolerance
        if norm > limit:
            out[name] = {
                "now_norm_sec": round(norm, 3),
                "budget_max_sec": rec["max"],
                "limit_sec": round(limit, 3),
                "ratio": round(norm / rec["max"], 2),
                "family": query_family(name),
            }
    return out


def build_line_payload(
    payload: dict, violations: dict[str, dict], timings: dict[str, float],
    line_limit: int = 1900,
) -> dict:
    """ONE stdout line, sized to survive the driver's 2000-char tail
    cap: the slowest queries first, stopping before ``line_limit``
    chars; the full dict is always in queries_file.

    CONTRACT FIX (opt round 2, VERDICT r12 item 2): the line budget is
    reserved for PER-QUERY TIMES first. Previously the full
    budget_violations dict was embedded verbatim before the budget was
    computed, so a violation-heavy (i.e. loaded) session starved the
    queries dict to {} — r12 printed n_queries_shown=0 and the driver
    could compute no geomean, no per-query deltas, and no scaling
    block. Violations now compress to a count + the worst 3 ratios
    inline; full violation detail always lives in bench_results.json
    (written with the uncompressed dict)."""
    line_payload = dict(payload, queries={}, queries_file="bench_results.json")
    line_payload.pop("spread", None)  # per-query spread lives in the file
    if violations:
        worst = sorted(
            violations.items(), key=lambda kv: -kv[1]["ratio"]
        )[:3]
        line_payload["budget_violations"] = {
            "n": len(violations),
            "worst": {k: v["ratio"] for k, v in worst},
        }
    budget = line_limit - len(json.dumps(line_payload, separators=(",", ":")))
    shown: dict[str, float] = {}
    for name, secs in sorted(timings.items(), key=lambda kv: -kv[1]):
        cost = len(json.dumps({name: secs}, separators=(",", ":")))
        if budget - cost < 0:
            break
        budget -= cost
        shown[name] = secs
    line_payload["queries"] = shown
    line_payload["n_queries_shown"] = len(shown)
    return line_payload


def main() -> None:
    spark = get_spark(app_name="bazof-bench")
    spark.sparkContext.setLogLevel("ERROR")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    # warm: JVM + one-time azof materialization of events (not a query cost)
    events_lakehouse(spark, SF_DIR)
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    warmup = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    # Variance-aware protocol (round 5): single-run timings on a shared
    # box swing 1.3-2.8× with machine load (measured round 3 — the r1
    # code re-run under r3 conditions reproduced the r3 numbers, not its
    # own r1 record), and round 4 saw +15-37% "regressions" on queries
    # whose code had not changed; a round-5 re-measurement then put the
    # SAME-session spread of one such query at 4.2× between consecutive
    # identical runs. So: 3 timed runs per query; the headline stays
    # MIN (the load-free-cost estimator, comparable with every prior
    # round's record — a median can be polluted when 2 of 3 runs hit a
    # load spike, and caches are cleared between runs so min has no
    # cache-luck bias), while the per-query MEDIAN and min/max spread
    # are recorded in bench_results.json so cross-round deltas are
    # judged against the query's own noise band instead of guessed.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    spreads: dict[str, dict[str, float]] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        if warmup:
            # steady-state measurement: first execution pays one-time
            # whole-stage-codegen compilation (Janino), irrelevant at scale
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            # MEASUREMENT FIX (opt round 1): operators that persist()
            # intermediates leave them cached after the warmup, and the
            # per-rep clearCache only ran AFTER each timed rep — so rep 1
            # read the warmup's cache and "min" measured a cache-lucky
            # run (dedup_simhash: 0.38 s lucky vs 5.7 s honest). Clear
            # between warmup and the timed reps so every rep computes
            # from the parquet inputs. Pre-fix numbers are kept in
            # OPTIMIZATION_r12.md.
            spark.catalog.clearCache()
        runs: list[float] = []
        for _ in range(reps):
            start = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
            # operators persist() intermediates for the duration of
            # their query; drop them so cached blocks don't accumulate
            # across the ~100-query session and tax later queries
            spark.catalog.clearCache()
        runs.sort()
        median = runs[len(runs) // 2] if reps % 2 else (
            (runs[reps // 2 - 1] + runs[reps // 2]) / 2
        )
        timings[name] = round(runs[0], 3)
        spreads[name] = {
            "median": round(median, 3),
            "max": round(runs[-1], 3),
            "n": reps,
        }

    total = round(sum(timings.values()), 4)

    # Streaming family (VERDICT r10 task 5): the six streaming_*
    # queries never appeared in any BENCH payload, so a throughput
    # regression in streaming/stream.py or the Data Source stream
    # reader was invisible. Measured here as ONE timed availableNow
    # replay each (their cost is micro-batch startup + state store,
    # not repeatable-kernel time, so min-of-3 would mostly re-measure
    # JVM session reuse), reported under a separate payload key and
    # NEVER added to the workload total — totals stay comparable with
    # every prior round's record. Skipped in subset runs unless the
    # subset names them.
    streaming_times: dict[str, float] = {}
    stream_names = sorted(q for q in QUERIES if q.startswith("streaming_"))
    if _only.strip():
        wanted = {q.strip() for q in _only.split(",")}
        stream_names = [q for q in stream_names if q in wanted]
    for name in stream_names:
        fn = QUERIES[name]
        start = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        streaming_times[name] = round(time.perf_counter() - start, 3)
        spark.catalog.clearCache()

    # frozen sentinels: measured with the SAME warm + min-of-n protocol,
    # but NEVER added to the workload total (they are instruments, not
    # workload — adding them would break cross-round total comparability)
    frozen_times: dict[str, float] = {}
    frozen_spreads: dict[str, dict[str, float]] = {}
    for name, fn in FROZEN_SENTINELS.items():
        if warmup:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()  # same warmup hygiene as above
        runs = []
        for _ in range(reps):
            start = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
            spark.catalog.clearCache()
        runs.sort()
        median = runs[len(runs) // 2] if reps % 2 else (
            (runs[reps // 2 - 1] + runs[reps // 2]) / 2
        )
        frozen_times[name] = round(runs[0], 3)
        frozen_spreads[name] = {
            "median": round(median, 3),
            "max": round(runs[-1], 3),
            "n": reps,
        }

    # drift factor from the sentinels measured IN this run. Legacy
    # sentinels are ordinary workload queries (absent from subset runs);
    # frozen ones always run. Per-sentinel ratios are reported so
    # adjudication can be per-family (asof vs scan-agg vs shuffle-heavy),
    # the scalar factor stays the median for backward comparability and
    # is null when fewer than 3 sentinels were measured.
    all_refs = {**SENTINELS, **_FROZEN_REFS}
    all_now = {**timings, **frozen_times}
    per_sentinel = {
        name: {
            "ref_sec": ref,
            "now_sec": all_now.get(name),
            "ratio": (
                round(all_now[name] / ref, 3)
                if name in all_now and ref > 0
                else None
            ),
        }
        for name, ref in all_refs.items()
    }
    ratios = sorted(
        v["ratio"] for v in per_sentinel.values() if v["ratio"] is not None
    )
    sentinel_factor = (
        round(
            ratios[len(ratios) // 2]
            if len(ratios) % 2
            else (ratios[len(ratios) // 2 - 1] + ratios[len(ratios) // 2]) / 2,
            3,
        )
        if len(ratios) >= 3
        else None
    )
    budget_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_budget.json"
    )
    violations: dict[str, dict] = {}
    if os.path.exists(budget_path):
        with open(budget_path, encoding="utf-8") as f:
            budget_table = json.load(f)
        tol = float(budget_table.get("tolerance", 1.5))
        violations = check_budgets(
            timings, sentinel_factor, budget_table.get("queries", {}),
            tolerance=tol,
        )
        if violations:
            print(
                f"BENCH BUDGET VIOLATIONS (normalized time >{tol}x the "
                f"recorded spread): {json.dumps(violations)}",
                file=sys.stderr,
            )

    payload = {
        "metric": "workload_total_runtime",
        "value": total,
        "budget_violations": violations,
        "unit": "sec",
        "estimator": "min_of_n",
        "sentinel_factor": sentinel_factor,
        "value_normalized": (
            round(total / sentinel_factor, 4)
            if sentinel_factor
            else None
        ),
        "sentinels": per_sentinel,
        # min/median/max spread for the 5 sentinels inline (the full
        # per-query spread dict lives in bench_results.json): BENCH_r{N}
        # carries the evidence per-family drift adjudication needs
        "sentinel_spread": {
            name: dict(
                {"min": all_now[name]},
                **(frozen_spreads.get(name) or spreads.get(name) or {}),
            )
            for name in all_refs
            if name in all_now
        },
        "n_queries": len(timings),
        "queries": timings,
        # single-replay seconds per streaming query (empty in subset
        # runs); excluded from `value` — see the measurement note above
        "streaming": streaming_times,
        "spread": spreads,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The driver records only the LAST 2000 chars of stdout (BENCH_r02's
    # 86-query dict head-truncated past parseability there). So: full
    # per-query payload goes to a FILE next to this script, stdout gets
    # the full line for humans AND, LAST, a compact line guaranteed to
    # sit whole inside any tail buffer.
    results_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_results.json"
    )
    with open(results_path, "w", encoding="utf-8") as f:
        json.dump(payload, f, separators=(",", ":"))
    print(json.dumps(
        build_line_payload(payload, violations, timings),
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
