"""Extended relational workload: the remaining TPC-H query shapes
(adapted to this dataset's reduced schema — no partsupp, no
commit/receipt dates) plus window-frame, percentile and pivot
aggregations. Same contract as bazof_spark.workload: every query has a
DuckDB oracle with identically-aliased columns, and every float output
is either decimal-exact-cast-to-double or rounded to 6 dp on BOTH
sides.

These exercise the parts of SURVEY §2.B's relational surface the first
workload batch did not: correlated scalar subqueries (q2, q17), nation
pair disjunctive join filters (q7), left-outer aggregation (q13),
scalar-subquery HAVING (q11, q15), NOT IN subqueries (q16),
multi-EXISTS (q21), disjunctive pushdown predicates (q19), nested
semi-join chains (q20), window frames (moving average), exact
percentiles, and pivot.

Scale notes (100 TB thinking): every query keeps the fact table
(lineitem / orders / events) as the streamed probe side; dimension and
derived aggregates small enough to broadcast are broadcast explicitly;
everything else is a plain shuffled hash/SMJ that AQE can re-plan.
Correlated subqueries are expressed as aggregate-then-join (not
per-row subquery execution), which is the scalable rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(name: str):
    def load(spark: SparkSession, sf_dir: str) -> DataFrame:
        from bazof_spark.sources.tables import load_table

        return load_table(spark, sf_dir, name)

    return load


def _dec(col: str, p: int = 18, s: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal({p},{s})")


def _disc_price() -> F.Column:
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4, 2)
    )


_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


# ---------------------------------------------------------------------------
# Correlated scalar subqueries → aggregate-then-broadcast-join
# ---------------------------------------------------------------------------


def q2_min_cost_part(spark, sf_dir):
    """TPC-H Q2 shape (adapted: no partsupp): parts priced at the
    minimum retail price of their type. The correlated MIN subquery is
    rewritten as a tiny groupBy aggregate broadcast back onto part —
    one scan + one broadcast join, no per-row subquery."""
    part = _t("part")(spark, sf_dir)
    mins = part.groupBy("p_type").agg(
        F.min("p_retailprice").alias("_min_price")
    )
    return (
        part.join(F.broadcast(mins), "p_type")
        .filter(F.col("p_retailprice") == F.col("_min_price"))
        .select("p_partkey", "p_name", "p_type", "p_retailprice")
    )


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: lineitems below 20% of their part's average
    quantity. Per-part thresholds are an aggregate joined back to
    lineitem (shuffle on l_partkey both sides — co-partitioned join),
    never a per-row correlated execution. Threshold arithmetic is
    decimal-sum / count * 0.2 in double: bit-identical across engines."""
    li = _t("lineitem")(spark, sf_dir)
    part = _t("part")(spark, sf_dir).filter(F.col("p_brand") == "Brand#3")
    thr = li.groupBy("l_partkey").agg(
        (
            F.sum(_dec("l_quantity")).cast("double")
            / F.count(F.lit(1))
            * F.lit(0.2)
        ).alias("_thr")
    )
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("_thr"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# Multi-way joins with disjunctive / pair filters
# ---------------------------------------------------------------------------


def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: revenue between a nation pair, both directions,
    grouped by (supplier nation, customer nation, ship year). Nation and
    supplier are broadcast; lineitem⋈orders is the only big shuffle."""
    nation = _t("nation")(spark, sf_dir)
    li = _t("lineitem")(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t("orders")(spark, sf_dir)
    cust = _t("customer")(spark, sf_dir)
    supp = _t("supplier")(spark, sf_dir)
    n1 = nation.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_cn_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.sum(_disc_price()).cast("double").alias("revenue"))


def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (profit = discounted revenue; no supplycost in
    this schema): nation × order-year profit on 'widget' parts."""
    part = _t("part")(spark, sf_dir).filter(F.col("p_name").contains("widget"))
    li = _t("lineitem")(spark, sf_dir)
    supp = _t("supplier")(spark, sf_dir)
    nation = _t("nation")(spark, sf_dir)
    orders = _t("orders")(spark, sf_dir)
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("sum_profit"))
    )


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    1997H1. Customer join is a plain shuffled join (customer is large
    at scale); nation is broadcast."""
    li = _t("lineitem")(spark, sf_dir).filter(F.col("l_returnflag") == "R")
    orders = _t("orders")(spark, sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    cust = _t("customer")(spark, sf_dir)
    nation = _t("nation")(spark, sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q19_disjunctive_filter(spark, sf_dir):
    """TPC-H Q19 shape: three OR'd conjunct groups over part⋈lineitem.
    Catalyst extracts the common l_partkey join key and pushes the
    per-branch part filters below the join."""
    li = _t("lineitem")(spark, sf_dir)
    part = _t("part")(spark, sf_dir)
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 5))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return j.filter(cond).agg(
        F.sum(_disc_price()).cast("double").alias("revenue")
    )


# ---------------------------------------------------------------------------
# Outer-join aggregation, HAVING with scalar subqueries, NOT IN
# ---------------------------------------------------------------------------


def q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts via a
    LEFT OUTER join (customers with zero orders included). Two
    aggregations: the first shuffles on c_custkey, the second on the
    (tiny-cardinality) count value."""
    cust = _t("customer")(spark, sf_dir)
    orders = _t("orders")(spark, sf_dir).filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q11_important_balances(spark, sf_dir):
    """TPC-H Q11 shape (supplier balances for partsupp value): nations
    holding more than 2% of global supplier balance. The global total is
    a single-row aggregate broadcast into the HAVING predicate — no
    driver-side collect."""
    supp = _t("supplier")(spark, sf_dir)
    total = supp.agg(F.sum(_dec("s_acctbal")).cast("double").alias("_tot"))
    per_nation = supp.groupBy("s_nationkey").agg(
        F.sum(_dec("s_acctbal")).alias("_val")
    )
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("_val").cast("double") > F.col("_tot") * 0.02)
        .select(
            "s_nationkey", F.col("_val").cast("double").alias("value")
        )
    )


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue. Revenue kept as exact decimal for the equality against the
    broadcast single-row MAX (decimal equality is exact cross-engine;
    doubles would be fragile)."""
    li = _t("lineitem")(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("_rev"))
    top = rev.agg(F.max("_rev").alias("_max"))
    supp = _t("supplier")(spark, sf_dir)
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("_rev") == F.col("_max"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("_rev").cast("double").alias("total_revenue"),
        )
    )


def q16_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier counts per part group,
    excluding suppliers from a NOT IN subquery (negative balances).
    The exclusion is a broadcast LEFT ANTI join; countDistinct expands
    to a two-phase aggregate (partial distinct map-side)."""
    li = _t("lineitem")(spark, sf_dir)
    part = _t("part")(spark, sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad_supp = (
        _t("supplier")(spark, sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp),
            li.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Semi-join chains and multi-EXISTS
# ---------------------------------------------------------------------------


def q20_semi_join_chain(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped > 100 units of 'small'
    parts in 1997 — an aggregate-qualified nested semi-join resolved as
    aggregate → semi-join, never a per-supplier subquery."""
    small_parts = (
        _t("part")(spark, sf_dir)
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = _t("lineitem")(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    qualified = (
        li.join(F.broadcast(small_parts), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > F.lit(100).cast("decimal(18,2)"))
        .select("l_suppkey")
    )
    supp = _t("supplier")(spark, sf_dir)
    nation = _t("nation")(spark, sf_dir)
    return (
        supp.join(qualified, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("s_name", "n_name")
    )


def q21_sole_fault_supplier(spark, sf_dir):
    """TPC-H Q21 shape (adapted: returnflag stands in for late
    receipt): suppliers who were the ONLY supplier with returned items
    on a multi-supplier finished order. The EXISTS / NOT EXISTS pair is
    one order-level aggregate (distinct supplier counts) joined back —
    two shuffles on l_orderkey total, instead of two correlated
    subquery executions."""
    orders_f = (
        _t("orders")(spark, sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    # One lineitem pass: collapse to (order, supplier, any-returned) first
    # — the heavy table is scanned/joined once, and the order-level
    # EXISTS/NOT-EXISTS stats aggregate the collapsed (much smaller)
    # relation, co-partitioned on l_orderkey for the join back.
    per_os = (
        _t("lineitem")(spark, sf_dir)
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.col("l_returnflag") == "R").cast("int")
            ).alias("_has_r")
        )
    )
    stats = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_ns"),
        F.sum("_has_r").alias("_nr"),
    )
    fault = (
        per_os.filter(F.col("_has_r") == 1)
        .join(stats, "l_orderkey")
        .filter((F.col("_ns") > 1) & (F.col("_nr") == 1))
        .select("l_orderkey", "l_suppkey")
    )
    supp = _t("supplier")(spark, sf_dir)
    return (
        fault.join(F.broadcast(supp), fault.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


def q12_priority_class(spark, sf_dir):
    """TPC-H Q12 shape (linestatus stands in for shipmode): per
    linestatus, how many 1997-shipped lineitems belong to high- vs
    low-priority orders. CASE-in-aggregate over one shuffled join."""
    li = _t("lineitem")(spark, sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t("orders")(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Window frames, percentiles, pivot
# ---------------------------------------------------------------------------


def window_moving_avg(spark, sf_dir):
    """Sliding window frame (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW):
    per-user 3-event moving average. One shuffle on user_id; the frame
    is evaluated streamingly within each partition."""
    ev = _t("events")(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("moving_avg"),
    )


def agg_percentiles(spark, sf_dir):
    """Exact percentiles (median & quartiles) of customer balance per
    market segment — F.percentile is Spark's exact linear-interpolation
    percentile, the twin of DuckDB's quantile_cont."""
    cust = _t("customer")(spark, sf_dir)
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile(F.col("c_acctbal"), F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile(F.col("c_acctbal"), F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile(F.col("c_acctbal"), F.lit(0.75)), 6).alias("p75"),
    )


def range_join_clicks_after_purchase(spark, sf_dir):
    """Binned range join (operators/range_join.py): for each purchase,
    the number of clicks by the same user within the following hour.
    The range predicate rides on a bin+user equi-join — shuffled hash
    join, never a nested-loop cross product."""
    from bazof_spark.operators.range_join import binned_range_join

    ev = _t("events")(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("p_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    joined = binned_range_join(
        clicks,
        purchases,
        point_ts="c_ts",
        interval_start="p_start",
        interval_end="p_end",
        keys=["user_id"],
        bin_width_seconds=3600,
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )


def events_session_window(spark, sf_dir):
    """Session windows (30-minute inactivity gap) per user — the batch
    twin of Structured Streaming's session_window. A new session starts
    when the gap since the previous event is >= the gap duration
    (Spark merges windows that strictly overlap). One shuffle on
    user_id; sessionization is then a per-partition sorted merge."""
    ev = _t("events")(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias(
                "session_start_us"
            ),
            "n_events",
            "sum_value",
        )
    )


def events_sliding_window(spark, sf_dir):
    """Sliding (hopping) windows: 1-hour windows every 30 minutes, so
    each event lands in exactly two windows. Spark expands the windows
    map-side (explode) then aggregates — one shuffle, 2× the rows."""
    ev = _t("events")(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def top_terms_per_lang(spark, sf_dir):
    """Lateral-view explode aggregation over documents: top-5 terms per
    language by frequency. Explode happens map-side (codegen'd
    Generate), the count is one shuffle on (lang, word), the top-k is a
    window over the (tiny) per-language aggregate.

    No up-front repartition: the groupBy's exchange fans the reduce side
    out regardless, the map side is a cheap tokenize whose partial
    aggregation combines map-side, and an extra full-text shuffle
    measurably dominates the query (2.9× at sf0.1 — BENCH_r02 vs r01)."""
    docs = _t("documents")(spark, sf_dir)
    words = docs.select(
        "lang",
        F.explode(
            F.expr(r"regexp_extract_all(lower(text), '[a-z0-9_]+', 0)")
        ).alias("word"),
    )
    counts = words.groupBy("lang", "word").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("word"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("lang", "word", "n", "rank")
    )


def set_ops_multiset(spark, sf_dir):
    """Multiset set operations (UNION ALL / EXCEPT ALL) — duplicate
    counts are part of the semantics, unlike the distinct variants in
    set_ops_active_customers. EXCEPT ALL is a count-bag subtraction:
    one aggregate per side on the hash key, no sort."""
    orders = _t("orders")(spark, sf_dir)
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    c = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).exceptAll(c)


def pivot_status_by_year(spark, sf_dir):
    """Pivot: order counts per year × status. Explicit pivot value list
    keeps it one pass (no extra distinct-values job); missing cells are
    0, not null, to match the CASE-count oracle."""
    orders = _t("orders")(spark, sf_dir)
    p = (
        orders.groupBy(F.year("o_orderdate").alias("o_year"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_year",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("O", "F", "P")],
    )


def embedding_matryoshka_topk(spark, sf_dir):
    """Two-stage matryoshka search (operators/similarity.matryoshka_topk):
    coarse cosine over the first 16 dims keeps 25 candidates per query;
    exact full-vector re-rank returns top-5. The oracle runs the same
    two cutoffs in SQL."""
    from bazof_spark.operators.similarity import matryoshka_topk

    emb = _t("embeddings")(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10).withColumnRenamed(
        "vec_id", "query_id"
    )
    return matryoshka_topk(
        emb, queries, prefix_dims=16, candidates=25, k=5
    ).withColumn("cosine_sim", F.round("cosine_sim", 6))


_STRATA_RATES = {"en": 0.25, "de": 1.0, "fr": 1.0, "es": 0.5, "zh": 0.4}


def stratified_sample_by_lang(spark, sf_dir):
    """Language rebalancing (functions/sampling.stratified_sample):
    downsample the dominant language, keep the rare ones — per-stratum
    deterministic md5-bucket sampling, map-only, stable under appends.
    The oracle recomputes the identical bucket arithmetic."""
    from bazof_spark.functions.sampling import stratified_sample

    docs = _t("documents")(spark, sf_dir).select("doc_id", "lang")
    return stratified_sample(docs, "lang", _STRATA_RATES)


def weighted_sample_docs(spark, sf_dir):
    """Weighted sampling without replacement
    (functions/sampling.weighted_sample_per_group): 5 documents per
    language with inclusion probability proportional to length
    (n_chars) — the Efraimidis–Spirakis exponential-key scheme on a
    deterministic identity hash, so runs/engines/appends agree. One
    rank-window exchange carrying (lang, key, id)."""
    from bazof_spark.functions.sampling import weighted_sample_per_group

    docs = _t("documents")(spark, sf_dir).select("doc_id", "lang", "n_chars")
    return weighted_sample_per_group(
        docs, ["lang"], "n_chars", k=5, id_col="doc_id", salt="ws1"
    ).select("lang", "doc_id", "n_chars", "sample_rank")


def quality_select_per_lang(spark, sf_dir):
    """Quality-quantile selection — the FILTERING step that completes
    the quality-scoring story: keep the top half of documents per
    language by quality score (rank-based, not threshold-based, so the
    kept fraction is exact regardless of score distribution — the
    standard way training pipelines enforce per-language quality
    budgets). Deterministic across engines: ranking orders by the
    ROUNDED score (both engines agree on it bit-for-bit — see
    text_quality) with doc_id tie-break. One window exchange on lang;
    scoring is pure Column regex arithmetic, whole-stage codegen."""
    from bazof_spark.functions.text import quality_score

    docs = _t("documents")(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        "lang",
        F.round(quality_score(F.col("text")), 6).alias("quality"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("lang")))
        .filter(F.col("rn") <= F.ceil(F.col("_n") * F.lit(0.5)))
        .select(
            "doc_id",
            "lang",
            "quality",
            F.col("rn").cast("long").alias("lang_rank"),
        )
    )


def agg_cube_orders(spark, sf_dir):
    """CUBE over (o_orderstatus, o_orderpriority) computed from the
    finest-level partials (operators/agg.cube_from_partials): the fact
    table is scanned and shuffled ONCE; the other 3 grouping sets
    re-aggregate a ≤15-row relation — vs built-in cube()'s 4× Expand of
    every input row before the partial aggregate."""
    from bazof_spark.operators.agg import cube_from_partials

    orders = _t("orders")(spark, sf_dir)
    cube = cube_from_partials(
        orders,
        keys=["o_orderstatus", "o_orderpriority"],
        measures={
            "n_orders": (F.count(F.lit(1)), "sum"),
            "sum_price": (F.sum(_dec("o_totalprice")), "sum"),
            "max_price": (F.max(_dec("o_totalprice")), "max"),
        },
    )
    return cube.select(
        "o_orderstatus",
        "o_orderpriority",
        "n_orders",
        F.col("sum_price").cast("double").alias("sum_price"),
        F.col("max_price").cast("double").alias("max_price"),
    )


def doc_chunking(spark, sf_dir):
    """RAG-style chunking (operators/chunking.chunk_documents): 64-token
    windows, 16-token overlap, map-only. The oracle recomputes every
    window boundary with the same integer arithmetic."""
    from bazof_spark.operators.chunking import chunk_documents

    docs = _t("documents")(spark, sf_dir).select("doc_id", "text")
    return chunk_documents(docs, chunk_tokens=64, overlap=16)


def bucketed_colocated_join(spark, sf_dir):
    """Fact⋈fact join over the bucketed layout (sources/bucketed.py):
    lineitem and orders written once as 16-bucket tables hash-
    partitioned on the orderkey, so the join runs with NO exchange on
    either side — the write paid the shuffle once. The only exchange
    left is the final group-by. Oracle: the plain join."""
    import hashlib

    from bazof_spark.sources.bucketed import bucketed_join, write_bucketed

    import tempfile

    from bazof_spark.sources.tables import source_tag
    tag = source_tag(sf_dir, "lineitem", "orders")[:10]
    root = os.path.join(tempfile.gettempdir(), f"bazof_bucketed_{tag}")
    lt, ot = f"lineitem_b_{tag}", f"orders_b_{tag}"
    # external tables under /tmp; rebuilt once per session (the catalog
    # is in-memory, so tableExists is per-session)
    if not spark.catalog.tableExists(lt):
        write_bucketed(
            _t("lineitem")(spark, sf_dir).select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            lt,
            "l_orderkey",
            16,
            path=os.path.join(root, lt),
        )
    if not spark.catalog.tableExists(ot):
        write_bucketed(
            _t("orders")(spark, sf_dir).select(
                "o_orderkey", "o_orderpriority"
            ),
            ot,
            "o_orderkey",
            16,
            path=os.path.join(root, ot),
        )
    j = bucketed_join(spark, lt, ot, "l_orderkey", "o_orderkey")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(_disc_price().cast("decimal(28,4)"))
        .cast("double")
        .alias("revenue"),
    )


def asof_join_tolerance(spark, sf_dir):
    """As-of join with a freshness bound (operators/asof.asof_join
    tolerance= — pandas merge_asof semantics): each click matched to
    the latest same-user purchase at most 48h older; staler carries are
    dropped. Left join so unmatched clicks surface with nulls; the
    oracle is the windowed-max formulation (DuckDB's ASOF JOIN has no
    tolerance clause)."""
    from datetime import timedelta

    from bazof_spark.operators.asof import asof_join

    ev = _t("events")(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
        .select("user_id", F.col("ts").alias("purchase_ts"), "purchase_value")
    )
    joined = asof_join(
        clicks,
        purchases,
        key="user_id",
        probe_ts="click_ts",
        build_ts="purchase_ts",
        how="left",
        tolerance=timedelta(hours=48),
    )
    return joined.select(
        "click_id",
        "user_id",
        F.unix_micros("click_ts").alias("click_ts_us"),
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        "purchase_value",
    )


def jsonl_roundtrip(spark, sf_dir):
    """Second source format end-to-end (sources/jsonl.py): documents
    materialized as gzip JSONL shards once, read back with explicit
    schema + corrupt-record quarantine. md5(text) proves the corpus
    text survives JSON encode/decode byte-identically; the oracle reads
    the original parquet."""
    from bazof_spark.sources.jsonl import (
        documents_as_jsonl,
        read_jsonl_corpus,
    )

    path = documents_as_jsonl(spark, sf_dir)
    docs = read_jsonl_corpus(spark, path)
    return docs.select(
        "doc_id", "lang", "source", "n_chars",
        F.md5("text").alias("text_digest"),
    )


def skew_salted_join(spark, sf_dir):
    """Skew-mitigation surface (operators/skew.salted_join): orders
    joined to a 5-row priority dimension — the canonical worst case
    (5 distinct keys → at most 5 shuffle partitions do work without
    salting). The salted plan spreads each hot key over 16 salts;
    result provably equals the plain join (the oracle IS the plain
    join). Weighted sum uses decimal so both engines agree bit-for-bit."""
    from bazof_spark.operators.skew import salted_join

    # project the fact side FIRST: the salt hashes the row, so an
    # unprojected frame would drag every column through the plan
    orders = _t("orders")(spark, sf_dir).select(
        "o_orderpriority", "o_totalprice"
    )
    dim = spark.createDataFrame(
        [
            ("1-URGENT", 5),
            ("2-HIGH", 4),
            ("3-MEDIUM", 3),
            ("4-NOT SPECIFIED", 2),
            ("5-LOW", 1),
        ],
        "o_orderpriority string, weight long",
    )
    j = salted_join(orders, dim, on="o_orderpriority", n_salts=16)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            (_dec("o_totalprice") * F.col("weight")).cast("decimal(28,2)")
        ).cast("double").alias("weighted_price"),
    )


def rollup_events_hourly(spark, sf_dir):
    """Incremental continuous aggregate (operators/rollup.Rollup):
    hourly (bucket, event_type) partials materialized once up to a
    fixed watermark (2024-01-22), then queries answer from
    materialized ∪ aggregated-tail — history is never re-scanned.
    Result provably equals the full GROUP BY (the DuckDB oracle IS the
    full recompute). Measures merge losslessly: count→sum, decimal
    sum→sum, max→max."""
    import hashlib
    import os
    import tempfile
    from datetime import datetime, timezone

    from bazof_spark.operators.rollup import Rollup

    ev = _t("events")(spark, sf_dir)
    measures = {
        "n_events": (F.count(F.lit(1)), "sum"),
        "sum_value": (F.sum(F.col("value").cast("decimal(18,6)")), "sum"),
        "max_value": (F.max("value"), "max"),
    }
    from bazof_spark.sources.tables import source_tag
    tag = source_tag(sf_dir, "events")
    path = os.path.join(tempfile.gettempdir(), f"bazof_rollup_{tag}")
    r = Rollup(spark, path, "ts", ["event_type"], measures, 3600)
    if r.watermark() is None:
        r.build(ev, datetime(2024, 1, 22, tzinfo=timezone.utc))
    return r.read(ev).select(
        F.unix_micros(F.col("bucket_start")).alias("bucket_start_us"),
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "max_value",
    )


def semdedup_prune_q(spark, sf_dir):
    """SemDeDup semantic pruning (operators/similarity.semdedup_prune)
    with the deterministic corpus-slice quantizer convention of
    embedding_ann_ivf (centroids = unit-normalized embeddings of vec_id
    0..15) so cluster assignment — and therefore the pruned set — is
    reproducible in the DuckDB oracle."""
    import numpy as np

    from bazof_spark.operators.similarity import semdedup_prune

    emb = _t("embeddings")(spark, sf_dir)
    cent_rows = (
        emb.filter(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    cent = np.array(
        [np.asarray(r["embedding"], dtype=np.float64) for r in cent_rows]
    )
    return semdedup_prune(emb, cent, threshold=0.35)


_MIX_PCT = {"en": 30, "de": 20, "fr": 20, "es": 15, "zh": 15}


def mixture_by_lang(spark, sf_dir):
    """Dataset-mixture resampling (functions/sampling.mixture_sample):
    resample the corpus to a 40% budget with fixed language proportions
    — integer-only target/cutoff arithmetic, oversample-then-trim so
    the rank window sees O(target) rows per stratum, never the whole
    corpus. The oracle recomputes the identical integer pipeline."""
    from bazof_spark.functions.sampling import mixture_sample

    docs = _t("documents")(spark, sf_dir).select("doc_id", "lang")
    return mixture_sample(docs, "lang", _MIX_PCT, budget_num=2, budget_den=5)


def ngram_decontamination_q(spark, sf_dir):
    """Verbatim 5-gram containment decontamination
    (operators/dedup.ngram_decontaminate): eval set = doc_id < 25,
    corpus = the rest — flags corpus docs that embed eval n-grams even
    when whole-document similarity is low. (Real pipelines use 8-13
    grams; these synthetic docs are short, so 5 keeps the result
    non-trivial.)"""
    from bazof_spark.operators.dedup import ngram_decontaminate

    docs = _t("documents")(spark, sf_dir)
    return ngram_decontaminate(
        docs.filter(F.col("doc_id") >= 25),
        docs.filter(F.col("doc_id") < 25),
        n=5,
    )


def lm_unigram_score(spark, sf_dir):
    """CCNet-style LM quality signal: train an add-1-smoothed unigram
    model on the trusted slice (lang='en'), score EVERY document by mean
    token log-probability. vocab_size=16 < the corpus' 31 distinct
    tokens, so the top-V cut (with count ties broken by token) and the
    OOV smoothing path are both genuinely exercised.

    Plan: training is one map-side-combined groupBy over the en slice +
    a 16-row TakeOrdered; scoring is explode → broadcast-join the 16-row
    model → per-doc partial agg (~one shuffled row per document). See
    operators/lm.py for the 100 TB rationale."""
    from bazof_spark.operators.lm import train_unigram_lm, unigram_logprob

    docs = _t("documents")(spark, sf_dir)
    model = train_unigram_lm(docs.filter(F.col("lang") == "en"), vocab_size=16)
    out = unigram_logprob(docs, model)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("avg_logprob", 6).alias("avg_logprob"),
    )


def events_funnel(spark, sf_dir):
    """Ordered conversion funnel over the event stream: users with a
    view, then a click strictly after their FIRST view, then a purchase
    strictly after that first qualifying click. Each stage is one
    min-aggregate on user_id plus a co-partitioned join — three shuffles
    on the same key, no fact-table self-join blowup (the per-user
    firsts, not the raw events, flow between stages)."""
    from pyspark import StorageLevel

    ev = _t("events")(spark, sf_dir)
    # each stage's per-user firsts are referenced TWICE (the next stage
    # joins them; the final count reads them) and Spark shares no
    # subplans across DataFrame references, so the view stage executed
    # 3x and the click stage 2x — 12 event scans for a 3-stage funnel
    # (opt round 1, guide §2.4). persist() lets the cache manager
    # substitute ONE InMemoryRelation for every reference — each stage
    # computes once, lazily, inside the same job (no extra eager jobs);
    # rows, aggregation order, and results are unchanged. At scale
    # these relations are bounded by user count, not event count — the
    # docstring's contract already.
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view_users"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_users")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_users")))
    )


def events_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix: cohort = week of a user's first signup,
    cell = distinct cohort users active (any event) in each later week.
    Week offsets are exact integer arithmetic on week-truncated epochs,
    so both engines bucket identically. Shuffle shape: two user_id
    aggregations + one co-partitioned join; the output matrix
    (weeks × offsets) is tiny however large the event log."""
    ev = _t("events")(spark, sf_dir)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cw"))
    )
    a = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("aw")
    ).distinct()
    j = s.join(a, "user_id").filter(F.col("aw") >= F.col("cw"))
    return (
        j.groupBy(
            F.col("cw").alias("cohort_week"),
            (
                (
                    F.unix_timestamp("aw") - F.unix_timestamp("cw")
                )
                / F.lit(604800)
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def graph_pagerank_supply(spark, sf_dir):
    """PageRank over the symmetrized supplier–part co-occurrence graph
    (edges from distinct lineitem pairs, both directions so the chain is
    ergodic and no rank mass dangles), 3 synchronous supersteps at
    d=0.85. One co-partitioned join + one map-side-combined shuffle per
    superstep — see operators/graph.py."""
    from bazof_spark.operators.graph import pagerank

    li = _t("lineitem")(spark, sf_dir)
    # numeric node ids (supplier → 2k, part → 2k+1): BIGINT keys shuffle
    # and join far cheaper than concat'd strings; symmetrization is one
    # explode over the distinct pairs, not a union that re-runs the
    # distinct's shuffle twice
    s = (F.col("l_suppkey") * 2).alias("s")
    p = (F.col("l_partkey") * 2 + 1).alias("p")
    base = li.select(s, p).distinct()
    edges = base.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("src"), F.col("p").alias("dst")),
                F.struct(F.col("p").alias("src"), F.col("s").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # symmetrized ⇒ every node is some edge's dst: the per-superstep
    # dangling-node join is provably a no-op and skipped
    pr = pagerank(edges, iterations=3, damping=0.85, every_node_receives=True)
    return pr.select("node", F.round("pr", 9).alias("pr"))


def events_gapfill_hourly(spark, sf_dir):
    """Hypertable-style time_bucket_gapfill (operators/gapfill): hourly
    per-event-type sums densified to EVERY hour between the series
    bounds — counts zero-filled, the value LOCF-carried (null before a
    type's first observation). The spine is types × sequence() from a
    broadcast 1-row bounds aggregate; the fact table is touched exactly
    once, by the bucket aggregation."""
    from bazof_spark.operators.gapfill import gapfill

    ev = _t("events")(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("_v"),
    )
    dense = gapfill(
        hourly,
        keys=["event_type"],
        ts_col="hour",
        step="1 hour",
        locf_cols=("_v",),
        zero_cols=("n_events",),
    )
    return dense.select(
        "event_type",
        "hour",
        "n_events",
        F.round("_v", 6).alias("filled_value"),
    )


def hybrid_rrf_search(spark, sf_dir):
    """Hybrid retrieval (operators/retrieval.rrf_fuse): BM25 top-20 for
    a bag-of-words query fused with dense cosine top-20 for a query
    embedding (vec_id 0) by reciprocal-rank fusion, k=60 — documents
    and embeddings are aligned corpora (doc_id ≡ vec_id). The fusion
    joins two ≤20-row lists; all heavy work happens inside the two
    retrievers."""
    from pyspark.sql.window import Window

    from bazof_spark.operators.retrieval import bm25_rank, rrf_fuse
    from bazof_spark.operators.similarity import cosine_topk_bruteforce

    docs = _t("documents")(spark, sf_dir)
    emb = _t("embeddings")(spark, sf_dir)
    bm = bm25_rank(docs, ["merge", "scan", "hash"], top_k=20)
    bm = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id").asc()))
        .alias("rank"),
    )
    q0 = emb.filter(F.col("vec_id") == 0).withColumnRenamed(
        "vec_id", "query_id"
    )
    dn = cosine_topk_bruteforce(emb, q0, k=20).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rank")
    )
    fused = rrf_fuse({"bm25": bm, "dense": dn}, id_col="doc_id", top_k=10)
    return fused.select(
        "doc_id",
        F.round("rrf_score", 9).alias("rrf_score"),
        F.col("rank_bm25").alias("bm25_rank"),
        F.col("rank_dense").alias("dense_rank"),
    )


def gopher_quality_filter(spark, sf_dir):
    """Gopher-rule composite document filter (Rae et al. 2021 §A1.1,
    thresholds adapted to this corpus' short synthetic docs): word-count
    band, mean-word-length band, symbol ratio, stopword evidence, and
    duplicate-word repetition, each surfaced as its own flag plus the
    conjunction. All pure Column expressions — map-only, whole-stage
    codegen, zero shuffle; at 100 TB this runs at parquet-scan speed
    like text_quality (SCALING.md)."""
    from bazof_spark.functions.repetition import word_repetition_ratio
    from bazof_spark.functions.text import LANG_MARKERS

    docs = _t("documents")(spark, sf_dir)
    t = F.col("text")
    words = F.regexp_count(t, F.lit(r"[A-Za-z0-9_]+"))
    letters = F.regexp_count(t, F.lit(r"[A-Za-z0-9_]"))
    # identity form — see functions/text.punct_count for why
    punct = F.length(t) - letters - F.regexp_count(t, F.lit(r"\s"))
    stops = F.regexp_count(
        t, F.lit(r"(?i)\b(" + "|".join(LANG_MARKERS["en"]) + r")\b")
    )
    n = F.length(t)
    mwl = letters / words
    ok_words = (words >= 20) & (words <= 1000)
    ok_mwl = (words > 0) & (mwl >= 3.0) & (mwl <= 10.0)
    ok_sym = (n > 0) & (punct / n <= 0.2)
    ok_stop = stops >= 2
    ok_rep = word_repetition_ratio(t) <= 0.4
    return docs.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        ok_words.alias("ok_words"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_stop.alias("ok_stopwords"),
        ok_rep.alias("ok_repetition"),
        (ok_words & ok_mwl & ok_sym & ok_stop & ok_rep).alias("keep"),
    )


def lm_bigram_score(spark, sf_dir):
    """Interpolated bigram LM scoring (operators/lm.bigram_logprob):
    p = 0.7·p_bigram + 0.3·p_unigram with unseen-context fallback to
    pure unigram. Models trained on the en slice: top-16 unigrams
    (same as lm_unigram_score) and top-64 bigrams — both cuts are
    genuinely exercised (the corpus has ~31 distinct tokens and
    hundreds of distinct bigrams)."""
    from bazof_spark.operators.lm import (
        bigram_logprob,
        train_bigram_lm,
        train_unigram_lm,
    )

    docs = _t("documents")(spark, sf_dir)
    en = docs.filter(F.col("lang") == "en")
    uni = train_unigram_lm(en, vocab_size=16)
    bi = train_bigram_lm(en, max_bigrams=64)
    out = bigram_logprob(docs, uni, bi, lam=0.7)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("avg_logprob", 6).alias("avg_logprob"),
    )


def dedup_edit_distance(spark, sf_dir):
    """Character-level near-dup pairs (operators/dedup.
    edit_distance_pairs): 12-char prefix blocking, length-diff pruning
    in the join, thresholded JVM Levenshtein verify (d=16)."""
    from bazof_spark.operators.dedup import edit_distance_pairs

    docs = _t("documents")(spark, sf_dir)
    return edit_distance_pairs(docs, max_dist=16, prefix_len=12)


def scd2_user_event_type(spark, sf_dir):
    """SCD2 dimension build (operators/scd.scd2_from_log): per user,
    compress the event stream into event_type VERSIONS — one row per
    change, with [valid_from, valid_to) interval micros and an
    is_current flag. One hash shuffle on user_id; both window passes
    share its partitioning. event_id breaks same-timestamp ties so the
    compression is a total order, deterministic across engines."""
    from bazof_spark.operators.scd import scd2_from_log

    ev = _t("events")(spark, sf_dir)
    out = scd2_from_log(
        ev,
        key_cols="user_id",
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    )


def dsir_importance_weights(spark, sf_dir):
    """DSIR (Xie 2023) hashed-n-gram importance weights: p_target fit
    on the lang='en' slice, p_raw on the whole corpus, every doc
    scored by Σ log-ratio over its hashed unigram+bigram buckets
    (operators/dsir.py — the published data-selection recipe). Bucket
    hashing is the engine-identical md5→BIGINT construction, so the
    oracle reproduces every bucket; the weight sum is rounded to 6
    like the LM scores. Plan: map-only featurization, two ≤256-row
    map-side-combined distribution aggs, one broadcast ratio join,
    one per-doc partial agg."""
    from bazof_spark.operators.dsir import dsir_log_weights
    from bazof_spark.sources.tables import rebalance_if_undersplit

    # rebalance: the gram explode + md5 is per-row compute that a
    # single-file scan would serialize onto one core (same rationale
    # as workload._docs_par for the codec queries)
    docs = rebalance_if_undersplit(spark, _t("documents")(spark, sf_dir))
    out = dsir_log_weights(docs, F.col("lang") == "en", n_buckets=256)
    return out.select(
        "doc_id",
        "n_grams",
        F.round("log_weight", 6).alias("log_weight"),
    )


QUERIES_EXT = {
    "scd2_user_event_type": scd2_user_event_type,
    "dsir_importance_weights": dsir_importance_weights,
    "lm_unigram_score": lm_unigram_score,
    "lm_bigram_score": lm_bigram_score,
    "dedup_edit_distance": dedup_edit_distance,
    "gopher_quality_filter": gopher_quality_filter,
    "events_gapfill_hourly": events_gapfill_hourly,
    "hybrid_rrf_search": hybrid_rrf_search,
    "events_funnel": events_funnel,
    "events_retention_cohorts": events_retention_cohorts,
    "graph_pagerank_supply": graph_pagerank_supply,
    "semdedup_prune": semdedup_prune_q,
    "mixture_by_lang": mixture_by_lang,
    "ngram_decontamination": ngram_decontamination_q,
    "q2_min_cost_part": q2_min_cost_part,
    "q7_volume_shipping": q7_volume_shipping,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q11_important_balances": q11_important_balances,
    "q12_priority_class": q12_priority_class,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_variety": q16_supplier_variety,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_disjunctive_filter": q19_disjunctive_filter,
    "q20_semi_join_chain": q20_semi_join_chain,
    "q21_sole_fault_supplier": q21_sole_fault_supplier,
    "range_join_clicks_after_purchase": range_join_clicks_after_purchase,
    "events_session_window": events_session_window,
    "events_sliding_window": events_sliding_window,
    "window_moving_avg": window_moving_avg,
    "agg_percentiles": agg_percentiles,
    "top_terms_per_lang": top_terms_per_lang,
    "set_ops_multiset": set_ops_multiset,
    "pivot_status_by_year": pivot_status_by_year,
    "rollup_events_hourly": rollup_events_hourly,
    "skew_salted_join": skew_salted_join,
    "jsonl_roundtrip": jsonl_roundtrip,
    "asof_join_tolerance": asof_join_tolerance,
    "bucketed_colocated_join": bucketed_colocated_join,
    "doc_chunking": doc_chunking,
    "agg_cube_orders": agg_cube_orders,
    "stratified_sample_by_lang": stratified_sample_by_lang,
    "weighted_sample_docs": weighted_sample_docs,
    "quality_select_per_lang": quality_select_per_lang,
    "embedding_matryoshka_topk": embedding_matryoshka_topk,
}

ORACLES_EXT = {
    # Efraimidis–Spirakis weighted sampling: key = -ln(u)/w with u
    # derived from the identity hash; k smallest keys per group win.
    # 1152921504606846977 = 2^60 + 1 (the double literal rounds to 2^60
    # in BOTH engines, keeping the IEEE arithmetic identical).
    "weighted_sample_docs": """
        WITH keyed AS (
            SELECT lang, doc_id, n_chars,
                   -ln((CAST('0x' || substr(
                            md5(CAST(doc_id AS VARCHAR) || 'ws1'), 1, 15)
                        AS BIGINT) + 1.0) / 1152921504606846977.0)
                       / n_chars AS _key
            FROM documents
            WHERE n_chars IS NOT NULL AND n_chars > 0
        ),
        r AS (
            SELECT lang, doc_id, n_chars, row_number() OVER (
                PARTITION BY lang ORDER BY _key, doc_id
            ) AS sample_rank FROM keyed
        )
        SELECT lang, doc_id, n_chars, CAST(sample_rank AS INT) AS sample_rank
        FROM r WHERE sample_rank <= 5
    """,
    # SCD2: compress consecutive same-type observations per user (total
    # order: ts then event_id), then close each version's interval with
    # the next version's start. Change detection mirrors the operator's
    # null-safe eqNullSafe contract: the FIRST observation always opens
    # a version (rn = 1 — `prev_type IS NULL` could not distinguish
    # lag-at-start from a genuinely NULL previous attribute), and
    # IS DISTINCT FROM keeps NULL→NULL as "unchanged", NULL↔value as a
    # change, independent of whether the fixture carries NULL attrs.
    "scd2_user_event_type": """
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ),
        versions AS (
            SELECT user_id, event_type, ts, event_id FROM ordered
            WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type
        ),
        closed AS (
            SELECT user_id, event_type,
                   epoch_us(ts) AS valid_from_us,
                   epoch_us(lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   )) AS valid_to_us
            FROM versions
        )
        SELECT user_id, event_type, valid_from_us, valid_to_us,
               valid_to_us IS NULL AS is_current
        FROM closed
    """,
    # interpolated bigram LM: p = 0.7*p_bi + (1.0-0.7)*p_uni (the
    # (1.0 - 0.7) expression keeps the IEEE double identical across
    # engines); unseen context or first token -> pure add-1 unigram
    "lm_bigram_score": """
        WITH tt AS (
            SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
              FROM documents WHERE lang = 'en'
        ),
        train_toks AS (SELECT unnest(t) AS token FROM tt),
        vocab AS (
            SELECT token, count(*) AS cnt FROM train_toks
             GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 16
        ),
        stats AS (SELECT sum(cnt) AS total, count(*) AS v FROM vocab),
        tp0 AS (
            SELECT unnest(CASE WHEN len(t) >= 2
                THEN list_transform(range(2, len(t) + 1),
                     i -> {'prev': t[i-1], 'tok': t[i]})
                ELSE CAST([] AS STRUCT(prev VARCHAR, tok VARCHAR)[]) END) AS pr
              FROM tt
        ),
        tp AS (SELECT pr.prev AS prev, pr.tok AS tok FROM tp0),
        bigrams AS (
            SELECT prev, tok, count(*) AS cnt FROM tp
             GROUP BY prev, tok
             ORDER BY cnt DESC, prev ASC, tok ASC LIMIT 64
        ),
        ptot AS (SELECT prev, sum(cnt) AS ptot FROM bigrams GROUP BY prev),
        dt AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
              FROM documents
        ),
        dp0 AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t) + 1),
                       i -> {'prev': CASE WHEN i = 1 THEN NULL
                                          ELSE t[i-1] END,
                             'tok': t[i]})) AS pr
              FROM dt WHERE len(t) >= 1
        ),
        dp AS (SELECT doc_id, pr.prev AS prev, pr.tok AS tok FROM dp0),
        sc AS (
            SELECT d.doc_id,
                   ln(CASE WHEN pt.ptot IS NOT NULL AND d.prev IS NOT NULL
                       THEN 0.7 * (coalesce(bg.cnt, 0) / pt.ptot)
                          + (1.0 - 0.7) * ((coalesce(v.cnt, 0) + 1.0)
                              / (s.total + 1.0 * (s.v + 1)))
                       ELSE (coalesce(v.cnt, 0) + 1.0)
                              / (s.total + 1.0 * (s.v + 1)) END) AS lp
              FROM dp d
              LEFT JOIN vocab v ON v.token = d.tok
              LEFT JOIN bigrams bg ON bg.prev = d.prev AND bg.tok = d.tok
              LEFT JOIN ptot pt ON pt.prev = d.prev
              CROSS JOIN stats s
        )
        SELECT doc_id, count(*) AS n_tokens,
               round(avg(lp), 6) AS avg_logprob
          FROM sc GROUP BY doc_id
    """,
    # prefix-blocked bounded Levenshtein pairs; identical blocking,
    # length-diff bound and threshold on both engines. rep = the
    # operator's collapse_exact (min doc_id per byte-identical text)
    "dedup_edit_distance": """
        WITH rep AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
                  FROM documents
            ) WHERE doc_id = keep_id
        ),
        d AS (
            SELECT doc_id, text,
                   substr(text, 1, 12) AS p,
                   length(text) AS ln
              FROM rep
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(a.text, b.text) AS INT) AS edit_dist
          FROM d a JOIN d b
            ON a.p = b.p
           AND a.doc_id < b.doc_id
           AND abs(a.ln - b.ln) <= 16
         WHERE levenshtein(a.text, b.text) <= 16
    """,
    # Gopher composite: same regex counters as the text_stats/quality
    # oracles; repetition = 1 - distinct/total whitespace words
    "gopher_quality_filter": r"""
        WITH m AS (
            SELECT doc_id,
                   length(text) AS n,
                   len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS words,
                   len(regexp_extract_all(text, '[^\sA-Za-z0-9_]')) AS punct,
                   len(regexp_extract_all(text,
                       '(?i)\b(the|and|of|to|a|in|is|that)\b')) AS stops,
                   len(regexp_extract_all(text, '[A-Za-z0-9_]')) AS letters,
                   CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 0
                        THEN 1.0
                             - len(list_distinct(regexp_split_to_array(
                                   trim(text), '\s+'))) * 1.0
                               / len(regexp_split_to_array(trim(text), '\s+'))
                        ELSE 0.0 END AS rep
              FROM documents
        )
        SELECT doc_id,
               CAST(words AS BIGINT) AS n_words,
               (words >= 20 AND words <= 1000) AS ok_words,
               (words > 0 AND letters * 1.0 / words >= 3.0
                          AND letters * 1.0 / words <= 10.0)
                   AS ok_mean_word_len,
               (n > 0 AND punct * 1.0 / n <= 0.2) AS ok_symbol_ratio,
               (stops >= 2) AS ok_stopwords,
               (rep <= 0.4) AS ok_repetition,
               (words >= 20 AND words <= 1000
                AND words > 0 AND letters * 1.0 / words >= 3.0
                           AND letters * 1.0 / words <= 10.0
                AND n > 0 AND punct * 1.0 / n <= 0.2
                AND stops >= 2 AND rep <= 0.4) AS keep
          FROM m
    """,
    # time_bucket_gapfill: spine = types × every hour between global
    # bounds; n_events zero-filled, value LOCF (null before first obs)
    "events_gapfill_hourly": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events, sum(value) AS v
              FROM events GROUP BY 1, 2
        ),
        b AS (
            SELECT date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
              FROM events
        ),
        spine AS (
            SELECT t.event_type,
                   unnest(generate_series(b.lo, b.hi,
                                          INTERVAL 1 HOUR)) AS hour
              FROM (SELECT DISTINCT event_type FROM events) t
              CROSS JOIN b
        ),
        j AS (
            SELECT s.event_type, s.hour, h.n_events, h.v
              FROM spine s LEFT JOIN hourly h
                ON h.event_type = s.event_type AND h.hour = s.hour
        )
        SELECT event_type, hour,
               coalesce(n_events, 0) AS n_events,
               round(last_value(v IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY hour
                   ROWS UNBOUNDED PRECEDING), 6) AS filled_value
          FROM j
    """,
    # RRF hybrid: bm25 top-20 (same scoring CTEs as bm25_search) fused
    # with dense cosine top-20 for query vec 0; rrf = sum 1/(60+rank)
    "hybrid_rrf_search": """
        WITH w AS (
            SELECT doc_id AS id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
            FROM documents
        ),
        dl AS (SELECT id, COUNT(*) AS dln FROM w GROUP BY id),
        st AS (SELECT COUNT(*) AS n, AVG(dln) AS avgdl FROM dl),
        tf AS (
            SELECT id, t, COUNT(*) AS tfreq FROM w
            WHERE t IN ('merge', 'scan', 'hash') GROUP BY id, t
        ),
        dfq AS (SELECT t, COUNT(*) AS dfreq FROM tf GROUP BY t),
        s AS (
            SELECT tf.id,
                   ln((st.n - dfq.dfreq + 0.5) / (dfq.dfreq + 0.5) + 1.0)
                   * (tf.tfreq * 2.2)
                   / (tf.tfreq + 1.2 * (0.25 + 0.75 * dl.dln / st.avgdl))
                       AS sc
            FROM tf JOIN dfq USING (t) JOIN dl USING (id) CROSS JOIN st
        ),
        bmscore AS (SELECT id, SUM(sc) AS score FROM s GROUP BY id),
        bmr AS (
            SELECT id, brank FROM (
                SELECT id, CAST(row_number() OVER (
                    ORDER BY score DESC, id ASC) AS INT) AS brank
                FROM bmscore
            ) WHERE brank <= 20
        ),
        q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id = 0
        ),
        c AS (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings
        ),
        ds AS (
            SELECT cid, list_cosine_similarity(qv, cv) AS sim
              FROM c, q WHERE cid != 0
        ),
        dsr AS (
            SELECT cid AS id, drank FROM (
                SELECT cid, CAST(row_number() OVER (
                    ORDER BY sim DESC, cid ASC) AS INT) AS drank
                FROM ds
            ) WHERE drank <= 20
        ),
        f AS (
            SELECT coalesce(bmr.id, dsr.id) AS doc_id,
                   coalesce(1.0 / (60 + brank), 0)
                 + coalesce(1.0 / (60 + drank), 0) AS rrf,
                   brank, drank
              FROM bmr FULL OUTER JOIN dsr ON bmr.id = dsr.id
        )
        SELECT doc_id, round(rrf, 9) AS rrf_score,
               brank AS bm25_rank, drank AS dense_rank
          FROM f ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
    """,
    # funnel: first view → first later click → first later purchase
    "events_funnel": """
        WITH v AS (
            SELECT user_id, min(ts) AS t1 FROM events
             WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS t2
              FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t1
             WHERE e.event_type = 'click' GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS t3
              FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t2
             WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM v) AS n_view_users,
               (SELECT count(*) FROM c) AS n_click_users,
               (SELECT count(*) FROM p) AS n_purchase_users
    """,
    # cohort week = week of first signup; activity = any event week
    "events_retention_cohorts": """
        WITH s AS (
            SELECT user_id, date_trunc('week', min(ts)) AS cw
              FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        a AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
        )
        SELECT s.cw AS cohort_week,
               CAST((epoch(a.aw) - epoch(s.cw)) / 604800 AS BIGINT)
                   AS week_offset,
               count(DISTINCT s.user_id) AS n_users
          FROM s JOIN a ON a.user_id = s.user_id AND a.aw >= s.cw
         GROUP BY 1, 2
    """,
    # 3-superstep PageRank, d=0.85, over the symmetrized supplier-part
    # graph; uniform start 1/N. Symmetric edges => every node appears as
    # a dst each step, matching the operator's left-join semantics.
    # Node ids: supplier -> 2k (even), part -> 2k+1 (odd).
    "graph_pagerank_supply": """
        WITH base AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
        edges AS (
            SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM base
            UNION ALL
            SELECT l_partkey * 2 + 1, l_suppkey * 2 FROM base
        ),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src, count(*) AS outd FROM edges GROUP BY src),
        p0 AS (SELECT node, 1.0 / n AS pr FROM nodes CROSS JOIN nn),
        p1 AS (
            SELECT e.dst AS node,
                   0.15 / any_value(nn.n) + 0.85 * sum(p.pr / d.outd) AS pr
              FROM edges e
              JOIN p0 p ON p.node = e.src
              JOIN deg d ON d.src = e.src
              CROSS JOIN nn
             GROUP BY e.dst
        ),
        p2 AS (
            SELECT e.dst AS node,
                   0.15 / any_value(nn.n) + 0.85 * sum(p.pr / d.outd) AS pr
              FROM edges e
              JOIN p1 p ON p.node = e.src
              JOIN deg d ON d.src = e.src
              CROSS JOIN nn
             GROUP BY e.dst
        ),
        p3 AS (
            SELECT e.dst AS node,
                   0.15 / any_value(nn.n) + 0.85 * sum(p.pr / d.outd) AS pr
              FROM edges e
              JOIN p2 p ON p.node = e.src
              JOIN deg d ON d.src = e.src
              CROSS JOIN nn
             GROUP BY e.dst
        )
        SELECT node, round(pr, 9) AS pr FROM p3
    """,
    # add-1-smoothed unigram LM: vocab = top-16 en tokens (count DESC,
    # token ASC tie-break), p(t) = (cnt+1)/(N + 1*(V+1)), OOV ⇒ cnt=0
    # DSIR: same tokenizer as the LM scores, bigrams by 1-based list
    # indexing, buckets via the engine-identical md5→BIGINT hash
    # (dedup.py construction); add-1 smoothing over the 256-bucket
    # table in both distributions; weight rounded to 6 like avg_logprob
    "dsir_importance_weights": """
        WITH toks AS (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9_]+') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   unnest(list_concat(t,
                       CASE WHEN len(t) >= 2
                            THEN list_transform(range(0, len(t) - 1),
                                 i -> t[i + 1] || ' ' || t[i + 2])
                            ELSE CAST([] AS VARCHAR[]) END)) AS g
            FROM toks
        ),
        buckets AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 256 AS b
            FROM grams
        ),
        raw AS (SELECT b, count(*) AS rc FROM buckets GROUP BY b),
        tgt AS (
            SELECT b, count(*) AS tc
            FROM buckets JOIN documents USING (doc_id)
            WHERE lang = 'en' GROUP BY b
        ),
        rt AS (SELECT sum(rc) AS rtot FROM raw),
        tt AS (SELECT coalesce(sum(tc), 0) AS ttot FROM tgt),
        ratio AS (
            SELECT b,
                   ln((coalesce(tc, 0) + 1.0) / (ttot + 256.0))
                   - ln((rc + 1.0) / (rtot + 256.0)) AS lr
            FROM raw LEFT JOIN tgt USING (b) CROSS JOIN rt CROSS JOIN tt
        ),
        scored AS (
            SELECT doc_id, count(*) AS n_grams, sum(lr) AS w
            FROM buckets JOIN ratio USING (b) GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
               round(coalesce(w, 0.0), 6) AS log_weight
        FROM documents d LEFT JOIN scored USING (doc_id)
    """,
    "lm_unigram_score": """
        WITH train_toks AS (
            SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
              FROM documents WHERE lang = 'en'
        ),
        vocab AS (
            SELECT token, count(*) AS cnt FROM train_toks
             GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 16
        ),
        stats AS (SELECT sum(cnt) AS total, count(*) AS v FROM vocab),
        toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token
              FROM documents
        ),
        scored AS (
            SELECT t.doc_id,
                   ln((coalesce(vc.cnt, 0) + 1.0)
                      / (s.total + 1.0 * (s.v + 1))) AS lp
              FROM toks t LEFT JOIN vocab vc USING (token) CROSS JOIN stats s
        )
        SELECT doc_id,
               count(*) AS n_tokens,
               round(avg(lp), 6) AS avg_logprob
          FROM scored GROUP BY doc_id
    """,
    # SemDeDup: corpus-slice centroids (vec_id < 16), nearest-centroid
    # assignment with numpy's stable tie-break (lower list id), then
    # prune any vector with a lower-id same-cluster neighbor at
    # cosine >= 0.35 — the exact rule of similarity.semdedup_prune
    "semdedup_prune": """
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cent AS (SELECT vec_id AS lid, v AS cvv FROM e WHERE vec_id < 16),
        ca AS (
            SELECT vec_id AS cid, v AS cv, lid,
                   row_number() OVER (PARTITION BY vec_id
                       ORDER BY list_cosine_similarity(v, cvv) DESC, lid
                   ) AS rn
            FROM e CROSS JOIN cent
        ),
        assign AS (SELECT cid, cv, lid FROM ca WHERE rn = 1),
        pruned AS (
            SELECT DISTINCT b.cid FROM assign a
            JOIN assign b ON a.lid = b.lid AND a.cid < b.cid
            WHERE list_cosine_similarity(a.cv, b.cv) >= 0.35
        )
        SELECT a.cid AS vec_id, CAST(a.lid AS INT) AS list_id,
               (p.cid IS NULL) AS is_kept
        FROM assign a LEFT JOIN pruned p ON a.cid = p.cid
    """,
    # same word-5-gram construction as functions/text.shingles (incl.
    # the whole-text shingle for docs shorter than 5 words); joins raw
    # gram strings where Spark joins their xxhash64 (accepted-collision
    # trade, same as dedup_ngram_jaccard)
    "ngram_decontamination": r"""
        WITH w AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
            FROM documents
        ),
        sh AS (
            SELECT doc_id, unnest(
                CASE WHEN len(ws) >= 5 THEN
                    list_transform(range(1, len(ws) - 5 + 2),
                                   i -> array_to_string(ws[i:i+4], ' '))
                ELSE [array_to_string(ws, ' ')] END) AS g
            FROM w
        ),
        probe AS (SELECT DISTINCT g FROM sh WHERE doc_id < 25)
        SELECT s.doc_id AS corpus_id, count(*) AS n_matched,
               count(DISTINCT s.g) AS n_distinct_grams
        FROM sh s JOIN probe USING (g) WHERE s.doc_id >= 25
        GROUP BY s.doc_id HAVING count(*) >= 1
    """,
    # mixture_sample's integer pipeline verbatim: budget = N*2//5,
    # target = budget*pct//100 (capped by the stratum count), prefilter
    # cutoff = target*2e6//count + 50000, rank survivors by (hash, id)
    "mixture_by_lang": """
        WITH cnt AS (
            SELECT lang, count(*) AS c FROM documents GROUP BY lang
        ),
        t AS (
            SELECT lang, c,
                   least(((SELECT CAST(sum(c) AS BIGINT) FROM cnt) * 2 // 5)
                         * pct // 100, c) AS tgt
            FROM cnt JOIN (VALUES ('en', 30), ('de', 20), ('fr', 20),
                                  ('es', 15), ('zh', 15)) p(lang, pct)
                 USING (lang)
        ),
        cut AS (
            SELECT lang, tgt,
                   least(1000000, (tgt * 2 * 1000000) // c + 50000) AS cutoff
            FROM t
        ),
        pre AS (
            SELECT doc_id, lang,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mix'),
                                       1, 15) AS BIGINT) % 1000000 AS h
            FROM documents
        ),
        r AS (
            SELECT pre.doc_id, pre.lang, tgt,
                   row_number() OVER (
                       PARTITION BY pre.lang ORDER BY h, pre.doc_id
                   ) AS rn
            FROM pre JOIN cut USING (lang) WHERE h < cutoff
        )
        SELECT doc_id, lang, CAST(rn AS BIGINT) AS mix_rank
        FROM r WHERE rn <= tgt
    """,
    "embedding_matryoshka_topk": """
        WITH q AS (
            SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < 10
        ),
        c AS (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings
        ),
        coarse AS (
            SELECT query_id, cid,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY list_cosine_similarity(qv[1:16], cv[1:16])
                                DESC, cid
                   ) AS rn
            FROM q, c WHERE query_id != cid
        ),
        cand AS (
            SELECT query_id, cid FROM coarse WHERE rn <= 25
        ),
        exact AS (
            SELECT cand.query_id, cand.cid,
                   list_cosine_similarity(q.qv, c.cv) AS sim
            FROM cand
            JOIN q USING (query_id)
            JOIN c USING (cid)
        ),
        r AS (
            SELECT query_id, cid, sim, row_number() OVER (
                PARTITION BY query_id ORDER BY sim DESC, cid
            ) AS rn FROM exact
        )
        SELECT query_id, cid AS neighbor_id,
               CAST(rn AS INT) AS rank, round(sim, 6) AS cosine_sim
        FROM r WHERE rn <= 5
    """,
    # same quality formula as workload.text_quality's oracle, then a
    # per-lang rank window keeping the exact top half
    "quality_select_per_lang": r"""
        WITH m AS (
            SELECT doc_id, lang,
                   length(text) AS n,
                   len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS words,
                   len(regexp_extract_all(text, '[^\sA-Za-z0-9_]')) AS punct,
                   len(regexp_extract_all(text, '(?i)\b(the|and|of|to|a|in|is|that)\b')) AS stops,
                   len(regexp_extract_all(text, '[A-Za-z0-9_]')) AS letters
            FROM documents
        ),
        sc AS (
            SELECT doc_id, lang,
                   round(
                     least(n / 500.0, 1.0) * 0.4
                     + greatest(0.0, 1.0 - (CASE WHEN n > 0 THEN punct / n ELSE 0.0 END) * 4.0) * 0.3
                     + least((CASE WHEN words > 0 THEN stops / words ELSE 0.0 END) * 5.0, 1.0) * 0.2
                     + (CASE WHEN words > 0 AND letters / words >= 3.0
                             AND letters / words <= 10.0
                        THEN 1.0 ELSE 0.5 END) * 0.1
                   , 6) AS quality
            FROM m
        ),
        r AS (
            SELECT doc_id, lang, quality,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY quality DESC, doc_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS nl
            FROM sc
        )
        SELECT doc_id, lang, quality, CAST(rn AS BIGINT) AS lang_rank
        FROM r WHERE rn <= CAST(ceil(nl * 0.5) AS BIGINT)
    """,
    "stratified_sample_by_lang": """
        SELECT doc_id, lang FROM documents
        WHERE (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % 1000000)
              < CASE lang  -- integer cutoffs = round(rate*1e6), fixed
                    -- driver-side in functions/sampling.stratified_sample
                    WHEN 'en' THEN 250000  WHEN 'de' THEN 1000000
                    WHEN 'fr' THEN 1000000 WHEN 'es' THEN 500000
                    WHEN 'zh' THEN 400000  ELSE 0 END
    """,
    "agg_cube_orders": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price,
               CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS max_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "doc_chunking": r"""
        WITH d AS (
            SELECT doc_id,
                   string_split_regex(trim(text), '\s+') AS w,
                   greatest(1, (len(string_split_regex(trim(text), '\s+'))
                                - 16 + 47) // 48) AS nc
            FROM documents
        )
        SELECT doc_id,
               t.ci AS chunk_id,
               len(w[t.ci*48+1 : t.ci*48+64]) AS n_chunk_tokens,
               array_to_string(w[t.ci*48+1 : t.ci*48+64], ' ')
                   AS chunk_text
        FROM d, UNNEST(range(d.nc)) AS t(ci)
    """,
    "bucketed_colocated_join": f"""
        SELECT o_orderpriority,
               COUNT(*) AS n_lines,
               CAST(SUM(CAST({_DISC_PRICE_SQL} AS DECIMAL(28,4)))
                    AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "asof_join_tolerance": """
        WITH clicks AS (
            SELECT event_id AS click_id, user_id,
                   CAST(ts AS TIMESTAMP) AS click_ts
            FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS purchase_ts,
                   MAX(value) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, CAST(ts AS TIMESTAMP)
        ),
        cand AS (
            SELECT c.click_id, c.user_id, c.click_ts,
                   p.purchase_ts, p.purchase_value,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.click_id
                       ORDER BY p.purchase_ts DESC
                   ) AS rn
            FROM clicks c JOIN purchases p
              ON c.user_id = p.user_id
             AND p.purchase_ts <= c.click_ts
             AND p.purchase_ts >= c.click_ts - INTERVAL 48 HOUR
        )
        SELECT click_id, user_id, epoch_us(click_ts) AS click_ts_us,
               epoch_us(purchase_ts) AS purchase_ts_us, purchase_value
        FROM cand WHERE rn = 1
        UNION ALL
        SELECT click_id, user_id, epoch_us(click_ts), NULL, NULL
        FROM clicks
        WHERE click_id NOT IN (SELECT click_id FROM cand)
    """,
    "jsonl_roundtrip": """
        SELECT doc_id, lang, source, n_chars, md5(text) AS text_digest
        FROM documents
    """,
    "skew_salted_join": """
        WITH dim AS (
            SELECT * FROM (VALUES
                ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
                ('4-NOT SPECIFIED', 2), ('5-LOW', 1)
            ) AS t(o_orderpriority, weight)
        )
        SELECT o.o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * weight
                    AS DECIMAL(28,2))) AS DOUBLE) AS weighted_price
        FROM orders o JOIN dim USING (o_orderpriority)
        GROUP BY 1
    """,
    "rollup_events_hourly": """
        SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
                   * 3600000000 AS bucket_start_us,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
               MAX(value) AS max_value
        FROM events GROUP BY 1, 2
    """,
    "q2_min_cost_part": """
        SELECT p_partkey, p_name, p_type, p_retailprice
        FROM part
        WHERE p_retailprice = (
            SELECT MIN(p2.p_retailprice) FROM part p2
            WHERE p2.p_type = part.p_type
        )
    """,
    "q7_volume_shipping": f"""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate <  DATE '1998-01-01'
          AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation,
               year(o_orderdate) AS o_year,
               CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= DATE '1997-01-01'
          AND o_orderdate <  DATE '1997-07-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q11_important_balances": """
        WITH tot AS (
            SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS t
            FROM supplier
        )
        SELECT s_nationkey,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS value
        FROM supplier, tot
        GROUP BY s_nationkey, t
        HAVING CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) > t * 0.02
    """,
    "q12_priority_class": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate <  DATE '1998-01-01'
        GROUP BY l_linestatus
    """,
    "q13_order_count_distribution": """
        SELECT c_count, COUNT(*) AS custdist FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey, SUM({_DISC_PRICE_SQL}) AS r
            FROM lineitem
            WHERE l_shipdate >= DATE '1997-01-01'
              AND l_shipdate <  DATE '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE r = (SELECT MAX(r) FROM rev)
    """,
    "q16_supplier_variety": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 10, 15, 20, 25)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
    """,
    "q17_small_quantity_revenue": """
        WITH thr AS (
            SELECT l_partkey AS pk,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*) * 0.2 AS t
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / 7.0 AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN thr  ON l_partkey = pk
        WHERE p_brand = 'Brand#3' AND l_quantity < t
    """,
    "q19_disjunctive_filter": f"""
        SELECT CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q20_semi_join_chain": """
        SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small%'
              AND l_shipdate >= DATE '1997-01-01'
              AND l_shipdate <  DATE '1998-01-01'
            GROUP BY l_suppkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2)))
                       > CAST(100 AS DECIMAL(18,2))
        )
    """,
    "q21_sole_fault_supplier": """
        WITH f AS (
            SELECT l_orderkey, l_suppkey, l_returnflag
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        ),
        st AS (
            SELECT l_orderkey,
                   COUNT(DISTINCT l_suppkey) AS ns,
                   COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                       THEN l_suppkey END) AS nr
            FROM f GROUP BY l_orderkey
        ),
        fault AS (
            SELECT DISTINCT f.l_orderkey, f.l_suppkey
            FROM f JOIN st USING (l_orderkey)
            WHERE f.l_returnflag = 'R' AND ns > 1 AND nr = 1
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM fault JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "range_join_clicks_after_purchase": """
        SELECT p.event_id AS purchase_id, COUNT(*) AS n_clicks
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts
              FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts
              FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
         AND c.cts >= p.pts
         AND c.cts < p.pts + INTERVAL '1 hour'
        GROUP BY 1
    """,
    "events_session_window": """
        WITH o AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   lag(CAST(ts AS TIMESTAMP)) OVER (
                       PARTITION BY user_id ORDER BY ts
                   ) AS prev_ts
            FROM events
        ),
        g AS (
            SELECT user_id, ts, value,
                   CASE WHEN prev_ts IS NULL
                             OR ts - prev_ts >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS brk
            FROM o
        ),
        s AS (
            SELECT user_id, ts, value,
                   SUM(brk) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS sid
            FROM g
        )
        SELECT user_id,
               epoch_us(MIN(ts)) AS session_start_us,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM s GROUP BY user_id, sid
    """,
    "events_sliding_window": """
        WITH x AS (
            SELECT event_type, value,
                   time_bucket(INTERVAL '30 minutes',
                               CAST(ts AS TIMESTAMP)) AS b
            FROM events
        ),
        w AS (
            SELECT event_type, value, b AS ws FROM x
            UNION ALL
            SELECT event_type, value, b - INTERVAL '30 minutes' FROM x
        )
        SELECT epoch_us(ws) AS window_start_us, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM w GROUP BY 1, 2
    """,
    "window_moving_avg": """
        SELECT event_id, user_id,
               round(AVG(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ), 6) AS moving_avg
        FROM events
    """,
    "agg_percentiles": """
        SELECT c_mktsegment,
               COUNT(*) AS n,
               round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
               round(quantile_cont(c_acctbal, 0.5), 6) AS p50,
               round(quantile_cont(c_acctbal, 0.75), 6) AS p75
        FROM customer GROUP BY c_mktsegment
    """,
    "top_terms_per_lang": """
        WITH words AS (
            SELECT lang,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS word
            FROM documents
        ),
        counts AS (
            SELECT lang, word, COUNT(*) AS n FROM words GROUP BY 1, 2
        )
        SELECT lang, word, n, rank FROM (
            SELECT lang, word, n,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY n DESC, word
                   ) AS rank
            FROM counts
        ) WHERE rank <= 5
    """,
    "set_ops_multiset": """
        (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
         UNION ALL
         SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000)
        EXCEPT ALL
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
    """,
    "pivot_status_by_year": """
        SELECT year(o_orderdate) AS o_year,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
               COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        FROM orders GROUP BY 1
    """,
}
