"""Scaling experiment: replicate the sf0.1 fact tables 10x (ids
shifted so keys stay unique and join/group cardinalities scale
realistically) and measure selected operators at 1x vs 10x. A
shuffle-disciplined operator should scale ~linearly in rows on fixed
cores; superlinear growth exposes a join/agg whose intermediate blows
up. Results are recorded in SCALING.md.

Usage: python tools/scale_experiment.py [--rebuild]
Writes derived data under /tmp/bazof_scale/x10 (never touches
/root/testdata).

`--x100` runs the 100x stretch instead: documents-only (the three
highest-ratio operators — text_quality, text_repetition,
dedup_ngram_jaccard — read nothing else), same decorrelation scheme,
under /tmp/bazof_scale/x100. Confirms the linear-in-bytes reading
holds for two more decades and that no intermediate state grows
superlinearly.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bazof_spark.session import get_spark  # noqa: E402
from bazof_spark.workload import QUERIES  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/bazof_scale/x10"
COPIES = 10

# fact tables scale; dimensions stay 1x (the realistic shape: at 100 TB
# the dims still broadcast)
DIMS = ["customer", "supplier", "part", "nation", "region"]

MEASURED = [
    "q1_pricing_summary",
    "q18_large_volume_customer",
    "q6_revenue_change",
    "text_quality",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "embedding_ann_lsh",
    "sketch_distinct_kmv",
    "sketch_histogram_quantile",
    "bm25_search",
    "text_repetition",
    "rollup_events_hourly",
    "skew_salted_join",
    "asof_join_tolerance",
    "lm_unigram_score",
    "graph_pagerank_supply",
    "events_funnel",
    "events_retention_cohorts",
    # round-4 additions
    "scd2_user_event_type",
    "knn_label_vote",
    "weighted_sample_docs",
    "sketch_kmv_mergeable",
    "ann_recall_ivf",
    "time_travel_changes_sql",
    # round-6 additions
    "span_dedup",
    "embedding_ann_pq",
]


def _write(df, dst: str) -> None:
    df.repartition(32).write.mode("overwrite").parquet(dst)


def build(spark) -> None:
    """10x the fact tables. Content is DECORRELATED across copies —
    naive duplication would hand every near-dup/ANN operator 10-element
    cliques of identical items, a quadratic pair blowup that real 10x
    corpora don't have (and which would measure the data, not the
    operator):

    - documents: every word gets a per-copy suffix, so cross-copy
      shingle overlap is zero while per-doc length/stats are preserved;
    - embeddings: coordinates rotate per copy, decorrelating vectors
      while keeping their norm distribution;
    - orders+lineitem share one orderkey shift so joins stay consistent.
    """
    os.makedirs(DST, exist_ok=True)
    for t in DIMS:
        src = os.path.join(SRC, f"{t}.parquet")
        dst = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)

    orders = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    okey_width = (
        max(
            orders.agg(F.max("o_orderkey")).first()[0],
            lineitem.agg(F.max("l_orderkey")).first()[0],
        )
        + 1
    )
    if not os.path.exists(os.path.join(DST, "orders.parquet")):
        _write(
            _union(
                [
                    orders.withColumn(
                        "o_orderkey", F.col("o_orderkey") + i * okey_width
                    )
                    for i in range(COPIES)
                ]
            ),
            os.path.join(DST, "orders.parquet"),
        )
    if not os.path.exists(os.path.join(DST, "lineitem.parquet")):
        _write(
            _union(
                [
                    lineitem.withColumn(
                        "l_orderkey", F.col("l_orderkey") + i * okey_width
                    )
                    for i in range(COPIES)
                ]
            ),
            os.path.join(DST, "lineitem.parquet"),
        )

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    dkey = docs.agg(F.max("doc_id")).first()[0] + 1
    if not os.path.exists(os.path.join(DST, "documents.parquet")):
        copies = []
        for i in range(COPIES):
            c = docs.withColumn("doc_id", F.col("doc_id") + i * dkey)
            if i:
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", rf"$1x{i}")
                )
            copies.append(c)
        _write(_union(copies), os.path.join(DST, "documents.parquet"))

    # events: shift event_id AND user_id per copy — per-user event
    # density stays constant (10× users, not 10× events per user), the
    # realistic growth mode for the as-of/rollup/session operators
    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    ekey = ev.agg(F.max("event_id")).first()[0] + 1
    ukey = ev.agg(F.max("user_id")).first()[0] + 1
    if not os.path.exists(os.path.join(DST, "events.parquet")):
        _write(
            _union(
                [
                    ev.withColumn("event_id", F.col("event_id") + i * ekey)
                    .withColumn("user_id", F.col("user_id") + i * ukey)
                    for i in range(COPIES)
                ]
            ),
            os.path.join(DST, "events.parquet"),
        )

    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    vkey = emb.agg(F.max("vec_id")).first()[0] + 1
    if not os.path.exists(os.path.join(DST, "embeddings.parquet")):
        copies = []
        for i in range(COPIES):
            c = emb.withColumn("vec_id", F.col("vec_id") + i * vkey)
            if i:
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {i + 1}, "
                        f"size(embedding) - {i}), slice(embedding, 1, {i}))"
                    ),
                )
            copies.append(c)
        _write(_union(copies), os.path.join(DST, "embeddings.parquet"))


def _union(copies):
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


X100_DST = "/tmp/bazof_scale/x100"
X100_MEASURED = [
    "text_quality",
    "text_repetition",
    "dedup_ngram_jaccard",
    # documents-only like the rest: trains + scores on the 100× corpus
    "lm_unigram_score",
    # round-3 heavy hitters (verdict r3 task 8): iterative graph,
    # verbatim containment, hybrid lexical+dense retrieval
    "graph_pagerank_supply",
    "ngram_decontamination",
    "hybrid_rrf_search",
    # round-4 heavy hitters (verdict r4 task 6): the one-shuffle SCD2
    # build over 100× events (10M rows) and the fixed-query kNN
    # harness over a 100× decorrelated corpus
    "scd2_user_event_type",
    "knn_label_vote",
    # round-5: the flagship near-dup pair generators (banding /
    # pigeonhole guards vs corpus² growth)
    "dedup_minhash_lsh",
    "dedup_simhash",
    # round-6: chunk-hash span dedup (map + one hash shuffle) and the
    # PQ/ADC index (map-only encode + LUT scoring; fixed query set)
    "span_dedup",
    "embedding_ann_pq",
    # round-7: the composed IVF-PQ index — same fixed quantizer and
    # query set as embedding_ann_pq, but ADC scores only probed lists
    # (n_probe/n_lists of the corpus) instead of every code; measured
    # side-by-side with pure ADC so the pruning shows up as a ratio gap
    "embedding_ann_ivfpq",
    "embedding_ann_pq_trained",
    # round-7 additions: one-shuffle digest dedup with provenance-tier
    # winner; map-only PCA projection (bounded-sample model)
    "dedup_source_priority",
    "embedding_pca_project",
    "quality_model_score",
    "embedding_ann_ivfpq_residual",
    # round-8: the full Faiss-default stack — trained coarse quantizer
    # + trained RESIDUAL codebooks; same probed-list ADC shape, so the
    # expected ratio matches the other IVF-PQ variants
    "embedding_ann_ivfpq_residual_trained",
    # round-8 codecs: synthesize→encode→decode→stats, two chained
    # mapInPandas stages — pure map profile, expected ~linear in docs
    "multimodal_jpeg_decode",
    "multimodal_gif_decode",
    "multimodal_gif_frame_sample",
]


def build_docs_x(spark, copies: int, dst: str) -> None:
    """100× stretch inputs with the same decorrelation scheme as
    build():

    - documents: per-copy word suffixes keep cross-copy shingle overlap
      at zero while preserving per-doc length/stats (copy 0 unchanged,
      so probe slices like doc_id < 25 stay 1× — realistic
      decontamination shape: fixed eval set, growing corpus);
    - embeddings: per-copy coordinate rotation (mod dim) decorrelates
      vectors, norms preserved; vec_id 0 (the hybrid query) stays 1×;
    - lineitem, (l_suppkey, l_partkey) only: keys shift per copy so the
      supplier–part graph grows to 100× NODES at constant degree — a
      plain orderkey shift would just duplicate edges that distinct()
      collapses, measuring dedup instead of the graph operator.
    """
    os.makedirs(dst, exist_ok=True)
    out = os.path.join(dst, "documents.parquet")
    if not os.path.exists(out):
        docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
        dkey = docs.agg(F.max("doc_id")).first()[0] + 1
        branches = []
        for i in range(copies):
            c = docs.withColumn("doc_id", F.col("doc_id") + i * dkey)
            if i:
                c = c.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", rf"$1x{i}")
                )
            branches.append(c)
        _write(_union(branches), out)

    out = os.path.join(dst, "embeddings.parquet")
    if not os.path.exists(out):
        emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
        vkey = emb.agg(F.max("vec_id")).first()[0] + 1
        dim = emb.select(F.size("embedding")).first()[0]
        branches = []
        for i in range(copies):
            c = emb.withColumn("vec_id", F.col("vec_id") + i * vkey)
            # copies beyond `dim` would repeat a rotation (i % dim) and
            # produce bit-identical vector clones — the quadratic
            # duplicate-clique artifact this scheme exists to avoid —
            # so each wrap of the rotation also flips the sign (norms
            # preserved, dim × 2 distinct transforms)
            r = i % dim
            if r:
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {r + 1}, "
                        f"size(embedding) - {r}), slice(embedding, 1, {r}))"
                    ),
                )
            if (i // dim) % 2 == 1:
                c = c.withColumn(
                    "embedding", F.expr("transform(embedding, x -> -x)")
                )
            branches.append(c)
        _write(_union(branches), out)

    # events: same decorrelation as the 10× build — event_id AND
    # user_id shift per copy, so per-user event density stays constant
    # (100× users, not 100× events per user); the realistic growth for
    # the scd2/as-of/session family, whose state is per-key
    out = os.path.join(dst, "events.parquet")
    if not os.path.exists(out):
        ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
        ekey = ev.agg(F.max("event_id")).first()[0] + 1
        ukey = ev.agg(F.max("user_id")).first()[0] + 1
        _write(
            _union(
                [
                    ev.withColumn("event_id", F.col("event_id") + i * ekey)
                    .withColumn("user_id", F.col("user_id") + i * ukey)
                    for i in range(copies)
                ]
            ),
            out,
        )

    out = os.path.join(dst, "lineitem.parquet")
    if not os.path.exists(out):
        li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet")).select(
            "l_suppkey", "l_partkey"
        )
        smax, pmax = li.agg(F.max("l_suppkey"), F.max("l_partkey")).first()
        branches = [
            li.select(
                (F.col("l_suppkey") + i * (smax + 1)).alias("l_suppkey"),
                (F.col("l_partkey") + i * (pmax + 1)).alias("l_partkey"),
            )
            for i in range(copies)
        ]
        _write(_union(branches), out)


def run(spark, sf_dir: str) -> dict[str, float]:
    times = {}
    for name in MEASURED:
        fn = QUERIES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    return times


def main() -> None:
    global MEASURED
    spark = get_spark(app_name="bazof-scale")
    spark.sparkContext.setLogLevel("ERROR")
    if "--x100" in sys.argv:
        if "--rebuild" in sys.argv and os.path.exists(X100_DST):
            shutil.rmtree(X100_DST)
        build_docs_x(spark, 100, X100_DST)
        MEASURED = X100_MEASURED
        for arg in sys.argv[1:]:
            if arg.startswith("--only="):
                MEASURED = [
                    n for n in arg[len("--only="):].split(",") if n
                ]
        base = run(spark, SRC)
        scaled = run(spark, X100_DST)
        report = {
            name: {
                "t_1x_sec": base[name],
                "t_100x_sec": scaled[name],
                "ratio": round(scaled[name] / base[name], 2)
                if base[name] > 0
                else None,
            }
            for name in MEASURED
        }
        print(json.dumps(report, indent=2))
        return
    if "--rebuild" in sys.argv and os.path.exists(DST):
        shutil.rmtree(DST)
    for arg in sys.argv[1:]:
        if arg.startswith("--only="):
            MEASURED = [n for n in arg[len("--only="):].split(",") if n]
    build(spark)
    base = run(spark, SRC)
    scaled = run(spark, DST)
    report = {
        name: {
            "t_1x_sec": base[name],
            "t_10x_sec": scaled[name],
            "ratio": round(scaled[name] / base[name], 2)
            if base[name] > 0
            else None,
        }
        for name in MEASURED
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
