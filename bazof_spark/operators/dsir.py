"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169). The reference engine has no ML-data surface at all
(tabular scans only); this is part of the repo's LLM-training-data
pipeline alongside the LM quality scores (operators/lm.py) and the
quality classifier (operators/quality.py).

The published recipe: featurize every document as hashed n-gram
counts (unigrams + bigrams into a fixed bucket table), fit two bag-of
-buckets unigram distributions — p_target over a trusted slice and
p_raw over the whole corpus — and weight each document by

    log w(x) = Σ_grams  [ log p_target(bucket(g)) − log p_raw(bucket(g)) ]

with add-1 smoothing over the bucket table. Selection then samples or
top-k's by weight; the weight computation is the distributed part and
what this operator provides.

Scale shape (the 100 TB story):
- featurization is a map-only explode (tokens + bigrams, JVM regex +
  md5 — no Python);
- BOTH distributions are map-side-combined groupBys whose output is
  ≤ n_buckets rows — constant-size shuffles however large the corpus;
- the log-ratio table (n_buckets rows) broadcasts; scoring is one
  broadcast join + one per-doc partial aggregation (~one shuffled row
  per document), exactly the lm.py profile.

Buckets use the repo's engine-identical hash (md5 hex → BIGINT via
conv/substr — the minhash construction, operators/dedup.py:190-205),
so the DuckDB oracle reproduces every bucket assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the lm.py tokenizer (operators/lm.py:40) — one definition per engine
_TOKEN_EXPR = r"regexp_extract_all(lower(`{col}`), '[a-z0-9_]+', 0)"


def _grams(tokens_col: str) -> Column:
    """unigrams ++ bigrams ('a b') over an ALREADY-MATERIALIZED token
    array column. Tokens must be a real column, not an inline regex
    expression: the bigram lambda references it once per index, and an
    inline regexp_extract_all would re-tokenize the text O(tokens)
    times per row."""
    t = F.col(tokens_col)
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 2),
            lambda i: F.concat_ws(" ", F.element_at(t, i + 1),
                                  F.element_at(t, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(t, bigrams)


def _bucket(gram: Column, n_buckets: int) -> Column:
    # md5 hex → BIGINT, both engines identically (dedup.py:202-205)
    return (
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
        % n_buckets
    )


def dsir_log_weights(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_grams, log_weight) for every document: the DSIR hashed
    n-gram importance weight of each doc under p_target/p_raw, where
    the target distribution is fit on ``docs.filter(target_pred)`` and
    the raw distribution on all of ``docs``. Docs with no tokens get
    n_grams=0, log_weight=0.0 (no evidence either way)."""
    # explode_outer keeps zero-token docs as a null-bucket row, so the
    # per-doc aggregation below covers EVERY doc without a second
    # corpus-sized join back onto `docs`; tokens materialize ONCE per
    # row before the gram expansion (see _grams)
    exploded = docs.select(
        F.col(id_col),
        target_pred.alias("_t"),
        F.expr(_TOKEN_EXPR.format(col=text_col)).alias("_toks"),
    ).select(
        F.col(id_col),
        "_t",
        F.explode_outer(_grams("_toks")).alias("_g"),
    ).select(
        id_col,
        "_t",
        F.when(
            F.col("_g").isNotNull(), _bucket(F.col("_g"), n_buckets)
        ).alias("_b"),
    )
    # DSIR inherently passes over the features twice — fit the
    # distributions, then score — and Spark shares no subplans across
    # DataFrame references, so without materialization the tokenize +
    # md5 + explode featurization ran TWICE per call (opt round 1,
    # guide §2.4). localCheckpoint materializes the featurized relation
    # once (disk-backed blocks, freed by GC — no persistent cache entry
    # leaks across calls); the published DSIR recipe materializes its
    # hashed-feature table for exactly this reason, and the relation is
    # (id, bool, long) rows — a fixed small multiple of corpus token
    # count, far narrower than the text it came from.
    exploded = exploded.localCheckpoint(eager=True)

    # BOTH distributions in ONE map-side-combined corpus pass (raw =
    # every gram, target = grams of target_pred docs); the result is
    # ≤ n_buckets rows BY CONSTRUCTION — a bounded, corpus-size-
    # independent collect (the same discipline as the ANN/quality
    # trainers), so the log-ratio model becomes a literal broadcast
    # relation and nothing corpus-sized crosses the wire except this
    # agg and the per-doc scoring agg
    import math

    counts = (
        exploded.where(F.col("_b").isNotNull())
        .groupBy("_b")
        .agg(
            F.count(F.lit(1)).alias("_rc"),
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("_tc"),
        )
        .collect()
    )
    raw_counts = {int(r["_b"]): int(r["_rc"]) for r in counts}
    tgt_counts = {int(r["_b"]): int(r["_tc"]) for r in counts}
    rt = sum(raw_counts.values()) + float(n_buckets)
    tt = sum(tgt_counts.values()) + float(n_buckets)
    spark = docs.sparkSession
    ratio = spark.createDataFrame(
        [
            (
                b,
                math.log((tgt_counts.get(b, 0) + 1.0) / tt)
                - math.log((rc + 1.0) / rt),
            )
            for b, rc in sorted(raw_counts.items())
        ],
        "_b long, _lr double",
    )
    return (
        exploded.join(F.broadcast(ratio), "_b", "left")
        .groupBy(id_col)
        .agg(
            F.count("_b").alias("n_grams"),
            F.coalesce(F.sum("_lr"), F.lit(0.0)).alias("log_weight"),
        )
    )
