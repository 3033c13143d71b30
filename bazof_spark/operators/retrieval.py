"""Ranked retrieval over a document corpus: TF-IDF / BM25.

The lexical-search counterpart of operators/similarity.py's embedding
search — training-data pipelines use it for corpus exploration,
contamination checks (find near-matches of eval data), and targeted
filtering. Classic Okapi BM25:

    score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
                            (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t) = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

Scale shape: the query's term set is tiny, so term filtering happens
AT THE EXPLODE (rows for non-query terms never materialize); the only
shuffles are the (doc, term) tf aggregate and the per-doc score sum.
Corpus statistics (N, avgdl, per-term df) are scalar/tiny aggregates —
broadcast, never a wide join. All arithmetic is IEEE double with a
fixed fold order, reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = r"[a-z0-9_]+"


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Top-k documents for a bag-of-words query by BM25 score.
    Output: (doc_id, score, n_matched) ordered by score desc, id asc.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    words = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
        ).alias("_t"),
    )
    doclen = words.groupBy("_id").agg(F.count(F.lit(1)).alias("_dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )

    matched = words.filter(F.col("_t").isin(terms))  # prune at the explode
    tf = matched.groupBy("_id", "_t").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))

    # dfreq (≤ |query| rows) and stats (1 row) broadcast; the tf⋈doclen
    # join is left to Catalyst/AQE — tf is usually the small side but a
    # stop-word query can match most of the corpus, so no forced hint
    scored = (
        tf.join(F.broadcast(dfreq), "_t")
        .join(doclen, "_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                (F.col("_n") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("_tf") * F.lit(k1 + 1.0))
            / (
                F.col("_tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("_dl") / F.col("_avgdl")
                )
            ),
        )
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.round(F.sum("_s"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_matched"),
        )
        .orderBy(F.col("score").desc(), F.col("_id").asc())
        .limit(top_k)
        .select(F.col("_id").alias(id_col), "score", "n_matched")
    )
