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

    Eager-statistics semantics: corpus statistics (N, avgdl, per-term
    df) are computed by a Spark job AT CALL TIME — one bounded-row
    aggregate over ``df`` — and frozen into the returned plan as
    literals. The returned DataFrame is therefore bound to the corpus
    as it stood when this function ran: appending documents afterwards
    and re-executing the result scores against the OLD statistics
    (re-call to rebind), and explain-only/plan-inspection flows pay the
    stats scan. This is the deliberate trade for a cache-free, join-
    free scoring pass (see the scale note below).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})

    # Array-native: the query's term set is tiny, so per-doc term
    # frequencies are |terms| array-filter passes over the token array —
    # no token explode, no (doc, token) shuffle at all. Corpus statistics
    # (N, avgdl, per-term df) are a single map-side-combined aggregate
    # collected driver-side (one bounded row: 2+|terms| scalars) and
    # injected back as LITERALS, so the scoring pass is one map-only
    # scan + top-k with no cache and no join. Two scans of the corpus
    # beat caching the tokenized projection: at 100 TB the projection is
    # itself TB-scale and a MEMORY_AND_DISK cache would spill it to
    # executor disks AND leak across repeated calls (the cache manager
    # holds it until an explicit clear); two pushdown-pruned columnar
    # scans are cheaper and leave no session state behind.
    from bazof_spark.exprcache import cached_column, cached_columns

    toks = F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")

    def _tf_expr(term: str) -> F.Column:
        # factory, not a default-arg lambda: a 2-param lambda would be
        # treated by the HOF as (element, index); cached per process —
        # the HOF filter costs ~25 py4j round trips per term per call
        # (opt round 1, exprcache: tree depends only on the term)
        return cached_column(
            ("bm25.tf", term),
            lambda: F.size(
                F.filter(F.col("_toks"), lambda x: x == F.lit(term))
            ),
        )

    base = (
        df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
        .select(
            "_id",
            F.size("_toks").alias("_dl"),
            *[_tf_expr(t).alias(f"_tf_{i}") for i, t in enumerate(terms)],
        )
        # docs with zero tokens contribute to neither N nor avgdl
        .filter(F.col("_dl") > 0)
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *cached_columns(
            ("bm25.df_aggs", len(terms)),
            lambda: [
                F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
                for i in range(len(terms))
            ],
        ),
    ).first()
    n_docs = int(stats["_n"])
    # empty corpus (no rows, or every doc tokenized to nothing): the
    # aggregate returns NULL avg/sums — fall back to neutral literals;
    # the scoring pass over the empty base then yields zero rows
    avgdl = float(stats["_avgdl"]) if stats["_avgdl"] is not None else 1.0
    dfs = [
        int(stats[f"_df_{i}"]) if stats[f"_df_{i}"] is not None else 0
        for i in range(len(terms))
    ]

    scored = base

    def _build_score_and_matched() -> list[F.Column]:
        norm = F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.lit(avgdl)
        )

        def _term_score(i: int) -> F.Column:
            tf_i = F.col(f"_tf_{i}")
            # same double-arithmetic order as the previous column-side
            # expression (and the DuckDB oracle), JVM-evaluated on
            # literals
            idf = F.log(
                (F.lit(n_docs) - F.lit(dfs[i]) + F.lit(0.5))
                / (F.lit(dfs[i]) + F.lit(0.5))
                + F.lit(1.0)
            )
            return F.when(
                tf_i > 0,
                idf * (tf_i * F.lit(k1 + 1.0)) / (tf_i + norm),
            ).otherwise(F.lit(0.0))

        score = _term_score(0)
        for i in range(1, len(terms)):
            score = score + _term_score(i)
        n_matched = sum(
            (F.col(f"_tf_{i}") > 0).cast("long") for i in range(len(terms))
        )
        return [score, n_matched]

    # the scoring tree embeds the corpus statistics as literals, so
    # THEY are part of the cache key: a changed corpus yields new
    # literals, a new key, a fresh tree (exprcache caches trees, never
    # data — the stats job above still runs per call)
    score, n_matched = cached_columns(
        ("bm25.score", n_docs, avgdl, tuple(dfs), tuple(terms), k1, b),
        _build_score_and_matched,
    )
    return (
        scored.withColumn("_nm", n_matched)
        .filter(F.col("_nm") > 0)
        .select(
            F.col("_id").alias(id_col),
            F.round(score, 6).alias("score"),
            F.col("_nm").alias("n_matched"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )


def rrf_fuse(
    rankings: dict[str, "DataFrame"],
    id_col: str = "doc_id",
    k: int = 60,
    top_k: int | None = None,
) -> "DataFrame":
    """Reciprocal-rank fusion of named rankings (Cormack et al.):
    ``rrf(d) = Σ_lists 1/(k + rank_list(d))``, lists where ``d`` is
    absent contributing 0 — the standard way to combine lexical (BM25)
    and dense (embedding) retrieval without score calibration.

    Each input DataFrame carries (``id_col``, ``rank``) with rank
    starting at 1. Output: (id_col, rrf_score, rank_<name>… — null where
    the list missed the id), optionally cut to ``top_k`` with a
    deterministic (score DESC, id ASC) tie-break.

    Scale shape: candidate lists are top-k CUTS (thousands of rows at
    most), so the full-outer joins are between bounded relations — the
    expensive work happened upstream in each retriever. Fusing full
    corpus-sized rankings would shuffle on id; the math is identical.
    """
    from functools import reduce

    named = list(rankings.items())
    if not named:
        raise ValueError("rrf_fuse needs at least one ranking")
    sides = [
        df.select(
            F.col(id_col), F.col("rank").alias(f"rank_{name}")
        )
        for name, df in named
    ]
    fused = reduce(lambda a, b: a.join(b, id_col, "full_outer"), sides)
    score = reduce(
        lambda acc, name: acc
        + F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"rank_{name}")), F.lit(0.0)
        ),
        [name for name, _ in named],
        F.lit(0.0),
    )
    out = fused.withColumn("rrf_score", score)
    if top_k is not None:
        out = out.orderBy(
            F.col("rrf_score").desc(), F.col(id_col).asc()
        ).limit(top_k)
    return out
