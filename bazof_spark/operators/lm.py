"""Unigram language-model quality scoring — the CCNet-style signal
large-scale training-data pipelines use to rank web documents by
fluency (score against an LM trained on a trusted corpus, keep the
best-scoring fraction).

Beyond-reference operator (SURVEY §2 has no analog; the reference is a
table format + SQL engine). Spark-first design:

- **Training** is one explode + one map-side-combined ``groupBy(token)``
  over the trusted corpus, then a top-V cut. The sort for the cut runs
  over *distinct tokens* (bounded by vocabulary, not corpus bytes), so
  training cost is a single aggregation pass however large the corpus.
- **The model is data, not driver state**: a (token, cnt) DataFrame of
  at most ``vocab_size`` rows — small enough to ``broadcast()`` to every
  executor, like any dimension table. No .collect(), no Python dict.
- **Scoring** explodes the target corpus once, broadcast-joins the
  model (map-side, no shuffle of the exploded tokens), and partially
  aggregates per document — tokens of a document never leave their
  partition, so the one shuffle carries ~one row per document, not one
  per token. Everything is Column expressions inside whole-stage
  codegen; no Python hot path.

At 100 TB: scoring is scan-bound (explode + broadcast probe are
map-side); the only shuffle is the per-document reduce. A bigram/KenLM
upgrade slots in the same shape: the model stays a broadcastable
relation keyed by (prev, tok).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Lowercase word tokens — functions.text.WORD_REGEX lowered: the LM is
# deliberately case-insensitive (counts fold case) while text-stats
# counters are case-preserving; keep the two regexes visually adjacent
# to their source so a tokenizer change updates both. The column name
# is backquoted so non-identifier names ('text-col', dotted names)
# resolve as COLUMNS, not expressions.
_TOKEN_EXPR = r"regexp_extract_all(lower(`{col}`), '[a-z0-9_]+', 0)"


def _tokens(df: DataFrame, text_col: str, *keep: str) -> DataFrame:
    return df.select(
        *keep,
        F.explode(F.expr(_TOKEN_EXPR.format(col=text_col))).alias("token"),
    )


def _require_nonempty_model(model: DataFrame, what: str) -> None:
    """An empty model would make every score NULL (sum over zero rows)
    — garbage selection downstream with no error surfaced. The model is
    a bounded relation, so this eager check is one tiny job."""
    if model.isEmpty():
        raise ValueError(
            f"{what} is empty — the trusted-corpus filter matched no "
            "documents (or produced no tokens); fix the training slice"
        )


def train_unigram_lm(
    corpus: DataFrame, text_col: str = "text", vocab_size: int = 10_000
) -> DataFrame:
    """(token, cnt) for the ``vocab_size`` most frequent tokens of the
    trusted corpus. Deterministic top-V tie-break: count DESC, token ASC
    — identical in any engine, so the model itself is reproducible."""
    counts = _tokens(corpus, text_col).groupBy("token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    model = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(
        vocab_size
    )
    # Materialize the (bounded, ≤vocab_size-row) model ONCE: scoring
    # references it several times — the emptiness check, the stats
    # aggregate, and the broadcast probe each build independently, and
    # every broadcast/aggregate job would otherwise re-run the full
    # corpus tokenize+count+top-V (measured 4 redundant corpus passes
    # per bigram scoring query). localCheckpoint keeps it a relation
    # (the module's "model is data, not driver state" contract) while
    # truncating the lineage to the cut rows.
    return model.localCheckpoint(eager=True)


def unigram_logprob(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document mean token log-probability under the add-``alpha``
    smoothed unigram ``model``: p(t) = (cnt_t + α) / (N + α·(V+1)),
    out-of-vocabulary tokens taking the cnt=0 slot. Higher (less
    negative) ⇒ more like the trusted corpus. Output:
    (id, n_tokens, avg_logprob); documents with zero word tokens are
    absent (they have no distribution to score — filter them upstream
    with text_stats if they must be kept).

    ``model`` must be bounded (train_unigram_lm's top-V guarantee): it
    is broadcast, and its normalization constants come from a 1-row
    aggregate cross-joined in — the plan stays one scan + one reduce."""
    _require_nonempty_model(model, "unigram model")
    stats = model.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_v")
    )
    toks = _tokens(docs, text_col, id_col)
    scored = (
        toks.join(F.broadcast(model), "token", "left")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_lp",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                / (F.col("_total") + F.lit(alpha) * (F.col("_v") + 1))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("_lp").alias("avg_logprob"),
    )


def lm_quality_select(
    docs: DataFrame,
    model: DataFrame,
    keep_fraction: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Keep the best-scoring ``keep_fraction`` of documents by mean
    log-probability — the CCNet head/middle/tail cut collapsed to one
    threshold. Keeps exactly ``floor(keep_fraction * n_docs)``
    documents via a global rank over the *scores* relation (one row per
    document, already reduced — never corpus bytes); at extreme scale
    swap the rank for an approxQuantile score threshold to avoid the
    single global sort."""
    from pyspark.sql.window import Window

    scores = unigram_logprob(docs, model, id_col, text_col, alpha)
    # exact budget: keep floor(fraction * n) documents — percent_rank
    # would always admit the top row (its rank is 0 ≤ any fraction)
    # and overshoot small corpora
    n1 = scores.agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy(F.col("avg_logprob").desc(), F.col(id_col).asc())
    return (
        scores.withColumn("_rn", F.row_number().over(w))
        .crossJoin(F.broadcast(n1))
        .filter(
            F.col("_rn")
            <= F.floor(F.lit(keep_fraction) * F.col("_n") + F.lit(1e-9))
        )
        .drop("_rn", "_n")
    )


def train_bigram_lm(
    corpus: DataFrame, text_col: str = "text", max_bigrams: int = 50_000
) -> DataFrame:
    """(prev, tok, cnt) for the ``max_bigrams`` most frequent adjacent
    token pairs of the trusted corpus. Pairs are built ARRAY-SIDE
    (zip the token array with itself shifted by one) — no window
    function, no per-document shuffle; the only exchange is the
    map-side-combined count. Deterministic top-B tie-break:
    count DESC, prev ASC, tok ASC."""
    # empty/1-token docs produce no pairs (guarded CASE)
    pairs = corpus.select(
        F.expr(_TOKEN_EXPR.format(col=text_col)).alias("_t")
    ).select(
        F.explode(
            F.expr(
                "CASE WHEN size(_t) >= 2 THEN transform(sequence(1, size(_t) - 1), "
                "i -> struct(_t[i - 1] AS prev, _t[i] AS tok)) "
                "ELSE CAST(array() AS array<struct<prev: string, tok: string>>) END"
            )
        ).alias("_pair")
    ).select("_pair.prev", "_pair.tok")
    counts = pairs.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    model = counts.orderBy(
        F.col("cnt").desc(), F.col("prev").asc(), F.col("tok").asc()
    ).limit(max_bigrams)
    # materialized once for the same multi-reference reason as
    # train_unigram_lm (the scorer builds prev_tot AND broadcasts the
    # model — two independent executions of the training cut otherwise)
    return model.localCheckpoint(eager=True)


def bigram_logprob(
    docs: DataFrame,
    unigram_model: DataFrame,
    bigram_model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    lam: float = 0.7,
) -> DataFrame:
    """Per-document mean token log-probability under an INTERPOLATED
    bigram model: for token i>0,
    ``p = λ·cnt(prev,tok)/cnt(prev,·) + (1-λ)·p_uni(tok)``, falling
    back to pure ``p_uni`` when the bigram context is unseen in the
    (bounded) model; the document's first token scores as unigram.
    ``p_uni`` is the same add-α distribution as :func:`unigram_logprob`.

    Scale shape identical to the unigram scorer: both models are
    bounded relations (top-V / top-B) → broadcast probes; the
    (prev, tok) pairs are built array-side so tokens never shuffle;
    the one exchange is the per-document reduce (~one row per doc)."""
    _require_nonempty_model(unigram_model, "unigram model")
    stats = unigram_model.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_v")
    )
    prev_tot = bigram_model.groupBy("prev").agg(
        F.sum("cnt").alias("_ptot")
    )
    toks = docs.select(
        F.col(id_col),
        F.expr(_TOKEN_EXPR.format(col=text_col)).alias("_t"),
    ).select(
        id_col,
        F.explode(
            # size guard: sequence(0, -1) on a zero-token doc counts
            # DOWN ([0,-1]) and _t[i] then indexes an empty array —
            # an ANSI crash; skip such docs like the oracle's len>=1
            F.expr(
                "CASE WHEN size(_t) >= 1 THEN "
                "transform(sequence(0, size(_t) - 1), "
                "i -> struct(IF(i = 0, CAST(NULL AS STRING), _t[i - 1]) AS prev, "
                "_t[i] AS tok)) "
                "ELSE CAST(array() AS array<struct<prev: string, tok: string>>) "
                "END"
            )
        ).alias("_p"),
    ).select(id_col, "_p.prev", "_p.tok")
    uni = unigram_model.select(
        F.col("token").alias("tok"), F.col("cnt").alias("_ucnt")
    )
    scored = (
        toks.join(F.broadcast(uni), "tok", "left")
        .join(F.broadcast(bigram_model), ["prev", "tok"], "left")
        .join(F.broadcast(prev_tot), "prev", "left")
        .crossJoin(F.broadcast(stats))
    )
    p_uni = (F.coalesce(F.col("_ucnt"), F.lit(0)) + F.lit(alpha)) / (
        F.col("_total") + F.lit(alpha) * (F.col("_v") + 1)
    )
    has_ctx = F.col("_ptot").isNotNull() & F.col("prev").isNotNull()
    p_bi = F.coalesce(F.col("cnt"), F.lit(0)) / F.col("_ptot")
    p = F.when(has_ctx, F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni).otherwise(
        p_uni
    )
    return scored.withColumn("_lp", F.log(p)).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("_lp").alias("avg_logprob"),
    )
