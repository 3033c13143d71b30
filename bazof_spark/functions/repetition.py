"""Repetition / boilerplate quality signals (Gopher-rule style).

Large-scale corpus cleaning filters documents whose content is
dominated by repeated fragments: the standard signals are the
duplicate-word fraction and the fraction of characters covered by the
single most frequent word n-gram (Rae et al., "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", §A1.1 —
public paper; no reference-repo counterpart, this is part of the
beyond-reference training-data surface).

`word_repetition_ratio` is a pure Column expression (stays inside
whole-stage codegen). The top-n-gram signal needs a per-document mode,
which is not expressible as a scalar expression — `repetition_stats`
computes it with explode + two partial-aggregated groupBys, the
standard scale shape: only (doc, gram, count) rows cross the first
exchange and one row per document crosses the second.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bazof_spark.functions.text import shingles


def word_repetition_ratio(text: Column) -> Column:
    """1 - distinct_words / total_words (0 for empty/wordless text)."""
    words = F.split(F.trim(text), r"\s+")
    n = F.size(words)
    return F.when(
        n > 0, F.lit(1.0) - F.size(F.array_distinct(words)) / n
    ).otherwise(F.lit(0.0))


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Per-document repetition signals:

    - ``word_rep_ratio``: duplicate-word fraction,
    - ``top_gram``: the most frequent word n-gram (ties broken toward
      the lexicographically greatest gram, deterministically, via a
      (count, gram) struct max — identical tuple-compare semantics in
      Spark and DuckDB),
    - ``top_gram_frac``: characters covered by that n-gram's
      occurrences / total characters.

    Shuffle profile: explode is map-side; groupBy(id, gram) and
    groupBy(id) both partial-aggregate, so exchanges carry counts, not
    text. Grams reuse `shingles` semantics (single-word docs yield the
    whole text as their one "gram").
    """
    t = F.col(text_col)
    base = docs.select(
        id_col,
        F.length(t).alias("_chars"),
        F.round(word_repetition_ratio(t), 6).alias("word_rep_ratio"),
        F.explode(shingles(t, n)).alias("gram"),
    )
    counts = base.groupBy(id_col, "_chars", "word_rep_ratio", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = counts.groupBy(id_col, "_chars", "word_rep_ratio").agg(
        F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("_top")
    )
    return top.select(
        id_col,
        "word_rep_ratio",
        F.col("_top.gram").alias("top_gram"),
        F.round(
            F.when(
                F.col("_chars") > 0,
                F.col("_top.cnt")
                * F.length(F.col("_top.gram"))
                / F.col("_chars"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_gram_frac"),
    )
