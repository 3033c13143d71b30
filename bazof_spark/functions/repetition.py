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

    Shuffle profile: NONE. A per-document mode needs no exchange — the
    gram array is sorted per row and folded once (longest run of the
    sorted array = most frequent gram; scanning ascending makes the
    ``>=`` update reproduce the (count, gram) struct-max tie-break
    exactly). The whole operator is a map over documents, the shape
    that scales to any corpus size: the earlier explode + double
    groupBy version shuffled every (doc, gram) pair twice. Grams reuse
    `shingles` semantics (single-word docs yield the whole text as
    their one "gram", so every document emits a row).
    """
    t = F.col(text_col)
    sorted_grams = F.array_sort(shingles(t, n))
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit("").alias("bestgram"),
    )

    def _step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        better = (run > acc["best"]) | (
            (run == acc["best"]) & (x >= acc["bestgram"])
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["bestgram"]).alias("bestgram"),
        )

    top = F.aggregate(sorted_grams, init, _step)
    chars = F.length(t)
    return docs.select(
        id_col,
        F.round(word_repetition_ratio(t), 6).alias("word_rep_ratio"),
        top["bestgram"].alias("top_gram"),
        F.round(
            F.when(
                chars > 0,
                top["best"] * F.length(top["bestgram"]) / chars,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_gram_frac"),
    )
