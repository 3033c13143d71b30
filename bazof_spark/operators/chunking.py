"""Document chunking: overlapping token windows with offsets — the
preprocessing step between a cleaned corpus and an embedding /
retrieval index (RAG-style), and a sibling of operators/packing.py
(which concatenates; this splits).

Pure built-in expressions: split → sequence of window starts →
transform/slice/array_join. One output row per chunk via a single
posexplode; no UDF, no shuffle — a map-only operator that partitions
with the corpus at any scale. Window arithmetic is integer-exact so a
SQL oracle reproduces every chunk boundary bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's whitespace tokens into windows of
    ``chunk_tokens`` advancing by ``chunk_tokens - overlap``; the last
    window may be short, and a document shorter than one window yields
    exactly one chunk. Output: (id, chunk_id, n_chunk_tokens,
    chunk_text), chunk_id 0-based in document order."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    from bazof_spark.exprcache import cached_columns

    step = chunk_tokens - overlap

    # both select lists depend only on the four knobs — built once per
    # process (opt round 1, change 15: the window-start transform and
    # slice/join trees cost ~hundreds of py4j round trips per call)
    def _explode_cols() -> list:
        words = F.split(F.trim(F.col(text_col)), r"\s+")
        n = F.size(words)
        # integer-exact chunk count: max(1, ceil((n - overlap) / step))
        n_chunks = F.greatest(
            F.lit(1),
            (n - F.lit(overlap) + F.lit(step - 1)).cast("long")
            / F.lit(step),
        ).cast("long")
        return [
            F.col(id_col),
            words.alias("_w"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0).cast("long"), n_chunks - 1),
                    lambda c: c * step,
                )
            ).alias("chunk_id", "_start"),
        ]

    def _piece_cols() -> list:
        piece = F.slice(F.col("_w"), F.col("_start") + 1, chunk_tokens)
        return [
            F.col(id_col),
            F.col("chunk_id"),
            F.size(piece).alias("n_chunk_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        ]

    key = (chunk_tokens, overlap, id_col, text_col)
    with_chunks = docs.select(
        *cached_columns(("chunk_documents", "explode") + key, _explode_cols)
    )
    return with_chunks.select(
        *cached_columns(("chunk_documents", "piece") + key, _piece_cols)
    )
