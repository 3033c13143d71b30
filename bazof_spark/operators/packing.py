"""Sequence packing for LLM pretraining prep: concat-and-chunk offsets.

Pretraining pipelines concatenate tokenized documents and slice the
stream into fixed-length sequences. The distributed form of that is an
OFFSET ASSIGNMENT problem: give every document its starting token
offset, then its span of sequence indices — downstream writers can
then emit sequence shards independently.

Scale shape: a single GLOBAL running sum would serialize on one
partition (and a global sort), so packing is SHARD-LOCAL — documents
are hash-bucketed into shards (deterministic, identity-stable, see
functions/sampling.py) and the running sum is a window per shard:
``sum(n_tokens) over (partition by shard order by doc_id)``. One
shuffle on shard, W-way parallel cumsum, no global ordering. Each
shard produces its own independent sequence stream, which is exactly
how multi-worker training data is laid out in practice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bazof_spark.functions.sampling import hash_bucket


def pack_offsets(
    df: DataFrame,
    n_tokens_col: str,
    seq_len: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign concat-and-chunk packing offsets per document.

    Output adds: ``shard`` (hash bucket of id), ``tok_offset`` (first
    token's position in the shard's concatenated stream), ``start_seq``
    / ``end_seq`` (fixed-length sequence indices the document spans
    within its shard — a doc crossing a boundary is split across those
    sequences, the standard pretraining behavior).

    Deterministic: shard assignment is an identity hash and the
    in-shard order is ``id_col`` — independent of partitioning, so any
    engine reproduces the exact offsets.
    """
    if seq_len <= 0 or n_shards <= 0:
        raise ValueError("seq_len and n_shards must be positive")
    shard = hash_bucket(F.col(id_col), n_shards, salt="pack")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n: Column = F.col(n_tokens_col).cast("long")
    out = df.withColumn("shard", shard.cast("int"))
    out = out.withColumn("tok_offset", F.sum(n).over(w) - n)
    # `div` = exact integer division on longs (float `/` would round at
    # large offsets); empty docs (n = 0) span their single start offset
    return out.withColumn(
        "start_seq", F.expr(f"tok_offset div {seq_len}")
    ).withColumn(
        "end_seq",
        F.expr(
            f"(tok_offset + greatest(cast({n_tokens_col} as bigint), 1) - 1) "
            f"div {seq_len}"
        ),
    )
