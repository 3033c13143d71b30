"""JSONL corpus source — the interchange format training-data
pipelines actually receive (one JSON object per line, gzip shards).

Spark reads JSONL natively and in parallel (one task per
shard/split); the rules that matter at 100 TB:

- **explicit schema**: schema inference is a full extra pass over the
  data; always pass the StructType.
- **gzip shards**: a .gz file is NOT splittable — one task per shard,
  so shard size (not file count) sets parallelism. Write many
  medium shards (Spark does: one per partition).
- **corrupt-record channel**: PERMISSIVE mode + a _corrupt_record
  column quarantines bad lines instead of failing the job.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def documents_as_jsonl(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently materialize ``{sf_dir}/documents.parquet`` as gzip
    JSONL shards (once per sf_dir) and return the shard directory."""
    from bazof_spark.sources.tables import source_tag
    tag = source_tag(sf_dir, "documents")
    path = os.path.join(tempfile.gettempdir(), f"bazof_jsonl_{tag}")
    marker = os.path.join(path, "_BUILT")
    if not os.path.exists(marker):
        from bazof_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        (
            docs.write.mode("overwrite")
            .option("compression", "gzip")
            .json(path)
        )
        with open(marker, "w", encoding="utf-8") as f:
            f.write("ok")
    return path


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Parallel JSONL read with explicit schema + corrupt-line
    quarantine. Returns only well-formed rows; callers wanting the
    quarantine select ``_corrupt_record is not null`` before this
    filter."""
    schema = schema or DOCUMENTS_JSONL_SCHEMA
    with_corrupt = T.StructType(
        [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return df.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
