"""Materialize a VERSIONED media table: image blobs in a ``Binary``
column of an azof-format table, so media payloads get the same time
travel / upsert / tombstone semantics as scalar columns (the round-11
``Binary`` schema extension — ``schema.ColumnType.BINARY``; the
reference's four types are at crates/azof/src/schema.rs:15-21).

Layout (deterministic from the driver's ``documents`` table, so the
DuckDB oracle can recompute every expected answer from the pixel
formulas alone):

- v1 (event_time 2024-01-01): one delta with EVERY doc's blob — a
  24-bit BMP of ``(2·mid + 5·y + 11·x + c) % 256`` pixels, dims
  ``(3 + mid % 6) × (2 + mid % 5)``, ``rev = 1``.
- v2 (event_time 2024-02-01): an upsert delta re-encoding every
  ``doc_id % 3 == 0`` blob with ``(mid + 13·y + 3·x + 2·c) % 256``,
  dims ``(4 + mid % 4) × (3 + mid % 3)``, ``rev = 2``.

An as-of scan between the instants must decode only v1 imagery; a
Current scan must see v2 for the re-encoded third and v1 elsewhere.
Blob synthesis is an Arrow-batched mapInPandas pass (executor-side,
no driver loop); the table build is cached per sf_dir content tag.
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bazof_spark.lakehouse import Lakehouse
from bazof_spark.schema import ColumnDef, ColumnType, TableSchema

MEDIA_SCHEMA = TableSchema(
    (
        ColumnDef("content", ColumnType.BINARY, False),
        ColumnDef("rev", ColumnType.INT, False),
    )
)

TABLE_NAME = "media_versioned"
V1_AT = datetime(2024, 1, 1, tzinfo=timezone.utc)
V2_AT = datetime(2024, 2, 1, tzinfo=timezone.utc)
#: the as-of instant between the versions (query + oracle share it)
BETWEEN = "2024-01-15T00:00:00.000Z"


def _blob_df(spark: SparkSession, sf_dir: str, rev: int):
    """(key, event_time, content, rev) for one version's delta."""
    import numpy as np
    import pandas as pd

    from bazof_spark.operators.multimodal import encode_bmp
    from bazof_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    if rev == 2:
        docs = docs.filter(F.col("doc_id") % 3 == 0)
    at = V1_AT if rev == 1 else V2_AT

    def synth(it):
        for pdf in it:
            keys, blobs = [], []
            for mid in pdf["doc_id"]:
                mid = int(mid)
                if rev == 1:
                    w, h = 3 + mid % 6, 2 + mid % 5
                    formula = lambda y, x, c: (2 * mid + 5 * y + 11 * x + c)
                else:
                    w, h = 4 + mid % 4, 3 + mid % 3
                    formula = lambda y, x, c: (mid + 13 * y + 3 * x + 2 * c)
                y = np.arange(h).reshape(h, 1, 1)
                x = np.arange(w).reshape(1, w, 1)
                c = np.arange(3).reshape(1, 1, 3)
                px = (formula(y, x, c) % 256).astype(np.uint8)
                keys.append(str(mid))
                blobs.append(encode_bmp(px))
            yield pd.DataFrame({"key": keys, "content": blobs})

    return (
        docs.mapInPandas(synth, "key string, content binary")
        .withColumn("event_time", F.lit(at))
        .withColumn("rev", F.lit(rev).cast("long"))
        .select("key", "event_time", "content", "rev")
    )


def _build(spark: SparkSession, sf_dir: str, root: str) -> None:
    # the 100-TB write path: both versions land as DISTRIBUTED
    # multi-file deltas (repartitioned by key, so precedence among
    # sibling files never arbitrates between versions of one key) —
    # a single-file delta would serialize the blob write on the driver
    from bazof_spark.writer import TableWriter, append_delta

    path = os.path.join(root, TABLE_NAME)
    w = TableWriter(spark, path, MEDIA_SCHEMA)
    seg = w.add_segment("m1", V1_AT)
    seg.add_delta_distributed(
        _blob_df(spark, sf_dir, rev=1), V1_AT, V1_AT, num_files=4
    )
    w.commit()
    append_delta(
        spark, path, _blob_df(spark, sf_dir, rev=2),
        distributed=True, num_files=2,
    )


def media_lakehouse(spark: SparkSession, sf_dir: str) -> Lakehouse:
    """Idempotently build (once per sf_dir content tag) and return a
    Lakehouse whose ``media_versioned`` table holds the two-version
    blob history described in the module docstring."""
    from bazof_spark.sources.tables import source_tag

    import shutil
    import uuid

    tag = source_tag(sf_dir, "documents")
    root = os.path.join(tempfile.gettempdir(), f"bazof_media_{tag}")
    marker = os.path.join(root, TABLE_NAME, "_BUILT")
    if not os.path.exists(marker):
        # concurrency-safe publish: build into a process-unique
        # scratch root (marker written BEFORE the rename so it is
        # published atomically with the table), then rename the table
        # dir into place — a concurrent builder losing the rename race
        # just discards its copy, so no two processes ever interleave
        # version.txt / s{v}.json writes under the shared root
        scratch = f"{root}.build-{os.getpid()}-{uuid.uuid4().hex}"
        _build(spark, sf_dir, scratch)
        with open(os.path.join(scratch, TABLE_NAME, "_BUILT"), "w") as f:
            f.write("ok")
        os.makedirs(root, exist_ok=True)
        try:
            os.rename(
                os.path.join(scratch, TABLE_NAME),
                os.path.join(root, TABLE_NAME),
            )
        except OSError:
            if not os.path.exists(marker):
                raise
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    return Lakehouse(spark, root)
