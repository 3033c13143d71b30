"""Materialize a VERSIONED ANN INDEX inside the table format: the IVF
inverted-list membership (vec_id → coarse list) lives in an azof table,
so the index itself gets time travel / upserts — refreshing the index
never loses the previous one, and a scan can search the corpus exactly
as the index stood at any instant (the production "index refresh
without downtime" shape; the reference's format semantics are at
crates/azof/src/metadata.rs:47-104, applied here to derived index
state instead of primary data).

Layout (deterministic from the driver's ``embeddings`` table, so the
DuckDB oracle recomputes every assignment and both search answers from
first principles):

- Coarse quantizer: the 8 vectors with ``vec_id < 8``, fixed across
  versions (a realistic IVF keeps the quantizer stable between
  refreshes). Assignment = argmax over seeds of cosine rounded to 6
  decimals, ties to the smaller seed id.
- v1 (event_time 2024-03-01): index rows for ``vec_id % 2 == 0`` only
  (the corpus half indexed at first build).
- v2 (event_time 2024-04-01): the refresh — EVERY vector gets a row:
  the odd half is newly indexed, and vectors with ``vec_id % 6 == 0``
  are REASSIGNED to their SECOND-best list (a rebalancing pass), which
  the as-of merge must shadow over their v1 assignment.

An as-of scan between the instants must search v1's half-corpus index
with v1 assignments; a Current scan must see the full index with the
rebalanced lists. Assignment is one broadcast-seeds map pass over the
corpus (the honest IVF-assign shape); the table build is cached per
sf_dir content tag with the same atomic scratch-dir publish as
sources/media.py.
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bazof_spark.lakehouse import Lakehouse
from bazof_spark.schema import ColumnDef, ColumnType, TableSchema

INDEX_SCHEMA = TableSchema((ColumnDef("list_id", ColumnType.INT, False),))

TABLE_NAME = "ivf_index"
N_SEEDS = 8
V1_AT = datetime(2024, 3, 1, tzinfo=timezone.utc)
V2_AT = datetime(2024, 4, 1, tzinfo=timezone.utc)
#: the as-of instant between index versions (query + oracle share it)
BETWEEN = "2024-03-15T00:00:00.000Z"


def _assignments(spark: SparkSession, sf_dir: str):
    """(vec_id, list_id, alt_list_id): best and second-best coarse list
    per corpus vector — one broadcast-seeds pass, no shuffle beyond the
    per-vector top-2 window (WindowGroupLimit keeps it map-side)."""
    from pyspark.sql import Window

    from bazof_spark.operators.similarity import dot, normalize
    from bazof_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        normalize(F.col("embedding").cast("array<double>")).alias("vec"),
    )
    seeds = e.filter(F.col("vec_id") < N_SEEDS).select(
        F.col("vec_id").alias("sid"), F.col("vec").alias("svec")
    )
    scored = e.join(F.broadcast(seeds)).select(
        "vec_id",
        "sid",
        F.round(dot(F.col("vec"), F.col("svec")), 6).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("sid").asc()
    )
    ranked = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 2
    )
    return ranked.groupBy("vec_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("sid"))).alias("list_id"),
        F.max(F.when(F.col("rn") == 2, F.col("sid"))).alias("alt_list_id"),
    )


def _build(spark: SparkSession, sf_dir: str, root: str) -> None:
    from bazof_spark.writer import TableWriter, append_delta

    assign = _assignments(spark, sf_dir)
    v1 = (
        assign.filter(F.col("vec_id") % 2 == 0)
        .select(
            F.col("vec_id").cast("string").alias("key"),
            F.lit(V1_AT).alias("event_time"),
            F.col("list_id").cast("long"),
        )
    )
    # the refresh: every vector (re)indexed; % 6 == 0 rebalanced to the
    # second-best list, which the as-of merge must shadow over v1
    v2 = assign.select(
        F.col("vec_id").cast("string").alias("key"),
        F.lit(V2_AT).alias("event_time"),
        F.when(F.col("vec_id") % 6 == 0, F.col("alt_list_id"))
        .otherwise(F.col("list_id"))
        .cast("long")
        .alias("list_id"),
    )
    path = os.path.join(root, TABLE_NAME)
    w = TableWriter(spark, path, INDEX_SCHEMA)
    seg = w.add_segment("ix1", V1_AT)
    seg.add_delta_distributed(v1, V1_AT, V1_AT, num_files=2)
    w.commit()
    append_delta(spark, path, v2, distributed=True, num_files=2)


def ann_index_lakehouse(spark: SparkSession, sf_dir: str) -> Lakehouse:
    """Idempotently build (once per sf_dir content tag) and return a
    Lakehouse whose ``ivf_index`` table holds the two-version index
    history described in the module docstring. Publish is the atomic
    scratch-dir + rename pattern (concurrency-safe, sources/media.py)."""
    import shutil
    import uuid

    from bazof_spark.sources.tables import source_tag

    tag = source_tag(sf_dir, "embeddings")
    root = os.path.join(tempfile.gettempdir(), f"bazof_annix_{tag}")
    marker = os.path.join(root, TABLE_NAME, "_BUILT")
    if not os.path.exists(marker):
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
