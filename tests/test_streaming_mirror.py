"""STREAMING CDC mirror: the batch mirror (tests/test_cdfmirror.py)
consumed scan_changes windows; this drives the same pipeline through
``readStream.format("bazof")`` — the raw per-version stream with
``_rank`` (= snapshot version) and ``_tombstone`` markers — applying
each version inside foreachBatch as one atomic merge_apply. The result
must be bit-identical to the source at every instant: a streaming
materialized view over the change log."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark import Lakehouse  # noqa: E402
from bazof_spark.sources import cdfmirror  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def roots(spark, tmp_path_factory):
    """Source A (3 deterministic versions incl. deletes) + an empty
    spot for the stream-maintained mirror."""
    root = str(tmp_path_factory.mktemp("smirror"))
    cdfmirror._build_source(spark, SF_DIR, os.path.join(root, "acct"))
    return root


def test_streaming_mirror_matches_source_at_every_instant(spark, roots):
    from bazof_spark.datasource import BazofDataSource
    from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
    from bazof_spark.writer import TableWriter, merge_apply

    spark.dataSource.register(BazofDataSource)
    mirror_path = os.path.join(roots, "mirror")

    def apply_batch(batch_df, batch_id):
        rows = batch_df.persist()
        try:
            versions = sorted(
                r["_rank"] for r in rows.select("_rank").distinct().collect()
            )
            for v in versions:
                vd = rows.filter(F.col("_rank") == v)
                ups = vd.filter(~F.col("_tombstone")).select(
                    "key", "event_time", "balance", "status"
                )
                dels = vd.filter(F.col("_tombstone")).select(
                    "key", "event_time"
                )
                if not os.path.exists(os.path.join(mirror_path, "version.txt")):
                    w = TableWriter(
                        spark,
                        mirror_path,
                        TableSchema(
                            (
                                ColumnDef("balance", ColumnType.INT, False),
                                ColumnDef("status", ColumnType.STRING, False),
                            )
                        ),
                    )
                    at = ups.agg(F.min("event_time")).first()[0]
                    seg = w.add_segment("m1", at)
                    seg.add_delta(ups, at, at)
                    w.commit()
                    continue
                at = (
                    dels.agg(F.max("event_time")).first()[0]
                    or ups.agg(F.max("event_time")).first()[0]
                )
                merge_apply(
                    spark,
                    mirror_path,
                    upsert_df=ups if not ups.isEmpty() else None,
                    delete_keys_df=(
                        dels.select("key") if not dels.isEmpty() else None
                    ),
                    at=at,
                )
        finally:
            rows.unpersist()

    q = (
        spark.readStream.format("bazof")
        .option("path", roots)
        .option("table", "acct")
        .option("startingVersion", "0")
        .load()
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(roots, "_ckpt_mirror")
        )
        .start()
    )
    q.awaitTermination(300)

    lh = Lakehouse(spark, roots)
    mirror_lh = Lakehouse(spark, os.path.dirname(mirror_path))

    def state(lh_, table, as_of=None):
        return {
            r["key"]: (r["balance"], r["status"])
            for r in lh_.scan(table, as_of=as_of).collect()
        }

    for as_of in (
        "2024-05-15T00:00:00.000Z",
        cdfmirror.BETWEEN_V2,
        None,
    ):
        a = state(lh, "acct", as_of)
        b = state(mirror_lh, "mirror", as_of)
        assert a and a == b, f"streaming mirror diverged at {as_of}"
