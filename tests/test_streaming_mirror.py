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
    from bazof_spark.operators.cdc import apply_raw_stream_batch
    from bazof_spark.sources.cdfmirror import ACCT_SCHEMA

    spark.dataSource.register(BazofDataSource)
    mirror_path = os.path.join(roots, "mirror")

    def apply_batch(batch_df, batch_id):
        apply_raw_stream_batch(spark, mirror_path, ACCT_SCHEMA, batch_df)

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
