"""optimize_table (Z-order clustered checkpoint): reads must stay
bit-identical at every as-of, the validator must accept the clustered
(unsorted, unique-key) base, and the layout must actually narrow
per-row-group min/max spans on BOTH clustered columns — the property
parquet row-group skipping prunes on."""

from datetime import datetime, timezone

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bazof_spark.lakehouse import Lakehouse
from bazof_spark.maintenance import optimize_table, validate_table
from bazof_spark.operators.zorder import zorder_code
from bazof_spark.errors import BazofError
from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
from bazof_spark.writer import TableWriter


def ts(d, h=0):
    return datetime(2024, 1, d, h, tzinfo=timezone.utc)


SCHEMA = TableSchema(
    (
        ColumnDef("x", ColumnType.INT, False),
        ColumnDef("y", ColumnType.INT, False),
    )
)

N = 4096
SIDE = 64  # keys form a 64×64 grid: x = i // 64, y = i % 64


@pytest.fixture()
def lakehouse(spark, tmp_path):
    w = TableWriter(spark, str(tmp_path / "grid"), SCHEMA)
    df = spark.range(N).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        (F.lit(ts(1)) + F.make_interval(secs=F.col("id"))).alias(
            "event_time"
        ),
        (F.col("id") / SIDE).cast("long").alias("x"),
        (F.col("id") % SIDE).cast("long").alias("y"),
    )
    w.add_segment("s1", ts(1), base_df=df)
    w.commit()
    return Lakehouse(spark, str(tmp_path))


def snap(df):
    return sorted(tuple(r) for r in df.collect())


def test_optimize_preserves_reads_and_narrows_rowgroup_stats(lakehouse):
    before_current = snap(lakehouse.scan("grid"))
    before_asof = snap(lakehouse.scan("grid", as_of=ts(1, 0)))

    snapshot = optimize_table(
        lakehouse, "grid", ts(2), cluster_by=["x", "y"], row_group_rows=256
    )
    new_base = [s for s in snapshot.segments if s.end is None][0].file

    assert snap(lakehouse.scan("grid")) == before_current
    assert snap(lakehouse.scan("grid", as_of=ts(1, 0))) == before_asof

    report = validate_table(lakehouse, "grid")
    assert report.ok, report.errors
    assert any("order-independent" in w for w in report.warnings)

    # row-group min/max spans: Z-order must localize BOTH columns.
    # Unclustered (insertion order = x-major), each 256-row group spans
    # the full y range (64); clustered, both spans shrink.
    meta = pq.ParquetFile(
        lakehouse.table("grid").data_file_path(new_base)
    ).metadata
    assert meta.num_row_groups >= 8
    idx = {
        meta.row_group(0).column(i).path_in_schema: i
        for i in range(meta.row_group(0).num_columns)
    }
    spans = {"x": [], "y": []}
    for rg in range(meta.num_row_groups):
        for c in ("x", "y"):
            st = meta.row_group(rg).column(idx[c]).statistics
            spans[c].append(st.max - st.min)
    avg = {c: sum(v) / len(v) for c, v in spans.items()}
    # full span is 63; x-major insertion order would give y span ≈ 63
    # in every group. Z-order keeps the average well under half.
    assert avg["x"] < 32, avg
    assert avg["y"] < 32, avg


def test_optimize_then_upsert_then_time_travel(lakehouse, spark):
    """Lifecycle: a clustered checkpoint must stay a normal table —
    subsequent upserts land on top, Current reflects them, and as-of
    instants before the optimize still resolve through the archived
    segments bit-identically."""
    from bazof_spark.writer import append_delta

    pre = snap(lakehouse.scan("grid", as_of=ts(1, 1)))
    optimize_table(lakehouse, "grid", ts(2), cluster_by=["x", "y"])
    append_delta(
        lakehouse.spark,
        lakehouse.table("grid").path,
        spark.createDataFrame(
            [("k0", ts(3), 999, 999)], "key string, event_time timestamp, x long, y long"
        ),
        create_segment=True,
    )
    cur = {r["key"]: (r["x"], r["y"]) for r in lakehouse.scan("grid").collect()}
    assert cur["k0"] == (999, 999)
    assert cur["k7"] == (0, 7)
    assert snap(lakehouse.scan("grid", as_of=ts(1, 1))) == pre


def test_zorder_rejects_strings_and_overflow(spark):
    df = spark.createDataFrame([("a", 1)], "s string, v long")
    with pytest.raises(BazofError):
        zorder_code(df, ["s"])
    with pytest.raises(BazofError):
        zorder_code(df, ["v"], bits=63)


def test_zorder_code_interleaves(spark):
    # two uniform ramps: code must order points so consecutive codes
    # stay close in BOTH dimensions (the locality property); spot-check
    # the corner values: (min,min) → 0, (max,max) → all ones
    df = spark.createDataFrame(
        [(0, 0), (15, 15), (15, 0), (0, 15)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_code(df, ["x", "y"], bits=4)).collect()
    }
    assert out[(0, 0)] == 0
    assert out[(15, 15)] == 0xFF
    # x occupies even bits, y odd bits
    assert out[(15, 0)] == 0x55
    assert out[(0, 15)] == 0xAA
