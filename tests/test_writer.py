"""Writer tests: author an azof-format table with TableWriter, scan it
back, and check the layout invariants + CSV gen path
(reference gen tooling: crates/azof-cli/src/main.rs:61-99)."""

from datetime import datetime, timezone

import pyarrow.parquet as pq
import pytest

from bazof_spark.errors import BazofError
from bazof_spark.lakehouse import Lakehouse
from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
from bazof_spark.writer import TableWriter, csv_to_dataframe, dataframe_to_parquet_file


def ts(y, m, d):
    return datetime(y, m, d, tzinfo=timezone.utc)


SCHEMA = TableSchema((ColumnDef("value", ColumnType.STRING, False),))


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, t, v) for k, t, v in rows], SCHEMA.to_struct_type()
    )


def test_write_and_scan_round_trip(spark, tmp_path):
    root = str(tmp_path)
    w = TableWriter(spark, f"{root}/t", SCHEMA)
    seg = w.add_segment(
        "10",
        ts(2024, 1, 1),
        base_df=_df(spark, [("1", ts(2024, 1, 1), "abc"), ("2", ts(2024, 1, 1), "xyz")]),
    )
    seg.add_delta(
        _df(
            spark,
            [
                ("3", ts(2024, 3, 10), "www2"),
                ("2", ts(2024, 2, 20), "xyz2"),
                ("1", ts(2024, 2, 1), "abc2"),
            ],
        ),
        start=ts(2024, 2, 1),
        end=ts(2024, 4, 1),
    )
    w.commit()

    lh = Lakehouse(spark, root)
    assert lh.list_tables() == ["t"]
    got = sorted(tuple(r) for r in lh.scan("t").select("key", "value").collect())
    assert got == [("1", "abc2"), ("2", "xyz2"), ("3", "www2")]
    got = sorted(
        tuple(r)
        for r in lh.scan("t", as_of=ts(2024, 2, 17)).select("key", "value").collect()
    )
    assert got == [("1", "abc2"), ("2", "xyz")]


def test_written_file_sorted_desc(spark, tmp_path):
    """Physical layout invariant: event_time DESC within a file
    (crates/azof-cli/src/test_bench.rs:103-121)."""
    dest = str(tmp_path / "f.parquet")
    df = _df(
        spark,
        [("1", ts(2024, 1, 1), "a"), ("2", ts(2024, 3, 1), "b"), ("3", ts(2024, 2, 1), "c")],
    )
    dataframe_to_parquet_file(df, dest)
    t = pq.read_table(dest)
    times = t.column("event_time").to_pylist()
    assert times == sorted(times, reverse=True)
    assert str(t.schema.field("event_time").type) == "timestamp[us, tz=UTC]"


def test_duplicate_key_event_time_rejected(spark, tmp_path):
    w = TableWriter(spark, str(tmp_path / "t"), SCHEMA)
    dup = _df(spark, [("1", ts(2024, 1, 1), "a"), ("1", ts(2024, 1, 1), "b")])
    with pytest.raises(BazofError):
        w.add_segment("10", ts(2024, 1, 1), base_df=dup)


def test_csv_gen_path(spark, tmp_path):
    """Headerless CSV → DataFrame → parquet, like `azof-cli gen`."""
    csv = tmp_path / "delta.csv"
    csv.write_text("3,2024-03-10,www2\n2,2024-02-20,xyz2\n1,2024-02-01,abc2\n")
    df = csv_to_dataframe(spark, str(csv), SCHEMA)
    rows = sorted(tuple(r) for r in df.select("key", "value").collect())
    assert rows == [("1", "abc2"), ("2", "xyz2"), ("3", "www2")]
    assert [f.name for f in df.schema.fields] == ["key", "event_time", "value"]


def test_nested_segments_written_and_scanned(spark, tmp_path):
    """Child segments shadow the parent (docs/architecture.md:84)."""
    root = str(tmp_path)
    w = TableWriter(spark, f"{root}/t", SCHEMA)
    parent = w.add_segment(
        "y2024",
        ts(2024, 1, 1),
        base_df=_df(spark, [("1", ts(2024, 1, 1), "parent")]),
    )
    parent.add_child(
        "q3",
        ts(2024, 7, 1),
        base_df=_df(spark, [("1", ts(2024, 7, 1), "child")]),
    )
    # parent also has a delta NEWER than the child's base: file precedence
    # must still let the child win (precedence beats timestamp)
    parent.add_delta(
        _df(spark, [("1", ts(2024, 8, 15), "parent-delta")]),
        start=ts(2024, 8, 1),
        end=ts(2024, 9, 1),
    )
    w.commit()

    lh = Lakehouse(spark, root)
    got = lh.scan("t").select("key", "value").collect()
    assert [tuple(r) for r in got] == [("1", "child")]


def test_distributed_delta_write(spark, tmp_path):
    """One logical delta written as many files in a single Spark job:
    keys stay consistent (hash-partitioned by key) and precedence across
    subsequent deltas still works."""
    root = str(tmp_path)
    w = TableWriter(spark, f"{root}/t", SCHEMA)
    seg = w.add_segment("s1", ts(2024, 1, 1))
    big = _df(
        spark,
        [(str(i), ts(2024, 1, 2), f"v{i}") for i in range(200)],
    )
    seg.add_delta_distributed(big, start=ts(2024, 1, 1), end=ts(2024, 2, 1), num_files=4)
    # a later single-file delta updates one key
    seg.add_delta(
        _df(spark, [("7", ts(2024, 1, 20), "updated")]),
        start=ts(2024, 2, 1),
        end=ts(2024, 3, 1),
    )
    snapshot = w.commit()

    files = snapshot.get_data_files()
    assert len(files) == 5  # 4 part files + 1 single-file delta
    lh = Lakehouse(spark, root)
    got = {r["key"]: r["value"] for r in lh.scan("t").collect()}
    assert len(got) == 200
    assert got["7"] == "updated"
    assert got["13"] == "v13"
    # as-of before the update sees the original
    early = {
        r["key"]: r["value"]
        for r in lh.scan("t", as_of=ts(2024, 1, 15)).collect()
    }
    assert early["7"] == "v7"


def test_nullable_values_round_trip(spark, tmp_path):
    """Nulls in nullable value columns survive write → as-of scan →
    projection. The reference DECLARES nullability but its scan never
    handles nulls (append_value reads unconditionally,
    crates/azof/src/schema.rs:54-77); we support them natively — a
    documented superset (SURVEY §7.4)."""
    schema = TableSchema(
        (
            ColumnDef("value", ColumnType.STRING, True),
            ColumnDef("score", ColumnType.INT, True),
        )
    )
    root = str(tmp_path)
    w = TableWriter(spark, f"{root}/n", schema)
    seg = w.add_segment(
        "10",
        ts(2024, 1, 1),
        base_df=spark.createDataFrame(
            [
                ("1", ts(2024, 1, 1), "a", 5),
                ("2", ts(2024, 1, 1), None, None),
            ],
            schema.to_struct_type(),
        ),
    )
    seg.add_delta(
        spark.createDataFrame(
            [("1", ts(2024, 2, 1), None, 7)], schema.to_struct_type()
        ),
        start=ts(2024, 2, 1),
        end=ts(2024, 3, 1),
    )
    w.commit()

    lh = Lakehouse(spark, root)
    got = {
        r["key"]: (r["value"], r["score"])
        for r in lh.scan("n").select("key", "value", "score").collect()
    }
    assert got == {"1": (None, 7), "2": (None, None)}
    # null value columns never affect the merge winner (key/event_time
    # are the non-null system columns)
    early = {
        r["key"]: (r["value"], r["score"])
        for r in lh.scan("n", as_of=ts(2024, 1, 15)).select(
            "key", "value", "score"
        ).collect()
    }
    assert early == {"1": ("a", 5), "2": (None, None)}


def test_generic_fs_uri_author_upsert_scan(spark, tmp_path):
    """The write path runs through pyarrow.fs for any URI: author a
    table, upsert into it and scan it back addressed as file:// — the
    same code path an object store (s3://, gs://) would take for
    metadata and single-file deltas."""
    from datetime import datetime, timezone

    from bazof_spark.lakehouse import Lakehouse
    from bazof_spark.writer import TableWriter, append_delta

    def ts(d):
        return datetime(2024, 1, d, tzinfo=timezone.utc)

    uri_root = f"file://{tmp_path}"
    w = TableWriter(spark, f"{uri_root}/t", SCHEMA)
    w.add_segment(
        "s1",
        ts(1),
        base_df=_df(spark, [("k1", ts(1), "a1"), ("k2", ts(1), "b1")]),
    )
    w.commit()
    append_delta(
        spark, f"{uri_root}/t", _df(spark, [("k1", ts(2), "a2")])
    )
    lh = Lakehouse(spark, uri_root)
    got = sorted(
        tuple(r) for r in lh.scan("t").select("key", "value").collect()
    )
    assert got == [("k1", "a2"), ("k2", "b1")]


def test_insert_deltas_tie_gives_new_commit_precedence():
    """A later commit sharing a start with an existing delta must sort
    BEFORE it (stable start-DESC reader sort → later upsert shadows);
    strictly newer/older starts keep plain ordering; intra-commit file
    order is preserved."""
    from datetime import datetime, timezone

    from bazof_spark.metadata import Delta
    from bazof_spark.writer import _insert_deltas

    def d(name, iso):
        t = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
        return Delta(file=name, start=t, end=t)

    existing = (d("old_hi", "2024-03-01"), d("old_eq", "2024-01-01"))
    new = [d("new_p0", "2024-01-01"), d("new_p1", "2024-01-01")]
    out = _insert_deltas(
        existing, new,
        datetime.fromisoformat("2024-01-01").replace(tzinfo=timezone.utc),
    )
    assert [x.file for x in out] == ["old_hi", "new_p0", "new_p1", "old_eq"]
    # naive start (Spark session-UTC aggregate) compares as UTC instant
    out2 = _insert_deltas(existing, new, datetime.fromisoformat("2024-01-01"))
    assert [x.file for x in out2] == ["old_hi", "new_p0", "new_p1", "old_eq"]


def test_distributed_upsert_on_file_uri(spark, tmp_path):
    """distributed=True on a file:// table path must work — the rename
    machinery handles the URI via the local fast path."""
    from datetime import datetime, timezone

    import pyspark.sql.functions as F

    from bazof_spark import Lakehouse
    from bazof_spark.writer import append_delta

    uri_root = "file://" + str(tmp_path)
    df = spark.createDataFrame(
        [(str(i), datetime(2024, 1, 1, tzinfo=timezone.utc), float(i))
         for i in range(20)],
        "key string, event_time timestamp, value double",
    )
    from bazof_spark.datasource import write_table

    write_table(df, str(tmp_path), "t", mode="overwrite")
    newer = df.withColumn(
        "event_time", F.expr("event_time + interval 30 days")
    ).withColumn("value", F.col("value") + 100)
    append_delta(
        spark, uri_root + "/t", newer, distributed=True, num_files=3
    )
    got = {
        r["key"]: r["value"]
        for r in Lakehouse(spark, str(tmp_path)).scan("t").collect()
    }
    assert got["0"] == 100.0 and len(got) == 20
    # object-store schemes are no longer refused: distributed writes on
    # s3:// roots stage executor-side through iofs (round 9 —
    # tests/test_object_store_real.py::
    # test_distributed_multifile_delta_over_real_s3)


def test_committed_files_carry_page_indexes(spark, tmp_path):
    """Round 11: every parquet file this writer commits carries
    OffsetIndex/ColumnIndex (page-granular predicate skipping for the
    JVM scan at scale) — verified by the repo's OWN from-spec page
    index parser, closing the loop: our writer's output, our reader's
    proof."""
    from datetime import datetime, timezone

    from bazof_spark.datasource import write_table
    from bazof_spark.operators.parquetmeta import (
        parse_column_index,
        parse_offset_index,
        parse_parquet_footer,
    )
    from bazof_spark.writer import append_delta

    df = spark.createDataFrame(
        [(str(i), datetime(2024, 1, 1, tzinfo=timezone.utc), float(i))
         for i in range(200)],
        "key string, event_time timestamp, value double",
    )
    write_table(df, str(tmp_path), "t", mode="overwrite")
    append_delta(
        spark, str(tmp_path / "t"),
        df.limit(40).withColumn("value", df.value + 1),
        distributed=True, num_files=2,
    )
    from bazof_spark import Lakehouse

    snap = Lakehouse(spark, str(tmp_path)).table("t").get_current_snapshot()
    files = [f for f, _ in snap.ranked_data_files()]
    assert len(files) >= 3  # base + 2 distributed delta parts
    for f in files:
        data = open(str(tmp_path / "t" / f), "rb").read()
        meta = parse_parquet_footer(data)
        for g in meta["row_groups"]:
            for chunk in g["columns"]:
                oi = parse_offset_index(data, chunk)
                assert oi and len(oi) >= 1, f
                # pyarrow suppresses the ColumnIndex for tz-aware
                # timestamp columns; key/value carry it
                if chunk["path_in_schema"] != ["event_time"]:
                    ci = parse_column_index(data, chunk)
                    assert ci and len(ci["min_values"]) == len(oi), f
