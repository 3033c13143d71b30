"""AsOf parsing/formatting + time-travel SQL rewrite tests
(reference: crates/azof-datafusion/src/parse.rs:176-284)."""

from datetime import datetime, timezone

import pytest

from bazof_spark.asof import (
    AsOf,
    Current,
    EventTime,
    epoch_millis,
    format_rfc3339_ms,
    parse_rfc3339,
)
from bazof_spark.errors import SqlRewriteError
from bazof_spark.sql import rewrite_and_extract_tables


def test_parse_rfc3339():
    dt = parse_rfc3339("2019-01-17T00:00:00.000Z")
    assert dt == datetime(2019, 1, 17, tzinfo=timezone.utc)
    assert epoch_millis(dt) == 1547683200000  # parse.rs:193-195
    assert format_rfc3339_ms(dt) == "2019-01-17T00:00:00.000Z"
    with pytest.raises(ValueError):
        parse_rfc3339("not-a-timestamp")
    with pytest.raises(ValueError):
        parse_rfc3339("2019-01-17T00:00:00")  # no offset → not RFC3339


def test_asof_constructors():
    assert Current.is_current
    t = EventTime("2024-06-01T00:00:00.000Z")
    assert not t.is_current
    assert t == AsOf.event_time(datetime(2024, 6, 1, tzinfo=timezone.utc))


def test_rewrite_system_time():
    """parse.rs:176-201 (inserts_version_into_table_ident)."""
    sql = (
        "SELECT key, revenue FROM tbl "
        "FOR SYSTEM_TIME AS OF '2019-01-17T00:00:00.000Z' WHERE x = 1"
    )
    rewritten, tables = rewrite_and_extract_tables(sql)
    assert "tbl__1547683200000" in rewritten
    assert "SYSTEM_TIME" not in rewritten
    vt = tables[0]
    assert (vt.name, vt.versioned_name) == ("tbl", "tbl__1547683200000")
    assert vt.as_of == EventTime("2019-01-17T00:00:00.000Z")


def test_rewrite_at_function():
    """parse.rs:203-228."""
    rewritten, tables = rewrite_and_extract_tables(
        "SELECT * FROM tbl AT('2019-01-17T00:00:00.000Z')"
    )
    assert rewritten == "SELECT * FROM tbl__1547683200000"
    assert tables[0].versioned_name == "tbl__1547683200000"


def test_rewrite_at_named_arg():
    """parse.rs:230-255 (AT(TIMESTAMP => ...))."""
    rewritten, tables = rewrite_and_extract_tables(
        "SELECT * FROM tbl AT(TIMESTAMP => '2019-01-17T00:00:00.000Z')"
    )
    assert rewritten == "SELECT * FROM tbl__1547683200000"
    assert tables[0].versioned_name == "tbl__1547683200000"


def test_rewrite_invalid_timestamp_errors():
    """parse.rs:257-284."""
    with pytest.raises(SqlRewriteError):
        rewrite_and_extract_tables("SELECT * FROM tbl AT('nonsense')")
    with pytest.raises(SqlRewriteError):
        rewrite_and_extract_tables(
            "SELECT * FROM tbl FOR SYSTEM_TIME AS OF '2019-13-45T99:00:00.000Z'"
        )


def test_rewrite_no_version_clause_is_current():
    """parse.rs:106-107 — bare table ⇒ Current."""
    rewritten, tables = rewrite_and_extract_tables("SELECT * FROM tbl")
    assert rewritten == "SELECT * FROM tbl"
    assert tables[0].name == "tbl"
    assert tables[0].as_of.is_current


def test_rewrite_self_join_two_instants():
    """Two as-of instants of one table → distinct versioned names
    (parse.rs:71-75)."""
    sql = (
        "SELECT a.key FROM tbl AT('2019-01-17T00:00:00.000Z') a "
        "JOIN tbl AT('2020-01-17T00:00:00.000Z') b ON a.key = b.key"
    )
    rewritten, tables = rewrite_and_extract_tables(sql)
    names = [t.versioned_name for t in tables]
    assert "tbl__1547683200000" in names
    assert "tbl__1579219200000" in names
    assert "tbl__1547683200000 a" in rewritten
    assert "tbl__1579219200000 b" in rewritten


def test_rewrite_preserves_alias_and_mixed_tables():
    sql = (
        "SELECT f.key AS symbol, n.n_name FROM financials "
        "AT ('2019-01-17T00:00:00.000Z') f JOIN nation n ON f.key = n.n_name "
        "ORDER BY f.revenue DESC LIMIT 5"
    )
    rewritten, tables = rewrite_and_extract_tables(sql)
    assert "financials__1547683200000 f" in rewritten
    by_name = {t.versioned_name: t for t in tables}
    assert "nation" in by_name and by_name["nation"].as_of.is_current


def test_rewrite_ignores_patterns_inside_string_literals():
    """Pattern-shaped TEXT inside string literals must not be rewritten
    (the reference is immune by construction — AST visitor)."""
    sql = (
        "SELECT * FROM events_versioned AT ('2024-01-15T00:00:00.000Z') "
        "WHERE note = 'snapshot financials AT (''2019-01-17T00:00:00.000Z'')' "
        "AND src != 'FROM phantom_table'"
    )
    rewritten, tables = rewrite_and_extract_tables(sql)
    assert "events_versioned__1705276800000" in rewritten
    # the literal is untouched and no phantom tables were extracted
    assert "financials AT (''2019-01-17T00:00:00.000Z'')" in rewritten
    names = {t.name for t in tables}
    assert names == {"events_versioned"}


def test_version_travel_scan_and_sql(spark, tmp_path):
    """Snapshot-version travel (Delta-style extension): scan(version=)
    plus FOR VERSION AS OF / AT(VERSION =>) SQL, coexisting with
    event-time travel."""
    from datetime import datetime, timezone

    from bazof_spark.lakehouse import Lakehouse
    from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
    from bazof_spark.writer import TableWriter

    def ts(y, m, d):
        return datetime(y, m, d, tzinfo=timezone.utc)

    schema = TableSchema((ColumnDef("value", ColumnType.STRING, False),))
    root = str(tmp_path)
    w = TableWriter(spark, f"{root}/vt", schema)
    seg = w.add_segment(
        "10",
        ts(2024, 1, 1),
        base_df=spark.createDataFrame(
            [("1", ts(2024, 1, 1), "a1"), ("2", ts(2024, 1, 1), "b1")],
            schema.to_struct_type(),
        ),
    )
    w.commit("1")
    seg.add_delta(
        spark.createDataFrame(
            [("1", ts(2024, 2, 1), "a2")], schema.to_struct_type()
        ),
        start=ts(2024, 2, 1),
        end=ts(2024, 3, 1),
    )
    w.commit("2")

    lh = Lakehouse(spark, root)
    latest = dict(lh.scan("vt").select("key", "value").collect())
    assert latest == {"1": "a2", "2": "b1"}
    v1 = dict(lh.scan("vt", version=1).select("key", "value").collect())
    assert v1 == {"1": "a1", "2": "b1"}

    got = dict(
        lh.sql("SELECT key, value FROM vt FOR VERSION AS OF 1").collect()
    )
    assert got == v1
    got = dict(lh.sql("SELECT key, value FROM vt AT(VERSION => 2)").collect())
    assert got == latest
    # event-time travel within the current snapshot still works alongside
    got = dict(
        lh.sql(
            "SELECT key, value FROM vt AT ('2024-01-15T00:00:00.000Z')"
        ).collect()
    )
    assert got == {"1": "a1", "2": "b1"}


def test_rewrite_changes_table_function():
    rewritten, tables = rewrite_and_extract_tables(
        "SELECT * FROM CHANGES('tbl', '2019-01-17T00:00:00.000Z')"
    )
    assert "CHANGES" not in rewritten
    assert "tbl__changes_1547683200000_current" in rewritten
    [vt] = tables
    assert vt.name == "tbl" and vt.changes == (
        "2019-01-17T00:00:00.000Z",
        None,
    )

    rewritten, tables = rewrite_and_extract_tables(
        "SELECT * FROM CHANGES('tbl', '2019-01-17T00:00:00.000Z', "
        "'2020-01-17T00:00:00.000Z') WHERE change_type = 'update'"
    )
    [vt] = tables  # WHERE literal must not register ghost tables
    assert vt.changes == (
        "2019-01-17T00:00:00.000Z",
        "2020-01-17T00:00:00.000Z",
    )
    with pytest.raises(SqlRewriteError):
        rewrite_and_extract_tables("SELECT * FROM CHANGES('tbl', 'garbage')")


def test_changes_sql_end_to_end(spark, tmp_path):
    from bazof_spark.lakehouse import Lakehouse
    from bazof_spark.schema import ColumnDef, ColumnType, TableSchema
    from bazof_spark.writer import TableWriter

    def ts(y, m, d):
        return datetime(y, m, d, tzinfo=timezone.utc)

    root = str(tmp_path)
    schema = TableSchema((ColumnDef("value", ColumnType.STRING, False),))
    w = TableWriter(spark, f"{root}/ct", schema)
    w.add_segment(
        "10",
        ts(2024, 1, 1),
        base_df=spark.createDataFrame(
            [("1", ts(2024, 1, 1), "a1"), ("2", ts(2024, 1, 1), "b1")],
            schema.to_struct_type(),
        ),
    )
    w.commit()
    lh = Lakehouse(spark, root)
    lh.upsert(
        "ct",
        spark.createDataFrame(
            [("1", ts(2024, 2, 1), "a2"), ("3", ts(2024, 2, 2), "c1")],
            schema.to_struct_type(),
        ),
    )

    got = {
        r["key"]: (r["change_type"], r["value_late"])
        for r in lh.sql(
            "SELECT key, change_type, value_late "
            "FROM CHANGES('ct', '2024-01-15T00:00:00.000Z')"
        ).collect()
    }
    assert got == {"1": ("update", "a2"), "3": ("insert", "c1")}
    # equivalent to the library call
    lib = {
        r["key"]: (r["change_type"], r["value_late"])
        for r in lh.scan_changes("ct", since="2024-01-15T00:00:00.000Z").collect()
    }
    assert got == lib


def test_rewrite_registers_comma_separated_from_list():
    """`FROM a, b` is two table factors — the reference registers every
    factor (context.rs:29-43), so the bare-name scan must walk comma
    continuations, with or without aliases."""
    _, tables = rewrite_and_extract_tables(
        "SELECT * FROM t1, t2, t3 WHERE t1.key = t2.key AND t2.key = t3.key"
    )
    assert {t.name for t in tables} == {"t1", "t2", "t3"}

    _, tables = rewrite_and_extract_tables(
        "SELECT * FROM t1 AS a, t2 b, t3 WHERE a.key = b.key"
    )
    names = {t.name for t in tables}
    assert {"t1", "t2", "t3"} <= names

    # ORDER BY / GROUP BY commas must not be mistaken for factors
    _, tables = rewrite_and_extract_tables(
        "SELECT x, y FROM t1 GROUP BY x, y ORDER BY x, y"
    )
    assert {t.name for t in tables} == {"t1"}


def test_rewrite_comma_list_with_time_travel():
    rewritten, tables = rewrite_and_extract_tables(
        "SELECT * FROM fin AT ('2019-01-17T00:00:00.000Z'), dims"
    )
    assert "fin__1547683200000" in rewritten
    assert {t.versioned_name for t in tables} == {
        "fin__1547683200000",
        "dims",
    }
