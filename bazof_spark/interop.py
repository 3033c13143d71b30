"""ENGINE INTEROP: render an azof table as ONE standalone DuckDB SQL
statement — metadata resolution (version pointer → snapshot →
temporal file pruning) runs here, and the emitted SQL reproduces the
as-of merge (latest version ≤ t per key, file precedence, intra-file
first-row tie-break, tombstone hiding) with DuckDB's own
``read_parquet``. A user can query the lakehouse from DuckDB — or any
engine that can run the same shape — with no Spark session at all:

    sql = duckdb_view_sql(table_path, as_of="2024-02-17T00:00:00Z")
    duckdb.sql(sql).df()

This is also a THIRD independent implementation of the merge
semantics (the JVM scan and the Python Data Source being the other
two): tests/test_interop.py pins it bit-equal to ``Lakehouse.scan``
on the reference's own golden tables — including the financials
intra-file duplicate whose winner is decided by the first-row
tie-break — and on delete-capable tables at instants before and
after the tombstone.

Precedence encoding: the snapshot's ranked file list becomes a
``CASE filename`` rank column; the winner per key is ``row_number()
OVER (PARTITION BY key ORDER BY rank ASC, event_time DESC,
file_row_number ASC) = 1`` — exactly ``max_by(payload,
latest_wins_ordering("batch"))`` (ordering.py:42-60). DuckDB's
``file_row_number`` is the same physical position the Spark readers
expose as ``_row_idx``."""

from __future__ import annotations

import os

from bazof_spark.asof import AsOf, Current
from bazof_spark.table import Table


def _sq(s: str) -> str:
    """Single-quote a SQL string literal."""
    return "'" + s.replace("'", "''") + "'"


def _duck_path(p: str) -> str:
    """A path DuckDB's ``read_parquet`` can open: local paths pass
    through, ``file://`` strips the scheme, emulated object-store URIs
    resolve to their local mirror (iofs.emulated_mirror — the same
    bytes every other reader sees). Real object-store URIs raise: the
    sandbox DuckDB has no httpfs; a deployment with it would rewrite
    to ``s3://`` spellings and configure credentials instead."""
    if p.startswith("file://"):
        return p[len("file://") :]
    if "://" in p:
        from bazof_spark import iofs

        try:
            return iofs.emulated_mirror(p)
        except ValueError:
            raise ValueError(
                "duckdb_view_sql resolves local, file:// and "
                "emulated-scheme roots; for a real object store run "
                "DuckDB with httpfs and rewrite the file paths"
            ) from None
    return p


def duckdb_view_sql(
    table_path: str,
    as_of: AsOf | str | None = None,
    version: str | None = None,
    columns: list[str] | None = None,
) -> str:
    """The standalone DuckDB SELECT for ``table_path`` at ``as_of``
    (None = Current) / ``version`` (None = the version pointer).
    ``columns`` projects value columns (key/event_time always
    included, like every reader in the repo)."""
    from bazof_spark.asof import coerce_as_of
    from bazof_spark.schema import ColumnType

    t = Table(
        path=table_path, name=os.path.basename(table_path.rstrip("/"))
    )
    v = str(version) if version is not None else t.current_version()
    snapshot = t.get_snapshot(v)
    asof = coerce_as_of(as_of) if as_of is not None else Current

    duck_types = {
        ColumnType.STRING: "VARCHAR",
        ColumnType.INT: "BIGINT",
        ColumnType.BOOLEAN: "BOOLEAN",
        ColumnType.DATETIME: "TIMESTAMP",
        ColumnType.FLOAT: "DOUBLE",
        ColumnType.BINARY: "BLOB",
    }
    ranked = snapshot.ranked_data_files(asof)
    cols = [
        c for c in snapshot.schema.columns
        if columns is None or c.name in columns
    ]
    if columns is not None:
        missing = set(columns) - {c.name for c in snapshot.schema.columns}
        if missing:
            raise ValueError(f"unknown columns: {sorted(missing)}")
    # files written before a RENAME store the former spelling;
    # union_by_name NULL-fills whichever is absent, so coalescing the
    # declared-then-former names is a disjoint union (scan_snapshot's
    # exact trick)
    value_sel = ", ".join(
        (
            "COALESCE(" + ", ".join([c.name, *c.formers]) + f") AS {c.name}"
            if c.formers
            else c.name
        )
        for c in cols
    )
    value_sel = ("key, event_time, " + value_sel) if cols else "key, event_time"
    col_list = ", ".join(["key", "event_time", *(c.name for c in cols)])

    if not ranked:
        typed = ", ".join(
            f"CAST(NULL AS {duck_types[c.data_type]}) AS {c.name}"
            for c in cols
        )
        typed = (
            "CAST(NULL AS VARCHAR) AS key, "
            "CAST(NULL AS TIMESTAMP) AS event_time"
            + (", " + typed if typed else "")
        )
        return f"SELECT {col_list} FROM (SELECT {typed}) WHERE FALSE"

    paths = ", ".join(
        _sq(_duck_path(t.data_file_path(f))) for f, _ in ranked
    )
    rank_case = " ".join(
        f"WHEN {_sq(_duck_path(t.data_file_path(f)))} THEN {r}"
        for f, r in ranked
    )
    tombs = snapshot.tombstone_files()
    tomb_files = [
        _duck_path(t.data_file_path(f))
        for f, _ in ranked
        if f in tombs
    ]
    if tomb_files:
        tomb_expr = "filename IN (" + ", ".join(
            _sq(p) for p in tomb_files
        ) + ")"
    else:
        tomb_expr = "FALSE"

    visible = ""
    if not asof.is_current:
        instant = asof.event_time_at.strftime("%Y-%m-%d %H:%M:%S.%f")
        visible = (
            f"WHERE event_time <= TIMESTAMP {_sq(instant)}"
        )

    return f"""
WITH raw AS (
    SELECT *, CASE filename {rank_case} END AS _rank,
           ({tomb_expr}) AS _tombstone
    FROM read_parquet([{paths}],
                      filename = true, file_row_number = true,
                      union_by_name = true)
),
visible AS (
    SELECT * FROM raw {visible}
),
won AS (
    SELECT *, row_number() OVER (
        PARTITION BY key
        ORDER BY _rank ASC, event_time DESC, file_row_number ASC
    ) AS _rn
    FROM visible
)
SELECT {col_list} FROM (
    SELECT {value_sel} FROM won WHERE _rn = 1 AND NOT _tombstone
)
""".strip()


def duckdb_changes_sql(
    table_path: str,
    since: AsOf | str,
    until: AsOf | str | None = None,
    columns: list[str] | None = None,
) -> str:
    """The CHANGE FEED as one standalone DuckDB statement — the
    interop twin of ``Lakehouse.scan_changes`` (same contract: every
    key whose null-safe (event_time, values) tuple differs between the
    two instants, with ``insert``/``update``/``delete`` typing and
    ``<col>_early``/``<col>_late`` pre/post images). Composed from two
    :func:`duckdb_view_sql` legs full-outer-joined on key; a view row
    always carries ``event_time``, so a NULL side marks absence.
    Pinned row-identical to ``scan_changes`` on the deterministic
    acct history (updates, deletes, re-inserts) in
    tests/test_interop.py."""
    t = Table(
        path=table_path, name=os.path.basename(table_path.rstrip("/"))
    )
    snapshot = t.get_snapshot(t.current_version())
    cols = [
        c.name
        for c in snapshot.schema.columns
        if columns is None or c.name in columns
    ]
    early_sql = duckdb_view_sql(table_path, as_of=since, columns=columns)
    late_sql = duckdb_view_sql(table_path, as_of=until, columns=columns)
    diff = " OR ".join(
        ["l.event_time IS DISTINCT FROM e.event_time"]
        + [f"l.{c} IS DISTINCT FROM e.{c}" for c in cols]
    )
    early_cols = "".join(f", e.{c} AS {c}_early" for c in cols)
    late_cols = "".join(f", l.{c} AS {c}_late" for c in cols)
    return f"""
WITH early AS (
{early_sql}
),
late AS (
{late_sql}
)
SELECT COALESCE(l.key, e.key) AS key,
       CASE WHEN e.event_time IS NULL THEN 'insert'
            WHEN l.event_time IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       e.event_time AS event_time_early,
       l.event_time AS event_time_late{early_cols}{late_cols}
FROM late l FULL OUTER JOIN early e ON l.key = e.key
WHERE e.event_time IS NULL OR l.event_time IS NULL OR {diff}
""".strip()
