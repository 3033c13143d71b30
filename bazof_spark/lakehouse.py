"""Lakehouse: point-in-time scan + time-travel SQL over azof-format tables.

Reference: crates/azof/src/lakehouse.rs (scan) and
crates/azof-datafusion/src/{context.rs,lib.rs} (SQL surface). The
reference's scan is a single-threaded, row-at-a-time merge into one
in-memory RecordBatch (lakehouse.rs:40-85) wrapped in a 1-partition
DataFusion node (lib.rs:199-204). Here the same semantics are declared as
DataFrame operations and Catalyst/Tungsten execute them distributed:

1. version + snapshot resolution, temporal file pruning — driver-side
   Python, O(metadata), no Spark jobs (like Delta log file skipping);
2. ONE ``spark.read.parquet(*pruned_files)`` — vectorized reader,
   parallel across files/row-groups, column pruning pushed down from the
   projection, ``event_time <= t`` pushed to row-group stats;
3. file precedence (crates/azof/src/metadata.rs:47-73 — child segments
   shadow parents, newer deltas shadow older, deltas shadow base) is
   attached as a ``_rank`` column mapped from ``input_file_name()``;
4. latest-version-per-key dedup = ``groupBy(key).agg(max_by(values,
   struct(-rank, event_time)))`` — an aggregate with map-side partial
   combine, i.e. ONE shuffle of pre-combined partials. At 100 TB this
   beats a window (``row_number() over (partition by key ...)``), which
   must shuffle + sort EVERY row: here only per-partition winners cross
   the wire. (Engine note: struct-valued max_by buffers aren't
   hash-aggregable, so Spark plans SortAggregate — a per-partition sort
   on key before the partial agg; the shuffle-volume win stands, as
   ``.explain`` shows partial_max_by before the single Exchange.)
   AQE handles skewed keys.

Tie-break note: within one file at equal (key, event_time) the reference
keeps the physically-first row (lakehouse.rs:54-79). This is NOT a
theoretical case — the reference's own financials data ships 5 duplicate
(key, event_time) pairs with different values in year_2019_q2_delta — so
the scan reads ``_metadata.row_index`` (per-file physical position,
costless column from the reader) and breaks ties on it inside the same
``max_by``, reproducing the reference bit-for-bit.

Precedence-struct note: the ``max_by`` ordering used here is
``bazof_spark.ordering.latest_wins_ordering("batch")`` — the native
STREAM reader's ``_rank`` has the opposite convention (snapshot
version, higher = newer); see ``ordering.py`` for both recipes.
"""

from __future__ import annotations

import os
import urllib.parse
from datetime import datetime
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bazof_spark import iofs
from bazof_spark.asof import AsOf, coerce_as_of
from bazof_spark.errors import BazofError, TableNotFoundError
from bazof_spark.metadata import Snapshot
from bazof_spark.projection import Projection, coerce_projection
from bazof_spark.schema import EVENT_TIME_COL, KEY_COL
from bazof_spark.sql import rewrite_and_extract_tables
from bazof_spark.table import Table

# Above this many pruned files, map file→rank via a broadcast join instead
# of a literal CASE/map expression (keeps the plan small for huge tables).
_RANK_MAP_LITERAL_MAX = 512

#: versioned-temp-view provenance: view name → the lakehouse root that
#: registered it. Temp views are Spark-session-global while lakehouses
#: are root-scoped; without this, two Lakehouse instances sharing a
#: table name in one session would silently read each other's pinned
#: `name__<millis>` / `FOR VERSION AS OF` views.
_VERSIONED_VIEW_ROOTS: dict[str, str] = {}


def _normalize_file_uri(path: str) -> str:
    """Normalize a path/URI into the SAME canonical form
    :func:`_normalized_input_file` computes in SQL, so the two sides
    join. Canonical form: local/file → scheme-less path without leading
    slashes (``file:///a/b``, ``file:/a/b``, ``/a/b`` → ``a/b``);
    remote → ``scheme://rest`` with leading slashes collapsed and
    percent-encoding decoded (``s3a://b//k%20x`` → ``s3a://b/k x``).
    Kept line-for-line congruent with the SQL twin — change both
    together (tests/test_uri_rank.py pins the congruence)."""
    import re

    p = urllib.parse.unquote(path)
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:/+", p)
    if m is None:  # plain local path (input_file_name never emits these)
        return os.path.abspath(p).lstrip("/")
    scheme_m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", p)
    scheme = scheme_m.group(1) if scheme_m else ""
    rest = p[m.end():]
    if scheme in ("file", ""):
        return rest
    return f"{scheme}://{rest}"


# strip scheme + collapse leading slashes: file:///a/b → a/b, s3a://b/k → s3a://b/k
def _normalized_input_file(base_sql: str = "input_file_name()") -> F.Column:
    """Normalization as ONE parsed expression (opt round 1: the
    Column-by-Column build cost ~96 py4j round trips per scan; the
    parsed text is the identical analyzed tree in one). ``base_sql`` is
    the SQL text of the input column (a literal spelling via
    :func:`_sql_str` in tests).

    Semantics, kept line-for-line congruent with
    :func:`_normalize_file_uri` (tests/test_uri_rank.py pins it):
    url_decode treats '+' as an encoded space (form semantics); URIs
    percent-encode spaces as %20 and leave literal '+' alone, so '+' is
    protected first — a '+'-named file must not decode to ' '. Then
    file:→scheme-less, scheme-less→leading slashes stripped (the
    driver-side abspath().lstrip('/')), remote→scheme://rest."""
    dec = f"url_decode(regexp_replace({base_sql}, '\\\\+', '%2B'))"
    scheme = f"regexp_extract({dec}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)"
    rest = f"regexp_replace({dec}, '^[A-Za-z][A-Za-z0-9+.-]*:/+', '')"
    return F.expr(
        f"CASE WHEN {scheme} = 'file' THEN {rest} "
        f"WHEN {scheme} = '' THEN regexp_replace({rest}, '^/+', '') "
        f"ELSE concat({scheme}, '://', {rest}) END"
    )


def _sql_str(s: str) -> str:
    """Escape a Python string into a Spark SQL single-quoted literal
    (backslash and quote escaped — default parser semantics, i.e.
    ``spark.sql.parser.escapedStringLiterals=false``)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _uri_variants(path: str) -> set[str]:
    """Every spelling ``input_file_name()`` might emit for this path, so
    the per-row rank attachment is ONE map lookup on the raw value (the
    decode+regex normalization stays only as a lazy fallback)."""
    out = {path}
    if "://" not in path:
        ap = os.path.abspath(path)
        out.update({ap, "file:" + ap, "file://" + ap})
        try:
            import pathlib

            out.add(pathlib.Path(ap).as_uri())  # file:/// percent-encoded
        except ValueError:  # pragma: no cover - non-absolute edge
            pass
    return out


class Lakehouse:
    """A root path containing table directories
    (crates/azof/src/lakehouse.rs:19-27)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # -- metadata -----------------------------------------------------

    def table(self, name: str) -> Table:
        if "://" in self.root:
            path = self.root.rstrip("/") + "/" + name
        else:
            path = os.path.join(self.root, name)
        return Table(path=path, name=name)

    def has_table(self, name: str) -> bool:
        t = self.table(name)
        try:
            t.current_version()
            return True
        except TableNotFoundError:
            return False

    def list_tables(self) -> list[str]:
        if "://" in self.root:
            from pyarrow import fs as pafs

            filesystem, rel = pafs.FileSystem.from_uri(self.root)
            infos = filesystem.get_file_info(
                pafs.FileSelector(rel, allow_not_found=True)
            )
            names = [i.base_name for i in infos if i.type == pafs.FileType.Directory]
        else:
            names = [
                d
                for d in os.listdir(self.root)
                if os.path.isdir(os.path.join(self.root, d))
            ]
        return sorted(n for n in names if self.has_table(n))

    # -- scan (the core operator) ------------------------------------

    def scan(
        self,
        table_name: str,
        as_of: AsOf | datetime | str | None = None,
        columns: Iterable[str] | Projection | None = None,
        version: str | int | None = None,
        keys: Iterable[str] | None = None,
        key_range: tuple[str | None, str | None] | None = None,
    ) -> DataFrame:
        """Point-in-time merge scan → lazy DataFrame
        (reference: crates/azof/src/lakehouse.rs:29-86).

        ``version`` selects a specific snapshot (Delta-style system
        version travel — our extension; the reference only resolves the
        current pointer, crates/azof/src/table.rs:35-41). ``as_of``
        still applies within that snapshot.

        ``keys`` (exact key set) / ``key_range`` ((lo, hi) inclusive,
        None = unbounded side) restrict the scan to those keys — and,
        on snapshots whose files carry zone-map bounds
        (metadata.Delta.key_min/key_max, written at commit time since
        round 5), prune non-overlapping FILES at metadata time, so a
        selective key lookup on a key-clustered table reads O(matching
        files), not O(all in-range files). Merge-safe by construction:
        a pruned file cannot contain any requested key, so per-key
        winners are unchanged. The same row predicate is also applied
        in the scan, pushed to parquet row-group stats.

        Output columns follow the reference's ordering rules: key,
        event_time, then declared value columns, each only if projected
        (crates/azof/src/schema.rs:148-171).
        """
        from bazof_spark.metadata import KeyRange

        as_of = coerce_as_of(as_of)
        projection = coerce_projection(columns)
        table = self.table(table_name)
        # resolve the version FIRST so the object-store scan branch can
        # pin the Data Source read to exactly this snapshot (a second
        # independent current-pointer resolution could straddle a
        # concurrent commit)
        resolved_version = (
            str(version) if version is not None else table.current_version()
        )
        snapshot = table.get_snapshot(resolved_version)
        key_values: list[str] | None = None
        kr: KeyRange | None = None
        if keys is not None and key_range is not None:
            raise ValueError("pass keys= or key_range=, not both")
        if keys is not None:
            key_values = sorted({str(k) for k in keys})
            kr = KeyRange.of_keys(key_values)
        elif key_range is not None:
            kr = KeyRange(lo=key_range[0], hi=key_range[1])
        return self.scan_snapshot(
            table, snapshot, as_of, projection, key_range=kr,
            key_values=key_values, version=resolved_version,
        )

    def scan_changes(
        self,
        table_name: str,
        since: AsOf | datetime | str,
        until: AsOf | datetime | str | None = None,
        columns: Iterable[str] | Projection | None = None,
        keys: Iterable[str] | None = None,
        key_range: tuple[str | None, str | None] | None = None,
    ) -> DataFrame:
        """Change-data-feed between two as-of instants: every key whose
        winning version differs between ``since`` and ``until``
        (``None`` = Current). The reference leaves a change/streaming
        read on its roadmap (README.md:150-160); over an upsert log it
        is a full join of two as-of scans — keys appear (insert),
        change (update), or, on tables using the tombstone DELETE
        extension, disappear (delete; impossible on append-only tables,
        whose feeds are unchanged).

        Output: ``key``, ``change_type`` (``insert`` | ``update`` |
        ``delete``), ``event_time_early``/``event_time_late`` and each
        projected value column as ``<col>_early``/``<col>_late``
        (``delete`` rows carry the early values and a null late side).
        A key counts as changed when its (event_time, values) tuple
        differs null-safely — not event_time alone, since a segment
        becoming in-range can change the winner by file precedence
        (§4.2) without a newer timestamp.

        Scale: both sides are independently pruned scans joined on the
        table key; AQE broadcasts whichever as-of slice is small.
        ``keys``/``key_range`` restrict the feed to those keys with the
        same file-level stats pruning as :meth:`scan` (valid because
        the per-key diff depends only on that key's rows on both
        sides): "what changed for key X" reads O(matching files) per
        side, not two full scans.
        """
        # materialize once: the key iterable feeds BOTH side scans
        if keys is not None:
            keys = list(keys)
        # the diff always needs key + event_time, whatever the caller
        # projects (like the reference's merge itself,
        # crates/azof/src/lakehouse.rs:98-109)
        if isinstance(columns, Projection):
            if not columns.is_all:
                columns = Projection.of(
                    columns.columns | {KEY_COL, EVENT_TIME_COL}
                )
        elif columns is not None:
            cols = list(columns)
            columns = list(
                dict.fromkeys([KEY_COL, EVENT_TIME_COL, *cols])
            )
        early = self.scan(
            table_name, as_of=since, columns=columns,
            keys=keys, key_range=key_range,
        )
        late = self.scan(
            table_name, as_of=until, columns=columns,
            keys=keys, key_range=key_range,
        )
        value_cols = [
            c for c in late.columns if c not in (KEY_COL, EVENT_TIME_COL)
        ]

        def _tagged(df: DataFrame, tag: str) -> DataFrame:
            return df.select(
                KEY_COL,
                F.col(EVENT_TIME_COL).alias(f"{EVENT_TIME_COL}_{tag}"),
                *[F.col(c).alias(f"{c}_{tag}") for c in value_cols],
            )

        # join type follows the table's delete capability: on tables
        # with tombstone deltas a key can DISAPPEAR in the window, which
        # only a FULL join can report — but a full outer join cannot
        # broadcast (SMJ both sides), so append-only tables (every
        # reference-authored table; keys never vanish there) keep the
        # LEFT join and its broadcastable early side, the exact
        # pre-extension plan.
        has_deletes = bool(
            self.table(table_name).get_current_snapshot().tombstone_files()
        )
        j = _tagged(late, "late").join(
            _tagged(early, "early"), KEY_COL, "full" if has_deletes else "left"
        )
        def _version_struct(tag: str) -> F.Column:
            # identical inner field names so the struct types compare
            return F.struct(
                F.col(f"{EVENT_TIME_COL}_{tag}").alias(EVENT_TIME_COL),
                *[F.col(f"{c}_{tag}").alias(c) for c in value_cols],
            )

        early_struct = _version_struct("early")
        late_struct = _version_struct("late")
        is_insert = F.col(f"{EVENT_TIME_COL}_early").isNull()
        is_delete = F.col(f"{EVENT_TIME_COL}_late").isNull()
        return j.filter(
            is_insert | is_delete | ~late_struct.eqNullSafe(early_struct)
        ).select(
            KEY_COL,
            F.when(is_insert, F.lit("insert"))
            .when(is_delete, F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change_type"),
            f"{EVENT_TIME_COL}_early",
            f"{EVENT_TIME_COL}_late",
            *[f"{c}_early" for c in value_cols],
            *[f"{c}_late" for c in value_cols],
        )

    def scan_snapshot(
        self,
        table: Table,
        snapshot: Snapshot,
        as_of: AsOf,
        projection: Projection,
        key_range=None,
        key_values: list[str] | None = None,
        version: str | None = None,
    ) -> DataFrame:
        if iofs.is_uri(table.path) and not table.path.startswith("file://"):
            # object-store root: the JVM may lack the scheme's connector
            # (no S3A jars in this runtime) — route through the Python
            # Data Source, whose executor-side pyarrow readers resolve
            # every byte via iofs (endpoint + emulation aware). Same
            # merge semantics, one task per surviving ranked file.
            return self._scan_snapshot_arrow(
                table, snapshot, as_of, projection,
                key_range=key_range, key_values=key_values,
                version=version,
            )
        ranked = snapshot.ranked_data_files(as_of, key_range)
        out_cols = snapshot.schema.output_columns(projection)
        struct_type = snapshot.schema.to_struct_type(projection)
        if not ranked:
            return self.spark.createDataFrame([], struct_type)

        paths = [table.data_file_path(f) for f, _ in ranked]
        # value columns we must read: projected ones (key/event_time are
        # always read — the merge needs them, as in the reference's
        # ProjectionMask, crates/azof/src/lakehouse.rs:98-109)
        value_cols = [
            c.name
            for c in snapshot.schema.columns
            if projection.contains(c.name)
        ]
        # explicit schema read: (a) skips schema inference/merging over
        # the file listing, (b) null-fills columns added by schema
        # evolution that predate a file (maintenance.evolve_table_schema).
        # _metadata.row_index = physical position within the file — the
        # reference's intra-file tie-break (first row wins among equal
        # (key, event_time) in one file, lakehouse.rs:54-79; its own
        # financials data contains such duplicates).
        # RENAME COLUMN support: files written before a rename store the
        # former name — the read schema carries former fields (nullable,
        # same type) and each value column coalesces declared-then-former
        # spellings (a file stores exactly one, so this is a disjoint
        # union). Never-renamed tables take the identical plan as before
        # (no extra fields, plain column refs — plan pins unaffected).
        formers = {
            c.name: c.formers
            for c in snapshot.schema.columns
            if c.formers and c.name in value_cols
        }
        from bazof_spark.ordering import quote_sql_ident as _q

        # selectExpr: every projection parses in ONE py4j round trip
        # (the per-column F.col/alias build cost ~100 per scan — opt
        # round 1); the parsed trees are the identical analyzed plan
        value_exprs = [
            "coalesce({}) AS {}".format(
                ", ".join(_q(x) for x in (c, *formers[c])), _q(c)
            )
            if c in formers
            else _q(c)
            for c in value_cols
        ]
        read_schema = (
            snapshot.schema.to_read_struct_type()
            if formers
            else snapshot.schema.to_struct_type()
        )
        df = self.spark.read.schema(read_schema).parquet(*paths).selectExpr(
            KEY_COL,
            EVENT_TIME_COL,
            *value_exprs,
            "_metadata.row_index AS _row_idx",
        )

        if not as_of.is_current:
            # row-group stats pruning applies; rows with event_time > t
            # are invisible and do NOT shadow older versions
            # (lakehouse.rs:62-67)
            df = df.filter(F.col(EVENT_TIME_COL) <= F.lit(as_of.event_time_at))

        # key predicate as a row filter too (pushed to parquet row-group
        # stats): file-level zone maps bound WHICH files are read, the
        # row filter bounds which rows survive; filter-on-key commutes
        # with the groupBy(key) merge, so winners are unchanged
        if key_values is not None:
            df = df.filter(F.col(KEY_COL).isin(key_values))
        elif key_range is not None:
            if key_range.lo is not None:
                df = df.filter(F.col(KEY_COL) >= F.lit(key_range.lo))
            if key_range.hi is not None:
                df = df.filter(F.col(KEY_COL) <= F.lit(key_range.hi))

        tombs = snapshot.tombstone_files()
        tomb_ranks = tuple(r for f, r in ranked if f in tombs)
        df = self._dedup_latest_per_key(
            df, table, ranked, value_cols, tomb_ranks
        )
        return df.select(*out_cols) if out_cols else df.select(KEY_COL).drop(KEY_COL)

    def _scan_snapshot_arrow(
        self,
        table: Table,
        snapshot: Snapshot,
        as_of: AsOf,
        projection: Projection,
        key_range=None,
        key_values: list[str] | None = None,
        version: str | None = None,
    ) -> DataFrame:
        """Object-store twin of :meth:`scan_snapshot`: the Spark 4
        Python Data Source plans one task per ranked file, each an
        executor-side pyarrow read through iofs ($BAZOF_S3_ENDPOINT /
        emulation routed), with the as-of bound, pushed key predicates
        and column projection applied IN the reader — then the same
        ``max_by(payload, latest_wins_ordering)`` merge as the JVM
        branch (the source exposes ``_rank``/``_row_idx`` provenance
        and a per-row ``_tombstone`` marker on delete-capable tables).
        Reference parity: the reference runs on any ``object_store``
        backend (crates/azof/src/lakehouse.rs:19-27); this closes the
        ``scan()``/``sql()`` side of that on connector-less JVMs."""
        from bazof_spark.asof import format_rfc3339_ms
        from bazof_spark.datasource import BazofDataSource
        from bazof_spark.ordering import latest_wins_agg

        path = table.path.rstrip("/")
        if not path.endswith("/" + table.name):
            raise BazofError(
                f"cannot derive lakehouse root from table path {path!r}"
            )
        root = path[: -(len(table.name) + 1)]
        out_cols = snapshot.schema.output_columns(projection)
        value_cols = [
            c for c in out_cols if c not in (KEY_COL, EVENT_TIME_COL)
        ]

        self.spark.dataSource.register(BazofDataSource)
        self.spark.conf.set(
            "spark.sql.python.filterPushdown.enabled", "true"
        )
        import json

        reader = (
            self.spark.read.format("bazof")
            .option("path", root)
            .option("table", table.name)
            # projection reaches the Arrow reader (the Python source
            # API has no pruning hook, so it travels as an option)
            .option("columns", ",".join(value_cols))
            # planning runs in a separate Python worker — forward the
            # driver's endpoint/emulation env (datasource._apply_env_option)
            .option("bazofEnv", json.dumps(iofs.env_snapshot()))
            # big files split into byte-range tasks at the same
            # threshold the JVM scan uses
            .option(
                "maxPartitionBytes",
                self.spark.conf.get(
                    "spark.sql.files.maxPartitionBytes", "134217728b"
                ),
            )
        )
        if version is not None:
            reader = reader.option("version", version)
        if not as_of.is_current:
            reader = reader.option(
                "asOf", format_rfc3339_ms(as_of.event_time_at)
            )
        df = reader.load()

        # key predicates as ordinary filters: pushFilters routes them
        # into the reader (row filter + bloom-probed file pruning)
        if key_values is not None:
            df = df.filter(F.col(KEY_COL).isin(key_values))
        elif key_range is not None:
            if key_range.lo is not None:
                df = df.filter(F.col(KEY_COL) >= F.lit(key_range.lo))
            if key_range.hi is not None:
                df = df.filter(F.col(KEY_COL) <= F.lit(key_range.hi))

        has_tomb = "_tombstone" in df.columns
        winner = df.groupBy(KEY_COL).agg(
            latest_wins_agg(
                value_cols, "_tombstone" if has_tomb else None, "batch"
            ).alias("_w")
        )
        if has_tomb:
            merged = (
                winner.filter(~F.col("_w._tombstone"))
                .select(KEY_COL, "_w.*")
                .drop("_tombstone")
            )
        else:
            merged = winner.select(KEY_COL, "_w.*")
        out = (
            merged.select(*out_cols)
            if out_cols
            else merged.select(KEY_COL).drop(KEY_COL)
        )
        # Python DS relations carry no statistics — attach the
        # broadcast decision Spark would have made from file sizes
        # (snapshot-recorded at commit; see broadcast_hint_if_small)
        from bazof_spark.datasource import broadcast_hint_if_small

        return broadcast_hint_if_small(self.spark, table.path, out, version)

    def _dedup_latest_per_key(
        self,
        df: DataFrame,
        table: Table,
        ranked: list[tuple[str, int]],
        value_cols: list[str],
        tomb_ranks: tuple[int, ...] = (),
    ) -> DataFrame:
        """First-eligible-occurrence-in-file-order semantics
        (crates/azof/src/lakehouse.rs:40,54-79 + metadata.rs:47-73),
        encoded as max_by over (−rank, event_time): min rank wins, then
        max event_time — exactly 'latest version ≤ t, file precedence
        beats timestamp'.

        ``tomb_ranks`` marks tombstone deltas (our DELETE extension):
        their rows compete in the merge like any newer version, but a
        winning tombstone row HIDES its key instead of surfacing. The
        flag rides inside the max_by payload, so the filter costs one
        post-aggregate predicate and nothing at all on delete-free
        tables (the common case keeps the exact pre-extension plan)."""
        df = self._with_rank(df, table, ranked)

        from bazof_spark.ordering import latest_wins_agg

        # whole merge aggregate as ONE parsed expression (opt round 1):
        # the Column-by-Column struct/max_by build cost ~250 py4j round
        # trips per scan; latest_wins_agg parses to the identical
        # analyzed tree in a handful
        tomb_sql = (
            "_rank IN (" + ", ".join(str(r) for r in tomb_ranks) + ")"
            if tomb_ranks
            else None
        )
        winner = df.groupBy(KEY_COL).agg(
            latest_wins_agg(value_cols, tomb_sql, "batch").alias("_w")
        )
        if tomb_ranks:
            return (
                winner.filter(~F.col("_w._tombstone"))
                .select(KEY_COL, "_w.*")
                .drop("_tombstone")
            )
        return winner.select(KEY_COL, "_w.*")

    def _with_rank(
        self, df: DataFrame, table: Table, ranked: list[tuple[str, int]]
    ) -> DataFrame:
        if len(ranked) <= 1:
            return df.withColumn("_rank", F.lit(0))
        pairs = {
            _normalize_file_uri(table.data_file_path(f)): r for f, r in ranked
        }
        if len(pairs) <= _RANK_MAP_LITERAL_MAX:
            # fast path: exact-URI map lookup on raw input_file_name();
            # coalesce only evaluates the decode+regex normalization on a
            # miss (an unanticipated URI spelling), so per-row cost is
            # one hash probe, not three regexes
            fast_pairs = {
                v: r
                for f, r in ranked
                for v in _uri_variants(table.data_file_path(f))
            }
            # map literals as ONE parsed expression each (opt round 1):
            # F.lit per key/value cost 2 py4j round trips apiece (~150
            # per scan on an 8-delta table); the parsed map() call is
            # the identical analyzed CreateMap tree in one round trip
            fast_map = F.expr(
                "map("
                + ", ".join(
                    f"{_sql_str(k)}, {r}" for k, r in fast_pairs.items()
                )
                + ")"
            )
            norm_map = F.expr(
                "map("
                + ", ".join(
                    f"{_sql_str(k)}, {r}" for k, r in pairs.items()
                )
                + ")"
            )
            return df.withColumn(
                "_rank",
                F.coalesce(
                    fast_map[F.expr("input_file_name()")],
                    norm_map[_normalized_input_file()],
                ),
            )
        # scale path (thousands of files): broadcast-join a tiny
        # (file, rank) frame — stays JVM-side, no Python UDF. LEFT join +
        # fail-fast on a missed lookup: an unanticipated URI spelling
        # must surface as an error, not silently drop rows (the literal
        # path has a coalesce fallback; this is its moral equivalent).
        rank_df = F.broadcast(
            self.spark.createDataFrame(list(pairs.items()), ["_file", "_rank"])
        )
        return (
            df.withColumn("_file", _normalized_input_file())
            .join(rank_df, on="_file", how="left")
            .withColumn(
                "_rank",
                F.when(
                    F.col("_rank").isNull(),
                    F.raise_error(
                        F.concat(
                            F.lit("bazof: no precedence rank for file URI "),
                            F.col("_file"),
                        )
                    ).cast("long"),
                ).otherwise(F.col("_rank")),
            )
            .drop("_file")
        )

    def history(self, table_name: str) -> list[dict]:
        """Snapshot lineage (Delta DESCRIBE HISTORY analog): one entry
        per numbered snapshot on disk, oldest first — version, whether
        it is current, segment/delta/file counts. Driver-side metadata
        only; no Spark jobs."""
        from bazof_spark.maintenance import _numeric_versions

        table = self.table(table_name)
        current = table.current_version()
        out = []
        for v in _numeric_versions(table.path):
            snap = table.get_snapshot(str(v))
            files = snap.get_data_files()
            out.append(
                {
                    "version": str(v),
                    "is_current": str(v) == current,
                    "n_top_segments": len(snap.segments),
                    "n_files_current": len(files),
                    "n_columns": len(snap.schema.columns),
                }
            )
        return out

    # -- streaming ----------------------------------------------------

    def scan_stream(self, table_name: str, max_files_per_trigger: int = 10):
        """Streaming read of the table's data files (new delta files —
        e.g. from :meth:`upsert` or the streaming sink — are picked up
        as they land). See ``streaming/stream.py``; the reference
        roadmaps this at README.md:158."""
        from bazof_spark.streaming.stream import read_table_stream

        return read_table_stream(
            self.spark, self.table(table_name), max_files_per_trigger
        )

    # -- write --------------------------------------------------------

    def upsert(self, table_name: str, df: DataFrame, **kwargs):
        """Append one batch of upserts to ``table_name`` as a new delta
        + snapshot version (writer the reference roadmaps at
        README.md:152). See :func:`bazof_spark.writer.append_delta` for
        semantics (late data, precedence, distributed multi-file mode).
        """
        from bazof_spark.writer import append_delta

        return append_delta(self.spark, self.table(table_name).path, df, **kwargs)

    def _fresh_current_view(self, table_name: str) -> str:
        """Register a uniquely-named temp view of the table's CURRENT
        scan and return its name. DML row sources must never resolve
        through the bare-name catalog view: programmatic ``upsert()``
        doesn't refresh catalog views, and a same-named view registered
        by another Lakehouse (or an earlier test) would silently shadow
        this table. Caller drops the view when done."""
        import re as _re
        import uuid as _uuid

        safe = _re.sub(r"\W", "_", table_name)
        view = f"__bazof_dml_{safe}_{_uuid.uuid4().hex[:8]}"
        self.scan(table_name).createOrReplaceTempView(view)
        return view

    def update(
        self,
        table_name: str,
        sets: dict,
        where: str = "",
        at: datetime | None = None,
    ) -> bool:
        """UPDATE over merge-by-key: re-read the matching Current rows
        with the ``sets`` SQL expressions applied in the old row's
        context (``{"v": "v + 1"}`` works), upsert them at ``at``
        (default: now, UTC) so the new versions win the merge — every
        earlier as-of still sees the old values (time-travel-consistent,
        like DELETE). The matching set stays a DataFrame end to end.
        Returns True if a new version was published, False for a
        no-match no-op. key/event_time are immutable.

        Isolation: the matched rows come from the snapshot current at
        call time and the commit CAS-publishes against that version —
        a concurrent writer moving the pointer mid-update raises
        CommitConflictError instead of silently publishing the stale
        read-modify-write (no lost update). Re-run update() to retry
        against the fresh state; there is deliberately NO automatic
        retry here, because the SET expressions must be re-evaluated
        over the new winners, not replayed."""
        from datetime import timezone

        from bazof_spark.errors import BazofError

        if not self.has_table(table_name):
            raise BazofError(f"cannot UPDATE missing table {table_name!r}")
        schema = self.table(table_name).get_current_snapshot().schema
        value_cols = list(schema.column_names())
        bad = sorted(set(sets) - set(value_cols))
        if bad:
            raise BazofError(
                f"UPDATE {table_name} SET {', '.join(bad)}: only value "
                f"columns {value_cols} are assignable (key and "
                "event_time are immutable — a new version is stamped "
                "automatically)"
            )
        # CAST every SET expression to the column's declared type: SQL
        # arithmetic widens (Int / 2 → DOUBLE), and committing a delta
        # whose parquet type disagrees with the snapshot schema would
        # break every subsequent explicit-schema scan until RESTORE
        sql_types = {
            c.name: c.data_type.to_spark().simpleString()
            for c in schema.columns
        }
        proj = ", ".join(
            ["key"]
            + [
                f"CAST(({sets[c]}) AS {sql_types[c]}) AS {c}"
                if c in sets
                else c
                for c in value_cols
            ]
        )
        # pin the version BEFORE the matched-read: the scan below
        # resolves its file list from the then-current snapshot, and
        # the commit CAS-checks this pin — a commit slipping in between
        # can only cause a (safe, spurious) conflict, never a missed one
        pinned = self.table(table_name).current_version()
        view = self._fresh_current_view(table_name)
        try:
            q = f"SELECT {proj} FROM {view}"
            if where:
                q += f" WHERE {where}"
            matched = self.sql(q)
            if matched.isEmpty():
                return False
            if at is None:
                at = datetime.now(timezone.utc)
            self.upsert(
                table_name,
                matched.select(
                    "key", F.lit(at).alias(EVENT_TIME_COL), *value_cols
                ),
                start=at,
                end=at,
                create_segment=True,
                expected_version=pinned,
            )
            return True
        finally:
            self.spark.catalog.dropTempView(view)

    def write(
        self,
        df: DataFrame,
        table_name: str,
        mode: str = "append",
        num_files: int | None = None,
        merge_schema: bool = False,
    ) -> None:
        """Write ``df`` as one commit through the distributed Data
        Source sink (`datasource.write_table`): ``overwrite``
        creates/replaces the table at a new snapshot version, ``append``
        upserts a delta batch. The API twin of :meth:`scan` — together
        with :meth:`upsert` (driver-side single-file batches) this is
        the full authoring surface."""
        from bazof_spark.datasource import write_table

        write_table(
            df,
            self.root,
            table_name,
            mode=mode,
            num_files=num_files,
            merge_schema=merge_schema,
        )

    # -- SQL ----------------------------------------------------------

    def sql(self, query: str, dml_at=None) -> DataFrame:
        """Full SQL incl. time-travel syntax, the relational surface
        provided by Spark SQL exactly as DataFusion provides it for the
        reference (crates/azof-datafusion/src/context.rs:11-48).

        Registration is idempotent per versioned name (context.rs:40-42):
        ``name__<millis>`` temp views are (re)created from as-of scans;
        bare names resolve to Current scans when they are azof tables
        (names already registered in the Spark catalog — e.g. TPC-H temp
        views — are left untouched).

        DML (ours — the reference's SQL is read-only): a statement-
        leading ``CREATE [OR REPLACE] TABLE t AS <query>`` or
        ``INSERT INTO t <query>`` runs the inner query through this
        same method (so its sources may time-travel) and commits the
        result through the distributed Data Source writer; the returned
        DataFrame is a 1-row (table, version, operation) status.

        ``dml_at``: optional statement timestamp for DML that stamps
        'now' (MERGE tombstones / BY SOURCE UPDATE rows) — the SQL
        twin of ``Lakehouse.update(at=…)``'s determinism knob for
        replay and oracle fixtures; production statements leave it
        None.
        """
        from bazof_spark.sql import parse_dml, parse_maintenance, parse_show

        show = parse_show(query)
        if show is not None:
            return self._execute_show(show)
        maint = parse_maintenance(query)
        if maint is not None:
            return self._execute_maintenance(maint)
        dml = parse_dml(query)
        if dml is not None:
            return self._execute_dml(dml, at=dml_at)
        rewritten, tables = rewrite_and_extract_tables(query)
        for vt in tables:
            if vt.changes is not None:
                if self._versioned_view_is_stale(vt.versioned_name):
                    since, until = vt.changes
                    self.scan_changes(
                        vt.name, since=since, until=until
                    ).createOrReplaceTempView(vt.versioned_name)
                    _VERSIONED_VIEW_ROOTS[vt.versioned_name] = self.root
            elif vt.versioned_name != vt.name:
                # as-of / versioned view: contents are immutable for a
                # given (ROOT, table, timestamp|version) → safe to
                # cache, but keyed by root: two lakehouses sharing a
                # table name in one Spark session must not read each
                # other's pinned views (the registry remembers which
                # root registered each name)
                if self._versioned_view_is_stale(vt.versioned_name):
                    self.scan(
                        vt.name, vt.as_of, version=vt.version
                    ).createOrReplaceTempView(vt.versioned_name)
                    _VERSIONED_VIEW_ROOTS[vt.versioned_name] = self.root
            else:
                if not self.spark.catalog.tableExists(vt.name) and self.has_table(
                    vt.name
                ):
                    self.scan(vt.name).createOrReplaceTempView(vt.name)
        return self.spark.sql(rewritten)

    def _versioned_view_is_stale(self, name: str) -> bool:
        """True when the pinned temp view ``name`` must be (re)built:
        it doesn't exist, or it was registered by a DIFFERENT lakehouse
        root (temp views are session-global, lakehouses are
        root-scoped). A view of this name the registry has never seen
        is a user's own view and is left untouched, matching the bare-
        name contract."""
        if not self.spark.catalog.tableExists(name):
            return True
        return (
            name in _VERSIONED_VIEW_ROOTS
            and _VERSIONED_VIEW_ROOTS[name] != self.root
        )

    def _execute_show(self, show) -> DataFrame:
        """Catalog statements over the lakehouse root: ``SHOW TABLES``
        lists azof table directories; ``DESCRIBE [TABLE] t`` returns the
        declared schema (system columns included) plus the current
        version; ``SHOW VERSIONS [OF|FOR] t`` lists every numbered
        snapshot on disk with its segment/delta counts."""
        from bazof_spark.maintenance import _numeric_versions

        if show.kind == "tables":
            return self.spark.createDataFrame(
                [(n,) for n in self.list_tables()] or [], "table string"
            )
        table = self.table(show.table)
        if show.kind == "describe":
            snapshot = table.get_current_snapshot()
            rows = [
                ("key", "string", False, "system"),
                ("event_time", "timestamp", False, "system"),
            ] + [
                (c.name, c.data_type.to_spark().simpleString(), c.nullable, "value")
                for c in snapshot.schema.columns
            ]
            return self.spark.createDataFrame(
                rows, "column string, type string, nullable boolean, kind string"
            )
        versions = sorted(_numeric_versions(table.path))
        current = table.current_version()
        rows = []
        for v in versions:
            snap = table.get_snapshot(str(v))
            n_files = len(snap.ranked_data_files())
            rows.append((str(v), str(v) == current, len(snap.segments), n_files))
        return self.spark.createDataFrame(
            rows,
            "version string, is_current boolean, n_segments long, n_files long",
        )

    def _execute_maintenance(self, maint) -> DataFrame:
        """Maintenance statements → the bazof_spark.maintenance
        publishers (all share the writer's commit CAS): ``OPTIMIZE t
        [ZORDER BY (...)]`` / ``CHECKPOINT t`` compact Current into a
        new base at 'now', ``VACUUM t [RETAIN n VERSIONS] [DRY RUN]``
        garbage-collects, ``RESTORE t TO VERSION n`` re-publishes an
        old snapshot as the new head, ``ALTER TABLE t ADD|DROP
        COLUMN(S) ...`` is metadata-only schema evolution
        (evolve_table_schema — added columns must be nullable; old
        files null-fill them). Returns a 1-row
        (table, version, operation, detail) status frame; any Current
        temp view is refreshed so subsequent SQL sees the new version."""
        from datetime import datetime, timezone

        from bazof_spark.maintenance import (
            checkpoint_table,
            optimize_table,
            restore_table,
            vacuum_table,
        )

        if maint.kind == "optimize":
            now = datetime.now(timezone.utc)
            if maint.cluster_by:
                optimize_table(self, maint.table, now, list(maint.cluster_by))
                detail = f"zorder by ({', '.join(maint.cluster_by)})"
            else:
                checkpoint_table(self, maint.table, now)
                detail = "compaction checkpoint"
        elif maint.kind == "checkpoint":
            checkpoint_table(self, maint.table, datetime.now(timezone.utc))
            detail = "compaction checkpoint"
        elif maint.kind == "alter":
            from bazof_spark.maintenance import evolve_table_schema
            from bazof_spark.schema import ColumnDef, ColumnType

            evolve_table_schema(
                self,
                maint.table,
                add=[
                    ColumnDef(name=n, data_type=ColumnType(t), nullable=True)
                    for n, t in maint.add_columns
                ],
                drop=list(maint.drop_columns),
                rename=dict(maint.rename_columns),
                widen={n: t for n, t in maint.widen_columns},
            )
            detail = " ".join(
                filter(
                    None,
                    [
                        "added " + ", ".join(
                            f"{n} {t}" for n, t in maint.add_columns
                        ) if maint.add_columns else "",
                        "dropped " + ", ".join(maint.drop_columns)
                        if maint.drop_columns else "",
                        "renamed " + ", ".join(
                            f"{o} to {n}" for o, n in maint.rename_columns
                        ) if maint.rename_columns else "",
                        "widened " + ", ".join(
                            f"{n} to {t}" for n, t in maint.widen_columns
                        ) if maint.widen_columns else "",
                    ],
                )
            )
        elif maint.kind == "vacuum":
            res = vacuum_table(
                self,
                maint.table,
                **(
                    {"keep_versions": maint.keep_versions}
                    if maint.keep_versions is not None
                    else {}
                ),
                dry_run=maint.dry_run,
            )
            detail = (
                f"removed_files={len(res['removed_files'])} "
                f"removed_snapshots={len(res['removed_snapshots'])} "
                f"removed_dirs={len(res['removed_dirs'])}"
                + (" (dry run)" if maint.dry_run else "")
            )
        else:  # restore
            restore_table(self, maint.table, maint.version)
            detail = f"from version {maint.version}"
        if self.spark.catalog.tableExists(maint.table):
            self.scan(maint.table).createOrReplaceTempView(maint.table)
        version = self.table(maint.table).current_version()
        return self.spark.createDataFrame(
            [(maint.table, version, maint.kind, detail)],
            "table string, version string, operation string, detail string",
        )

    def _execute_dml(self, dml, at=None) -> DataFrame:
        """CTAS / INSERT INTO execution: inner query through ``sql``
        (time travel works in the source), result through the Data
        Source writer's two-phase commit (``datasource.write_table`` —
        repartition-by-key placement, event_time-DESC files, atomic
        version flip). Any Current temp view of the table is refreshed
        so subsequent SQL sees the new version."""
        from bazof_spark.datasource import write_table
        from bazof_spark.errors import BazofError
        from bazof_spark.sql import DmlStatement  # noqa: F401 (typing)

        if dml.kind == "delete":
            if not self.has_table(dml.table):
                raise BazofError(
                    f"cannot DELETE from missing table {dml.table!r}"
                )
            # matching keys stay a DataFrame end to end (writer
            # .delete_keys' distributed path): DELETE WHERE <predicate>
            # at corpus scale never collects the key set
            from bazof_spark.writer import delete_keys

            # pin BEFORE the matched-key read, exactly like update():
            # a commit landing between the predicate scan and the
            # tombstone commit must conflict, not silently delete keys
            # evaluated against the stale snapshot (lost update)
            pinned = self.table(dml.table).current_version()
            view = self._fresh_current_view(dml.table)
            try:
                q = f"SELECT key FROM {view}"
                if dml.select:
                    q += f" WHERE {dml.select}"
                delete_keys(
                    self.spark,
                    self.table(dml.table).path,
                    self.sql(q),
                    create_segment=True,
                    expected_version=pinned,
                )
            finally:
                self.spark.catalog.dropTempView(view)
            if self.spark.catalog.tableExists(dml.table):
                self.scan(dml.table).createOrReplaceTempView(dml.table)
            version = self.table(dml.table).current_version()
            return self.spark.createDataFrame(
                [(dml.table, version, "delete")],
                "table string, version string, operation string",
            )

        if dml.kind == "merge_delete":
            # MERGE ... WHEN MATCHED [AND <pred>] THEN DELETE: tombstone
            # every target key the source matches (pred narrows over the
            # target's CURRENT row). Same read-modify-write discipline
            # as DELETE FROM: pin before the matched read, CAS on commit.
            if not self.has_table(dml.table):
                raise BazofError(
                    f"cannot MERGE into missing table {dml.table!r}"
                )
            from bazof_spark.writer import delete_keys

            pinned = self.table(dml.table).current_version()
            src = self.sql(dml.select.rstrip().rstrip(";"))
            if "key" not in src.columns:
                raise BazofError(
                    "MERGE ... THEN DELETE source must produce a 'key' "
                    f"column, got {src.columns}"
                )
            view = self._fresh_current_view(dml.table)
            try:
                src_view = f"{view}__src"
                src.select("key").createOrReplaceTempView(src_view)
                # semi join: output carries ONLY target columns, so the
                # predicate's unqualified references resolve against the
                # target's current row (and no source-duplicate fanout)
                q = (
                    f"SELECT key FROM (SELECT * FROM {view} t LEFT SEMI "
                    f"JOIN {src_view} s ON t.key = s.key)"
                )
                if dml.pred:
                    q += f" WHERE {dml.pred}"
                delete_keys(
                    self.spark,
                    self.table(dml.table).path,
                    self.spark.sql(q),
                    create_segment=True,
                    expected_version=pinned,
                )
            finally:
                self.spark.catalog.dropTempView(view)
                self.spark.catalog.dropTempView(src_view)
            if self.spark.catalog.tableExists(dml.table):
                self.scan(dml.table).createOrReplaceTempView(dml.table)
            version = self.table(dml.table).current_version()
            return self.spark.createDataFrame(
                [(dml.table, version, "merge_delete")],
                "table string, version string, operation string",
            )

        if dml.kind == "merge_insert":
            # MERGE ... WHEN NOT MATCHED THEN INSERT *: append ONLY the
            # source rows whose keys are absent from Current — a plain
            # append would upsert (shadow) existing keys. Read-modify-
            # write like merge-delete: pin, anti-join, CAS on commit.
            if not self.has_table(dml.table):
                raise BazofError(
                    f"cannot MERGE into missing table {dml.table!r}"
                )
            from bazof_spark.writer import append_delta

            pinned = self.table(dml.table).current_version()
            src = self.sql(dml.select.rstrip().rstrip(";"))
            schema = self.table(dml.table).get_current_snapshot().schema
            expected = ["key", "event_time", *schema.column_names()]
            if set(src.columns) != set(expected) and len(src.columns) == len(
                expected
            ):
                src = src.toDF(*expected)  # positional, like INSERT
            # (declared-type casting — DECIMAL literals etc. — happens
            # inside append_delta for every writer path)
            view = self._fresh_current_view(dml.table)
            try:
                src_view = f"{view}__src"
                src.createOrReplaceTempView(src_view)
                fresh = self.spark.sql(
                    f"SELECT s.* FROM {src_view} s LEFT ANTI JOIN {view} t "
                    "ON s.key = t.key"
                )
                if not fresh.isEmpty():
                    append_delta(
                        self.spark,
                        self.table(dml.table).path,
                        fresh,
                        create_segment=True,
                        expected_version=pinned,
                    )
            finally:
                self.spark.catalog.dropTempView(view)
                self.spark.catalog.dropTempView(src_view)
            if self.spark.catalog.tableExists(dml.table):
                self.scan(dml.table).createOrReplaceTempView(dml.table)
            version = self.table(dml.table).current_version()
            return self.spark.createDataFrame(
                [(dml.table, version, "merge_insert")],
                "table string, version string, operation string",
            )

        if dml.kind == "merge_multi":
            # combined clause list — first matching WHEN MATCHED clause
            # wins per key (Delta/ANSI semantics; predicates evaluate
            # over the TARGET's current row like the single-delete
            # form), WHEN NOT MATCHED THEN INSERT * takes the source
            # rows whose keys are absent from Current. Compiles to ONE
            # atomic commit: writer.merge_apply publishes the upsert
            # delta and the tombstone delta in the same snapshot, so a
            # reader sees all of the MERGE or none of it.
            if not self.has_table(dml.table):
                raise BazofError(
                    f"cannot MERGE into missing table {dml.table!r}"
                )
            from datetime import datetime, timezone

            from bazof_spark.writer import merge_apply

            # one statement timestamp: tombstones AND unmatched-by-
            # source UPDATE rows are stamped with it, so the whole
            # statement shares a single commit instant
            statement_at = (
                at.astimezone(timezone.utc)
                if at is not None
                else datetime.now(timezone.utc)
            )
            pinned = self.table(dml.table).current_version()
            src = self.sql(dml.select.rstrip().rstrip(";"))
            if "key" not in src.columns:
                raise BazofError(
                    "MERGE source must produce a 'key' column, got "
                    f"{src.columns}"
                )
            needs_rows = dml.insert_unmatched or any(
                cl[0] in ("update", "update_set") for cl in dml.clauses
            )
            has_clauses = bool(dml.clauses)
            schema = self.table(dml.table).get_current_snapshot().schema
            if needs_rows:
                expected = ["key", "event_time", *schema.column_names()]
                if set(src.columns) != set(expected) and len(
                    src.columns
                ) == len(expected):
                    src = src.toDF(*expected)  # positional, like INSERT
            view = self._fresh_current_view(dml.table)
            src_view = f"{view}__src"
            try:
                src.createOrReplaceTempView(src_view)
                # per matched key: verdict = first clause whose pred
                # holds on the target's CURRENT row (NULL pred result =
                # clause does not apply — coalesce keeps three-valued
                # logic from leaking a row past an earlier clause)
                verdicts = None
                if has_clauses:
                    arms = " ".join(
                        f"WHEN coalesce({cl[1]}, false) THEN '{cl[0]}{i}'"
                        if cl[1]
                        else f"WHEN true THEN '{cl[0]}{i}'"
                        for i, cl in enumerate(dml.clauses)
                    )
                    verdicts = self.spark.sql(
                        f"SELECT t.key, CASE {arms} END AS _verdict "
                        f"FROM {view} t LEFT SEMI JOIN {src_view} s "
                        "ON t.key = s.key"
                    )
                delete_df = None
                upsert_parts = []
                del_tags = [
                    f"'delete{i}'"
                    for i, cl in enumerate(dml.clauses)
                    if cl[0] == "delete"
                ]
                upd_tags = [
                    f"'update{i}'"
                    for i, cl in enumerate(dml.clauses)
                    if cl[0] == "update"
                ]
                if verdicts is not None:
                    verdicts.createOrReplaceTempView(f"{src_view}__v")
                if del_tags:
                    delete_df = self.spark.sql(
                        f"SELECT key FROM {src_view}__v "
                        f"WHERE _verdict IN ({', '.join(del_tags)})"
                    )
                if dml.by_source:
                    # Delta's WHEN NOT MATCHED BY SOURCE clauses:
                    # target keys NO source row matches (anti join) —
                    # disjoint from every matched set AND from inserts
                    # (⊆ source keys), so the single-commit contract
                    # holds. First matching clause wins per key (same
                    # CASE verdict shape as the matched list);
                    # predicates and UPDATE SET expressions see the
                    # target's current row only — there is no source
                    # row, hence no `src` struct. DELETE verdicts join
                    # the tombstone set (stamped at statement time);
                    # UPDATE SET verdicts re-commit the target row with
                    # the expressions applied AT the statement time —
                    # like the UPDATE statement, an unmatched-by-source
                    # update always wins merge precedence (contrast the
                    # matched update_set clause, which commits at the
                    # source row's event_time).
                    anti_v = f"{src_view}__anti"
                    self.spark.sql(
                        f"SELECT t.* FROM {view} t LEFT ANTI JOIN "
                        f"{src_view} s ON t.key = s.key"
                    ).createOrReplaceTempView(anti_v)
                    bs_arms = " ".join(
                        f"WHEN coalesce({cl[1]}, false) THEN 'bs{cl[0]}{i}'"
                        if cl[1]
                        else f"WHEN true THEN 'bs{cl[0]}{i}'"
                        for i, cl in enumerate(dml.by_source)
                    )
                    self.spark.sql(
                        f"SELECT key, CASE {bs_arms} END AS _verdict "
                        f"FROM {anti_v}"
                    ).createOrReplaceTempView(f"{anti_v}__v")
                    bs_del_tags = [
                        f"'bsdelete{i}'"
                        for i, cl in enumerate(dml.by_source)
                        if cl[0] == "delete"
                    ]
                    if bs_del_tags:
                        bysrc_df = self.spark.sql(
                            f"SELECT key FROM {anti_v}__v WHERE "
                            f"_verdict IN ({', '.join(bs_del_tags)})"
                        )
                        delete_df = (
                            bysrc_df
                            if delete_df is None
                            else delete_df.unionByName(bysrc_df)
                        )
                    at_lit = statement_at.strftime(
                        "%Y-%m-%d %H:%M:%S.%f"
                    )
                    for i, cl in enumerate(dml.by_source):
                        if cl[0] != "update_set":
                            continue
                        sets = dict(cl[2])
                        unknown = sorted(
                            set(sets) - {c.name for c in schema.columns}
                        )
                        if unknown:
                            raise BazofError(
                                f"MERGE UPDATE SET references unknown "
                                f"column(s) {unknown}; declared: "
                                f"{[c.name for c in schema.columns]}"
                            )
                        cols_sql = ", ".join(
                            f"({sets[c.name]}) AS {c.name}"
                            if c.name in sets
                            else f"t.{c.name} AS {c.name}"
                            for c in schema.columns
                        )
                        upsert_parts.append(
                            self.spark.sql(
                                f"SELECT t.key AS key, "
                                f"timestamp'{at_lit}' AS event_time, "
                                f"{cols_sql} FROM {anti_v} t "
                                f"JOIN {anti_v}__v v ON v.key = t.key "
                                f"WHERE v._verdict = 'bsupdate_set{i}'"
                            )
                        )
                if upd_tags:
                    # UPDATE SET * = the full SOURCE row upserts the key
                    upsert_parts.append(
                        self.spark.sql(
                            f"SELECT s.* FROM {src_view} s JOIN "
                            f"{src_view}__v v ON s.key = v.key "
                            f"WHERE v._verdict IN ({', '.join(upd_tags)})"
                        )
                    )
                for i, cl in enumerate(dml.clauses):
                    if cl[0] != "update_set":
                        continue
                    # per-column SET: the TARGET's current row with the
                    # assignment expressions applied. Unqualified names
                    # resolve to the target (like UPDATE t SET …); the
                    # matched SOURCE row rides along as ONE struct
                    # column named `src`, so expressions can read
                    # src.<col> without making bare value-column
                    # references ambiguous. Committed at the matched
                    # SOURCE row's event_time — deterministic (no
                    # wall-clock), and event-versioned like every azof
                    # merge: a STALE source (src.event_time earlier
                    # than the target row's current event_time) loses
                    # merge precedence, so the UPDATE is a no-op for
                    # that key. That asymmetry with DELETE clauses
                    # (tombstones are stamped at the statement time and
                    # always win) is the format's contract, not a bug;
                    # README §MERGE documents it.
                    sets = dict(cl[2])
                    unknown = sorted(
                        set(sets) - {c.name for c in schema.columns}
                    )
                    if unknown:
                        raise BazofError(
                            f"MERGE UPDATE SET references unknown "
                            f"column(s) {unknown}; declared: "
                            f"{[c.name for c in schema.columns]}"
                        )
                    cols_sql = ", ".join(
                        f"({sets[c.name]}) AS {c.name}"
                        if c.name in sets
                        else f"t.{c.name} AS {c.name}"
                        for c in schema.columns
                    )
                    upsert_parts.append(
                        self.spark.sql(
                            f"SELECT t.key AS key, src.event_time AS "
                            f"event_time, {cols_sql} "
                            f"FROM {view} t "
                            f"JOIN (SELECT s.key AS _src_key, "
                            f"struct(s.*) AS src FROM {src_view} s) "
                            f"ON t.key = _src_key "
                            f"JOIN {src_view}__v v ON v.key = t.key "
                            f"WHERE v._verdict = 'update_set{i}'"
                        )
                    )
                if dml.insert_unmatched:
                    upsert_parts.append(
                        self.spark.sql(
                            f"SELECT s.* FROM {src_view} s LEFT ANTI "
                            f"JOIN {view} t ON s.key = t.key"
                        )
                    )
                upsert_df = None
                for p in upsert_parts:
                    upsert_df = p if upsert_df is None else (
                        upsert_df.unionByName(p)
                    )
                merge_apply(
                    self.spark,
                    self.table(dml.table).path,
                    upsert_df=upsert_df,
                    delete_keys_df=delete_df,
                    at=statement_at,
                    create_segment=True,
                    expected_version=pinned,
                )
            finally:
                self.spark.catalog.dropTempView(view)
                self.spark.catalog.dropTempView(src_view)
                self.spark.catalog.dropTempView(f"{src_view}__v")
                self.spark.catalog.dropTempView(f"{src_view}__anti")
                self.spark.catalog.dropTempView(f"{src_view}__anti__v")
            if self.spark.catalog.tableExists(dml.table):
                self.scan(dml.table).createOrReplaceTempView(dml.table)
            version = self.table(dml.table).current_version()
            return self.spark.createDataFrame(
                [(dml.table, version, "merge_multi")],
                "table string, version string, operation string",
            )

        if dml.kind == "update":
            self.update(dml.table, dict(dml.sets), where=dml.select)
            if self.spark.catalog.tableExists(dml.table):
                self.scan(dml.table).createOrReplaceTempView(dml.table)
            version = self.table(dml.table).current_version()
            return self.spark.createDataFrame(
                [(dml.table, version, "update")],
                "table string, version string, operation string",
            )

        df = self.sql(dml.select.rstrip().rstrip(";"))
        if dml.kind == "ctas":
            if self.has_table(dml.table) and not dml.replace:
                raise BazofError(
                    f"table {dml.table!r} already exists "
                    "(use CREATE OR REPLACE TABLE)"
                )
            write_table(df, self.root, dml.table, mode="overwrite")
            op = "create"
        else:
            # insert and merge share the append path: in this format an
            # appended delta IS a merge-by-key — the new version shadows
            # the older one per key at read time (lakehouse.rs:40-79),
            # which is exactly WHEN MATCHED UPDATE / NOT MATCHED INSERT
            if not self.has_table(dml.table):
                raise BazofError(
                    f"cannot {dml.kind.upper()} into missing table "
                    f"{dml.table!r}"
                )
            # SQL INSERT is positional: when the select's column names
            # are not the table's (e.g. bare literals), align by
            # position against (key, event_time, value columns…); a
            # name-matching set is left alone (writer binds by name)
            schema = self.table(dml.table).get_current_snapshot().schema
            expected = ["key", "event_time", *schema.column_names()]
            if set(df.columns) != set(expected) and len(df.columns) == len(
                expected
            ):
                df = df.toDF(*expected)
            write_table(df, self.root, dml.table, mode="append")
            op = dml.kind
        if self.spark.catalog.tableExists(dml.table):
            self.scan(dml.table).createOrReplaceTempView(dml.table)
        version = self.table(dml.table).current_version()
        return self.spark.createDataFrame(
            [(dml.table, version, op)], "table string, version string, operation string"
        )
