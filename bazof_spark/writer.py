"""Writers: CSV→parquet generation and table/snapshot authoring.

The reference ships only test tooling for writes — ``azof-cli gen``
converts a headerless CSV next to the table into one parquet file
(crates/azof-cli/src/main.rs:61-99, crates/azof-cli/src/test_bench.rs:14-51)
— and roadmaps a real writer (README.md:152). This module provides both:

- :func:`csv_to_dataframe` / :func:`dataframe_to_parquet_file` — the gen
  path, preserving the physical-layout invariant the merge relies on:
  files sorted by ``event_time`` DESC, unique (key, event_time) per file
  (crates/azof-cli/src/test_bench.rs:103-121; SURVEY §1.3);
- :class:`TableWriter` — authors ``version.txt`` + ``s{N}.json`` +
  base/delta parquet files, i.e. the writer the reference lacks
  (snapshot JSON format per docs/architecture.md:127-139 and
  test-data/*/s1.json).

Single data files are written driver-side via Arrow (these are batch
-sized artifacts: one base or delta). Nothing here sits on the 100 TB
read path — large tables are built by appending many delta files, each
written from one batch.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import uuid
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bazof_spark.asof import format_rfc3339_ms
from bazof_spark import iofs
from bazof_spark.errors import BazofError
from bazof_spark.metadata import Delta, Segment, Snapshot
from bazof_spark.schema import EVENT_TIME_COL, KEY_COL, TableSchema
from bazof_spark.table import VERSION_FILE, Table


def csv_to_dataframe(
    spark: SparkSession, csv_path: str, schema: TableSchema
) -> DataFrame:
    """Headerless CSV ``key,event_time,values...`` per the declared schema
    (crates/azof-cli/src/test_bench.rs:14-51)."""
    struct = schema.to_struct_type()
    return (
        spark.read.schema(struct)
        .option("header", "false")
        .option("timestampFormat", "yyyy-MM-dd[['T']HH:mm:ss[.SSS]['Z']]")
        .csv(csv_path)
    )


def dataframe_to_parquet_file(
    df: DataFrame,
    dest_path: str,
    timestamp_unit: str = "us",
    order_by: list | None = None,
    row_group_rows: int | None = None,
) -> None:
    """Write ONE parquet file (not a Spark directory), sorted by
    ``event_time`` DESC — the layout invariant
    (crates/azof-cli/src/test_bench.rs:103-121). Gen tooling: batch-sized
    data, driver-side Arrow write.

    ``timestamp_unit``: the reference's Arrow schema is ms
    (crates/azof/src/schema.rs:188-197); we default to µs — Spark's
    native TimestampType resolution — so no precision is lost writing
    Spark data. Pass "ms" for byte-level reference compatibility.

    ``order_by`` overrides the sort (Z-order clustering writes bases
    sorted by Morton code instead — sound for unique-key bases, where
    merge winner selection is order-independent); ``row_group_rows``
    bounds row-group size so min/max skipping has granularity."""
    order = order_by if order_by is not None else [F.col(EVENT_TIME_COL).desc()]
    tbl = df.orderBy(*order).toArrow()
    fields = []
    for f in tbl.schema:
        if pa.types.is_timestamp(f.type):
            fields.append(
                pa.field(f.name, pa.timestamp(timestamp_unit, tz="UTC"), f.nullable)
            )
        else:
            fields.append(f)
    tbl = tbl.cast(pa.schema(fields))
    # resolve through iofs so URI handling (incl. scheme emulation) is
    # identical for data bytes and metadata bytes
    dest_fs, dest_rel = iofs.split(dest_path)
    # page indexes (OffsetIndex/ColumnIndex) give the JVM vectorized
    # reader PAGE-granular skipping on pushed predicates (event_time
    # bounds, key ranges) — parquet-mr column-index filtering is on by
    # default in Spark; bytes cost is a few hundred per column chunk.
    # Split-block blooms over the key column ride along (operators/
    # parquetbloom): parquet-mr probes them natively for pushed key
    # equalities, the Python Data Source through might_contain.
    from bazof_spark.operators.parquetbloom import write_table_with_blooms

    if row_group_rows:
        write_table_with_blooms(
            tbl, dest_rel, dest_fs,
            row_group_size=row_group_rows, write_page_index=True,
        )
    else:
        write_table_with_blooms(
            tbl, dest_rel, dest_fs, write_page_index=True
        )


def _column_footer_bounds(md, name: str):
    """(min, max) for one column across all row groups of a parquet
    footer, or (None, None) when any group lacks usable stats."""
    idx = None
    for i in range(md.num_columns):
        if md.schema.column(i).name == name:
            idx = i
            break
    if idx is None or md.num_row_groups == 0:
        return None, None
    lo = hi = None
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(idx).statistics
        if st is None or not st.has_min_max:
            return None, None
        gmin, gmax = st.min, st.max
        if isinstance(gmin, bytes):
            gmin = gmin.decode("utf-8")
        if isinstance(gmax, bytes):
            gmax = gmax.decode("utf-8")
        lo = gmin if lo is None else min(lo, gmin)
        hi = gmax if hi is None else max(hi, gmax)
    return lo, hi


def file_zone_stats(table_path: str, file_name: str) -> dict:
    """Zone-map bounds for one committed parquet file, read from its
    footer — one driver-side metadata fetch per file at COMMIT time
    (O(files in this commit), never per-read). Returns a dict with any
    of ``key_min``/``key_max`` (strings) and ``ts_min``/``ts_max``
    (tz-aware datetimes for the event_time column; naive footer values
    are interpreted as UTC instants, the same convention the readers
    use). Parquet footer min/max are valid bounds even when the writer
    truncated long values (parquet-cpp truncates mins downward and
    increments truncated maxes), which is all pruning needs. Missing
    entries disable pruning for that dimension, never correctness
    (metadata.KeyRange.admits / the ts_min guard)."""
    from datetime import timezone

    out: dict = {}
    try:
        fs, rel = iofs.split(iofs.join(table_path, file_name))
        md = pq.ParquetFile(rel, filesystem=fs).metadata
    except Exception:
        # stats are best-effort: an unreadable footer must never fail
        # a commit
        return out
    try:
        # file length (bytes): recording it at commit time lets scan
        # planning split large files into byte ranges without a
        # stat/HEAD per file per read
        size = fs.get_file_info(rel).size
        if isinstance(size, int) and size > 0:
            out["size"] = size
    except Exception:
        pass
    try:
        kmin, kmax = _column_footer_bounds(md, KEY_COL)
        if isinstance(kmin, str) and isinstance(kmax, str):
            out["key_min"], out["key_max"] = kmin, kmax
    except Exception:
        pass
    try:
        tmin, tmax = _column_footer_bounds(md, EVENT_TIME_COL)
        if isinstance(tmin, datetime) and isinstance(tmax, datetime):
            if tmin.tzinfo is None:
                tmin = tmin.replace(tzinfo=timezone.utc)
            if tmax.tzinfo is None:
                tmax = tmax.replace(tzinfo=timezone.utc)
            out["ts_min"], out["ts_max"] = tmin, tmax
    except Exception:
        pass
    return out


def file_key_stats(table_path: str, file_name: str) -> tuple[str | None, str | None]:
    """Key bounds only — see :func:`file_zone_stats`."""
    stats = file_zone_stats(table_path, file_name)
    return stats.get("key_min"), stats.get("key_max")


def file_key_bloom(table_path: str, file_name: str):
    """Bloom filter over one committed file's key column, or None.

    Complements the footer min/max: ranges prune key-CLUSTERED
    layouts, the bloom prunes POINT lookups on scattered layouts
    (time-partitioned ingest where every file's [key_min, key_max]
    spans the whole key space). Built at COMMIT time from a
    single-column read of the just-written file — the driver-side
    equivalent of building the filter executor-side during the write
    (where a real deployment computes it; parquet's own bloom filters
    are written the same way). Returns None — disabling bloom pruning
    for this file, never failing the commit — when the column is
    unreadable or its cardinality exceeds the inline size budget
    (metadata.KeyBloom.MAX_KEYS)."""
    from bazof_spark.metadata import KeyBloom

    try:
        fs, rel = iofs.split(iofs.join(table_path, file_name))
        pf = pq.ParquetFile(rel, filesystem=fs)
        if KEY_COL not in pf.schema_arrow.names:
            return None
        # bail on the FOOTER row count before touching the column: a
        # file that large (compacted base) can't fit the inline budget
        # anyway, and the driver must never pay an unbounded column
        # read at commit time
        if pf.metadata.num_rows > 40 * KeyBloom.MAX_KEYS:
            return None
        keys: set[str] = set()
        for batch in pf.iter_batches(columns=[KEY_COL]):
            keys.update(batch.column(0).to_pylist())
            if len(keys) > KeyBloom.MAX_KEYS:
                return None
        return KeyBloom.build(k for k in keys if k is not None)
    except Exception:
        return None


def validate_data_file_invariants(df: DataFrame) -> None:
    """Check unique (key, event_time) pairs — the invariant that makes
    the as-of dedup well-defined (SURVEY §7.4)."""
    dupes = (
        df.groupBy(KEY_COL, EVENT_TIME_COL).count().filter(F.col("count") > 1).count()
    )
    if dupes:
        raise BazofError(f"{dupes} duplicate (key, event_time) pairs in data file")


def _ts(dt: datetime) -> str:
    return format_rfc3339_ms(dt)


def _delta_with_stats(
    table_path: str,
    file_name: str,
    start: datetime,
    end: datetime,
    tombstone: bool = False,
) -> Delta:
    """Delta entry carrying the file's zone-map stats when readable."""
    return Delta(
        file=file_name,
        start=start,
        end=end,
        key_bloom=file_key_bloom(table_path, file_name),
        tombstone=tombstone,
        **file_zone_stats(table_path, file_name),
    )


def _stats_json(table_path: str, file_name: str) -> dict:
    """Optional zone-map JSON fields (``key_min``/``key_max``/
    ``ts_min``/``ts_max``/``key_bloom``) for a node referencing
    ``file_name`` (empty when stats are unavailable)."""
    stats = file_zone_stats(table_path, file_name)
    out: dict = {}
    for k in ("key_min", "key_max", "size"):
        if k in stats:
            out[k] = stats[k]
    for k in ("ts_min", "ts_max"):
        if k in stats:
            out[k] = _ts(stats[k])
    bloom = file_key_bloom(table_path, file_name)
    if bloom is not None:
        out["key_bloom"] = bloom.to_json()
    return out


def _aware_utc(dt: datetime) -> datetime:
    """Normalize to tz-aware UTC with the SAME naive-value semantics as
    :func:`format_rfc3339_ms` (astimezone interprets naive as
    machine-local) — snapshots built in memory must compare and sort
    exactly like their on-disk serialization will re-parse."""
    from datetime import timezone

    return dt.astimezone(timezone.utc)


def _local_table_path(table_path: str) -> str:
    """Local filesystem path for the JVM-side distributed write branch
    (Spark part-file listing + os.replace renames). ``file://`` URIs
    strip to their path; object-store URIs take the executor-side
    pyarrow branch (:func:`_write_distributed_delta_uri`) instead."""
    if table_path.startswith("file://"):
        return table_path[len("file://"):]
    if "://" in table_path:
        raise BazofError(
            "internal: _local_table_path called with an object-store "
            f"URI {table_path!r} — route through "
            "_write_distributed_delta_uri"
        )
    return table_path


def _write_distributed_delta_uri(
    ordered: DataFrame,
    table_path: str,
    stem: str,
    num_files: int | None,
) -> list[str]:
    """Distributed multi-file delta on an OBJECT-STORE root: each
    partition writes its own parquet file under a stage prefix via an
    executor-side pyarrow write through iofs (the same seam the Data
    Source writer proves, datasource.py:459-505 — data bytes never
    pass through the driver), then the driver finalizes the bounded
    file list with iofs moves (copy+delete on stores without rename)
    under deterministic ``{stem}_p{i:05d}.parquet`` names. The collect
    is one tiny row per non-empty partition — O(files), not O(rows)."""
    import uuid

    stage = iofs.join(table_path, f"_{stem}_stage-{uuid.uuid4().hex[:12]}")
    iofs.makedirs(stage)
    env = iofs.env_snapshot()

    def _write_partition(batches):
        import os as _os

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        from bazof_spark import iofs as _iofs

        _iofs.apply_env(env)

        got = [b for b in batches if b.num_rows]
        if not got:
            return
        t = _pa.Table.from_batches(got)
        fields = [
            _pa.field(f.name, _pa.timestamp("us", tz="UTC"), f.nullable)
            if _pa.types.is_timestamp(f.type)
            else f
            for f in t.schema
        ]
        t = t.cast(_pa.schema(fields)).sort_by(
            [(EVENT_TIME_COL, "descending")]
        )
        dest = _iofs.join(stage, f"part-{uuid.uuid4().hex}.parquet")
        fs, rel = _iofs.split(dest)
        # same page-index + key-bloom rationale as
        # dataframe_to_parquet_file
        from bazof_spark.operators.parquetbloom import (
            write_table_with_blooms as _wtb,
        )

        _wtb(t, rel, fs, write_page_index=True)
        yield _pa.RecordBatch.from_pydict(
            {"staged": [dest], "rows": [t.num_rows]}
        )

    part = (
        ordered.repartition(num_files, KEY_COL)
        if num_files
        else ordered.repartition(KEY_COL)
    )
    staged = sorted(
        r["staged"]
        for r in part.mapInArrow(
            _write_partition, "staged string, rows long"
        ).collect()
    )
    names = []
    try:
        for i, src in enumerate(staged):
            name = f"{stem}_p{i:05d}.parquet"
            iofs.move(src, iofs.join(table_path, name))
            names.append(name)
    except BaseException:
        for name in names:  # roll staged-but-unreferenced files back
            try:
                iofs.delete(iofs.join(table_path, name))
            except Exception:
                pass
        raise
    finally:
        try:
            iofs.delete_dir(stage)
        except Exception:
            pass
    return names


def _write_distributed_delta(
    ordered: DataFrame,
    table_path: str,
    stem: str,
    num_files: int | None,
) -> list[str]:
    """ONE Spark job writing the batch as many part files, each renamed
    to ``{stem}_p{i:05d}.parquet`` under the table dir. Rows are
    repartitioned by key (a key lives in exactly one file) and sorted
    event_time DESC within files. Returns the final file names.

    Local/file:// roots use the JVM parquet writer + os.replace; any
    other URI (s3:// through ``$BAZOF_S3_ENDPOINT`` or emulation,
    gs://, abfs://) takes the executor-side pyarrow branch — the same
    one-job distribution, finalized with iofs moves."""
    import shutil

    if "://" in table_path and not table_path.startswith("file://"):
        return _write_distributed_delta_uri(
            ordered, table_path, stem, num_files
        )
    local = _local_table_path(table_path)
    part = (
        ordered.repartition(num_files, KEY_COL)
        if num_files
        else ordered.repartition(KEY_COL)
    ).sortWithinPartitions(F.col(EVENT_TIME_COL).desc())
    out_dir = os.path.join(local, f"_{stem}_job")
    part.write.mode("overwrite").parquet(out_dir)
    part_files = sorted(
        f
        for f in os.listdir(out_dir)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    names = []
    for i, pf in enumerate(part_files):
        name = f"{stem}_p{i:05d}.parquet"
        os.replace(os.path.join(out_dir, pf), os.path.join(local, name))
        names.append(name)
    shutil.rmtree(out_dir)
    return names


class SegmentBuilder:
    """Builds one segment subtree (JSON shape per test-data/*/s1.json)."""

    def __init__(self, writer: "TableWriter", node: dict):
        self._writer = writer
        self._node = node

    def add_delta(
        self,
        df: DataFrame,
        start: datetime,
        end: datetime,
        name: str | None = None,
        validate: bool = True,
    ) -> "SegmentBuilder":
        deltas = self._node.setdefault("delta", [])
        file_name = name or f"{self._node['id']}_delta{len(deltas) + 1}.parquet"
        self._writer._write_file(df, file_name, validate)
        deltas.append(
            {
                "file": file_name,
                "start": _ts(start),
                "end": _ts(end),
                **_stats_json(self._writer.path, file_name),
            }
        )
        return self

    def add_delta_distributed(
        self,
        df: DataFrame,
        start: datetime,
        end: datetime,
        num_files: int | None = None,
        validate: bool = True,
    ) -> "SegmentBuilder":
        """Write ONE logical delta as MANY parquet files in a single
        distributed Spark job — the 100-TB write path (the single-file
        ``add_delta`` materializes through the driver).

        Each output file becomes its own delta entry with the same
        ``[start, end]`` range. Correctness: rows are repartitioned by
        ``key``, so a key lives in exactly one file and the merge's
        file-precedence order among the sibling entries (stable sort on
        equal ``start``) can never arbitrate between two versions of the
        same key. Files keep the event_time-DESC order invariant via
        ``sortWithinPartitions``."""
        if validate:
            validate_data_file_invariants(df)
        ordered = df.select(
            KEY_COL, EVENT_TIME_COL, *self._writer.schema.column_names()
        )
        deltas = self._node.setdefault("delta", [])
        stem = f"{self._node['id']}_delta{len(deltas) + 1}"
        for file_name in _write_distributed_delta(
            ordered, self._writer.path, stem, num_files
        ):
            deltas.append(
                {
                    "file": file_name,
                    "start": _ts(start),
                    "end": _ts(end),
                    **_stats_json(self._writer.path, file_name),
                }
            )
        return self

    def add_child(
        self,
        segment_id: str,
        start: datetime,
        end: datetime | None = None,
        base_df: DataFrame | None = None,
        validate: bool = True,
    ) -> "SegmentBuilder":
        node: dict = {"id": segment_id, "start": _ts(start)}
        if end is not None:
            node["end"] = _ts(end)
        if base_df is not None:
            file_name = f"{segment_id}_base.parquet"
            self._writer._write_file(base_df, file_name, validate)
            node["file"] = file_name
            node.update(_stats_json(self._writer.path, file_name))
        self._node.setdefault("segments", []).append(node)
        return SegmentBuilder(self._writer, node)


class TableWriter:
    """Author an azof-format table directory (the writer the reference
    roadmaps at README.md:152)."""

    def __init__(self, spark: SparkSession, table_path: str, schema: TableSchema):
        self.spark = spark
        self.path = table_path
        self.schema = schema
        self._segments: list[dict] = []
        iofs.makedirs(table_path)

    def _write_file(self, df: DataFrame, file_name: str, validate: bool) -> None:
        ordered = df.select(KEY_COL, EVENT_TIME_COL, *self.schema.column_names())
        if validate:
            validate_data_file_invariants(ordered)
        dataframe_to_parquet_file(ordered, iofs.join(self.path, file_name))

    def add_segment(
        self,
        segment_id: str,
        start: datetime,
        end: datetime | None = None,
        base_df: DataFrame | None = None,
        validate: bool = True,
    ) -> SegmentBuilder:
        node: dict = {"id": segment_id, "start": _ts(start)}
        if end is not None:
            node["end"] = _ts(end)
        if base_df is not None:
            file_name = f"{segment_id}_base.parquet"
            self._write_file(base_df, file_name, validate)
            node["file"] = file_name
            node.update(_stats_json(self.path, file_name))
        self._segments.append(node)
        return SegmentBuilder(self, node)

    def commit(self, version: str = "1") -> Snapshot:
        """Write ``s{version}.json`` then flip ``version.txt`` — readers
        resolve the pointer first, so the pointer flip is the atomic
        publish step."""
        doc = {"schema": self.schema.to_json(), "segments": self._segments}
        raw = json.dumps(doc, indent=2)
        snapshot = Snapshot.deserialize(raw)  # validates what we wrote
        iofs.write_text(iofs.join(self.path, f"s{version}.json"), raw)
        iofs.replace_text(iofs.join(self.path, VERSION_FILE), version)
        return snapshot


# ---------------------------------------------------------------------------
# Incremental upsert into an EXISTING table (new snapshot version per batch)
# ---------------------------------------------------------------------------


def _as_local_path(path: str) -> str | None:
    """Local filesystem path for a plain or ``file://`` table path;
    None for any other scheme (object stores)."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if "://" in path:
        return None
    return path


def _reservable_local_path(full: str) -> str | None:
    """Local path on which a delta NAME can be reserved atomically:
    plain/file:// paths directly; emulated object-store URIs via their
    local mirror (the emulation's conditional-put stand-in — caught red-
    handed by the emulated two-writer stress, where the plain existence
    probe let both writers pick the same name and clobber each other's
    bytes while the version chain looked intact). Real object stores
    return None."""
    local = _as_local_path(full)
    if local is not None:
        return local
    try:
        return iofs.emulated_mirror(full)
    except ValueError:
        return None


def _fresh_delta_name(table_path: str, segment_id: str, n_existing: int) -> str:
    """First non-colliding ``{seg}_delta{N}.parquet`` name — snapshots
    may reference fewer files than the directory holds (e.g. after a
    checkpoint kept originals on disk), so probe for existence.

    Local FS (and emulated object-store schemes, via their mirror): the
    name is RESERVED atomically (O_EXCL create of an empty file the
    parquet write then overwrites) — two concurrent writers probing at
    once can otherwise pick the same name and clobber each other's
    delta bytes before either commits. Real object stores have no
    atomic create-if-absent through pyarrow.fs, so the name carries a
    per-commit random token instead (``{seg}_delta{N}_{token}.parquet``
    — the commit_delta_files discipline): two writers deriving the same
    sequence number produce DIFFERENT names and can never clobber each
    other's bytes; they race only on the version pointer, which the
    commit guard arbitrates. The real-S3 two-writer stress
    (tests/test_object_store_real.py) caught the plain existence probe
    silently losing a committed delta's bytes exactly this way."""
    n = n_existing + 1
    while True:
        name = f"{segment_id}_delta{n}.parquet"
        full = iofs.join(table_path, name)
        local = _reservable_local_path(full)
        if local is not None:
            try:
                os.close(os.open(local, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
                return name
            except FileExistsError:
                n += 1
                continue
        token = uuid.uuid4().hex[:8]
        name = f"{segment_id}_delta{n}_{token}.parquet"
        if not iofs.exists(iofs.join(table_path, name)):
            return name
        n += 1


def _conform_to_schema(df: DataFrame, schema) -> DataFrame:
    """Align a producer batch with the DECLARED schema before writing.

    A producer written before a RENAME may still ship the former
    spelling: map it to the declared name (1:1 by the rename chain —
    this is what makes a rename non-breaking for writers, the
    write-side twin of the readers' formers coalesce). A batch carrying
    BOTH spellings — or two former spellings — is ambiguous and errors
    loudly. Nullable columns the batch doesn't carry (e.g. added by
    evolve_table_schema after the producer was written) are null-filled,
    and every column is cast to its DECLARED type: a batch carrying
    e.g. a DECIMAL (SQL literal) or INT where the schema says Float/
    Int64 would otherwise be written verbatim, and the committed
    delta's divergent parquet type then breaks every later
    explicit-schema scan until RESTORE (the UPDATE path had exactly
    this bug). A matching type is a no-op cast Catalyst elides."""
    have = set(df.columns)
    for c in schema.columns:
        if c.name in have:
            if any(f in have for f in c.formers):
                both = [f for f in c.formers if f in have]
                raise BazofError(
                    f"batch carries column {c.name!r} AND its former "
                    f"spelling(s) {both} — ambiguous after the "
                    "rename; ship exactly one"
                )
            continue
        present = [f for f in c.formers if f in have]
        if len(present) > 1:
            # a twice-renamed table can have producers shipping
            # different old spellings, but ONE batch carrying two
            # spellings of the same column is as ambiguous as
            # declared+former above — silently remapping the first
            # would drop the second in the final select (data loss)
            raise BazofError(
                f"batch carries multiple former spellings {present} "
                f"of column {c.name!r} — ambiguous; ship exactly one"
            )
        if present:
            df = df.withColumnRenamed(present[0], c.name)
            have = (have - {present[0]}) | {c.name}
    fills = [
        F.lit(None).cast(c.data_type.to_spark()).alias(c.name)
        for c in schema.columns
        if c.name not in have and c.nullable
    ]
    if fills:
        df = df.select("*", *fills)
    return df.select(
        F.col(KEY_COL).cast("string").alias(KEY_COL),
        F.col(EVENT_TIME_COL).cast("timestamp").alias(EVENT_TIME_COL),
        *[
            F.col(c.name).cast(c.data_type.to_spark()).alias(c.name)
            for c in schema.columns
        ],
    )


def append_delta(
    spark: SparkSession,
    table_path: str,
    df: DataFrame,
    start: datetime | None = None,
    end: datetime | None = None,
    segment_id: str | None = None,
    create_segment: bool = False,
    distributed: bool = False,
    num_files: int | None = None,
    validate: bool = True,
    tombstone: bool = False,
    expected_version: str | None = None,
) -> Snapshot:
    """Upsert one batch into an existing azof table: write a delta file
    (or, ``distributed=True``, one Spark write job producing many files),
    append it to an open top-level segment, publish ``s{v+1}.json`` and
    flip ``version.txt``. Readers resolve the pointer first, so the flip
    is the atomic commit — in-flight scans keep reading ``s{v}.json``
    (snapshot isolation, same discipline as :meth:`TableWriter.commit`).

    The reference roadmaps exactly this writer (README.md:152) and its
    late-data story (README.md:36): a batch whose event times lie in the
    past simply becomes a delta with an older ``start``. Precedence
    follows the format's pruning order (crates/azof/src/metadata.rs:47-73
    — deltas sort by ``start`` DESC): an upsert with *newer* event times
    shadows older deltas; a late batch slots beneath any delta whose
    ``start`` is newer, which is the format's defined semantics (file
    precedence beats timestamp, SURVEY §4.2).

    ``start``/``end`` default to the batch's min/max ``event_time`` (one
    cheap aggregate over the batch). Target segment: ``segment_id`` if
    given, else the LAST open top-level segment; ``create_segment=True``
    opens a fresh one when none exists.

    Concurrency: like the reference, the format has no commit log or
    lock — concurrent writers race on ``version.txt`` (last flip wins).
    Single-writer-per-table is the assumed discipline.

    ``tombstone=True`` commits the batch as a DELETE marker (our
    Delta-Lake-style extension; see :func:`delete_keys` and
    metadata.Delta.tombstone): only ``(key, event_time)`` are written —
    the scan null-fills value columns via its explicit-schema read, the
    same mechanism schema evolution uses — and the delta node carries
    the tombstone flag, so a tombstone row winning the merge hides its
    key instead of surfacing. Precedence/eligibility are the ordinary
    delta rules: as-of instants before the delete still see the old
    row, and a later upsert resurrects the key.
    """
    table = Table(path=table_path, name=os.path.basename(table_path.rstrip("/")))
    version = table.current_version()
    if expected_version is not None and version != expected_version:
        # the caller derived ``df`` from a read of ``expected_version``
        # (e.g. Lakehouse.update's read-modify-write): a commit that
        # landed since would be silently shadowed by rows computed
        # without seeing it — surface the conflict instead so the
        # caller re-derives (the same contract _publish_snapshot
        # enforces for the narrower read→flip window below)
        from bazof_spark.errors import CommitConflictError

        raise CommitConflictError(
            f"table moved {expected_version!r} → {version!r} since the "
            "batch was derived; re-read and re-derive before retrying"
        )
    snapshot = table.get_snapshot(version)
    try:
        current = int(version)
    except ValueError as exc:  # non-numeric pointer: don't guess
        raise BazofError(
            f"cannot bump non-numeric snapshot version {version!r}"
        ) from exc
    # never overwrite an existing snapshot (e.g. one abandoned by a
    # pointer rollback): publish above every numbered snapshot on disk
    from bazof_spark.maintenance import _numeric_versions

    next_version = str(max([current, *_numeric_versions(table_path)]) + 1)

    schema = snapshot.schema
    if tombstone:
        # a tombstone file carries ONLY the merge keys; the scan's
        # explicit-schema read null-fills the value columns
        ordered = df.select(KEY_COL, EVENT_TIME_COL)
    else:
        ordered = _conform_to_schema(df, schema)
    # one materialization for the up-to-three consumers (invariant
    # check, min/max bounds, the write itself) — without it each re-runs
    # the batch's full lineage as its own Spark job
    multi_pass = validate or start is None or end is None
    if multi_pass:
        ordered = ordered.persist()
    try:
        if validate:
            validate_data_file_invariants(ordered)
        if start is None or end is None:
            lo, hi = ordered.select(
                F.min(EVENT_TIME_COL), F.max(EVENT_TIME_COL)
            ).first()
            if lo is None:
                raise BazofError("cannot upsert an empty batch")
            start = start or lo
            end = end or hi
    except BaseException:
        if multi_pass:
            ordered.unpersist()
        raise
    # aware-UTC like their serialized form, so the in-memory snapshot
    # sorts/compares exactly as a re-read of s{N}.json will
    start, end = _aware_utc(start), _aware_utc(end)

    # -- pick the target top-level segment --------------------------------
    segs = list(snapshot.segments)
    idx = _pick_target_segment(segs, segment_id, create_segment, start, next_version)
    target = segs[idx]

    # -- write the delta file(s) ------------------------------------------
    new_deltas: list[Delta] = []
    try:
        if distributed:
            # the 100-TB path: repartition by key (a key lives in exactly
            # one file, so stable precedence among equal-start siblings
            # can never arbitrate between two versions of one key),
            # event_time-DESC within each file
            stem = _fresh_delta_name(table_path, target.id, len(target.delta))[
                : -len(".parquet")
            ]
            for name in _write_distributed_delta(
                ordered, table_path, stem, num_files
            ):
                new_deltas.append(
                    _delta_with_stats(
                        table_path, name, start, end, tombstone=tombstone
                    )
                )
        else:
            name = _fresh_delta_name(table_path, target.id, len(target.delta))
            dataframe_to_parquet_file(ordered, iofs.join(table_path, name))
            new_deltas.append(
                _delta_with_stats(
                    table_path, name, start, end, tombstone=tombstone
                )
            )
    finally:
        if multi_pass:
            ordered.unpersist()

    # -- publish the new snapshot -----------------------------------------
    segs[idx] = dataclasses.replace(
        target, delta=_insert_deltas(tuple(target.delta), new_deltas, start)
    )
    new_snapshot = Snapshot(segments=tuple(segs), schema=schema)
    _publish_snapshot(table_path, version, next_version, new_snapshot)
    return new_snapshot


def _insert_deltas(
    existing: tuple[Delta, ...], new: list[Delta], start: datetime
) -> tuple[Delta, ...]:
    """Place a commit's delta entries so the reader's stable
    sort-by-start-DESC gives them precedence over every delta whose
    start is ≤ theirs — i.e. A LATER UPSERT SHADOWS EARLIER DATA even
    when the batches share a start (a replayed or re-read batch has
    exactly the old batch's start). Appending instead would let the
    OLD delta win such ties (stable sort keeps array order), silently
    dropping the upsert. Pure writer-side placement: reader semantics
    (metadata.rs:47-73 port) are untouched, and entries within one
    commit keep their file order."""
    from datetime import timezone

    def _utc(dt: datetime) -> datetime:
        # snapshot timestamps parse tz-aware; batch aggregates may be
        # naive. Interpret naive values exactly as format_rfc3339_ms
        # will when the delta serializes (astimezone = machine-local
        # for naive input), so the comparison here always agrees with
        # the start the READER later sees on disk.
        return dt.astimezone(timezone.utc)

    idx = len(existing)
    for i, d in enumerate(existing):
        if _utc(d.start) <= _utc(start):
            idx = i
            break
    return existing[:idx] + tuple(new) + existing[idx:]


def _pick_target_segment(
    segs: list[Segment],
    segment_id: str | None,
    create_segment: bool,
    start: datetime,
    next_version: str,
) -> int:
    """Index of the top-level segment an upsert lands in: ``segment_id``
    if given, else the last OPEN segment; with ``create_segment`` a new
    open segment ``u{next_version}`` is appended when none qualifies.
    Mutates ``segs`` only in that create case."""
    idx: int | None = None
    if segment_id is not None:
        for i, s in enumerate(segs):
            if s.id == segment_id:
                idx = i
                break
        if idx is None:
            raise BazofError(f"no top-level segment with id {segment_id!r}")
    else:
        for i in range(len(segs) - 1, -1, -1):
            if segs[i].end is None:
                idx = i
                break
    if idx is None:
        if not create_segment:
            raise BazofError(
                "no open top-level segment to upsert into "
                "(pass create_segment=True to open one)"
            )
        segs.append(Segment(id=f"u{next_version}", start=start))
        idx = len(segs) - 1
    return idx


def commit_delta_files(
    table_path: str,
    staged_paths: list[str],
    start: datetime,
    end: datetime,
    segment_id: str | None = None,
    create_segment: bool = True,
    retries: int = 3,
) -> Snapshot:
    """Commit ALREADY-WRITTEN parquet files (staged by a distributed
    write, e.g. the bazof Data Source writer) into an existing table as
    ONE logical upsert: each staged file is moved to its final name and
    appended as a Delta entry, then the new snapshot is published
    optimistically (same check-then-flip as :func:`append_delta`).

    Multi-writer safety: final names carry a per-commit random token
    (``{seg}_delta{N}_{token}_p{i}.parquet``), so two concurrent
    commits that derived the same sequence number can never clobber
    each other's data files — they only race on the version pointer.
    The loser of that race re-reads the table and re-publishes
    REFERENCING THE SAME already-moved files (the move happens exactly
    once; only the metadata derivation retries, up to ``retries``
    times). On final failure the moved files are left unreferenced —
    ``vacuum_table`` debris, never visible data.

    All sibling files carry the SAME ``[start, end]`` range — they are
    one batch, so none may shadow another; the caller guarantees a key
    lives in at most one staged file (repartition-by-key discipline,
    same as ``add_delta_distributed``)."""
    import uuid

    from bazof_spark.errors import CommitConflictError
    from bazof_spark.maintenance import _numeric_versions

    if not staged_paths:
        raise BazofError("cannot commit an empty file set")
    table = Table(path=table_path, name=os.path.basename(table_path.rstrip("/")))
    start, end = _aware_utc(start), _aware_utc(end)
    token = uuid.uuid4().hex[:8]
    moved: list[str] | None = None
    for attempt in range(retries + 1):
        version = table.current_version()
        snapshot = table.get_snapshot(version)
        try:
            current = int(version)
        except ValueError as exc:
            raise BazofError(
                f"cannot bump non-numeric snapshot version {version!r}"
            ) from exc
        next_version = str(max([current, *_numeric_versions(table_path)]) + 1)
        segs = list(snapshot.segments)
        idx = _pick_target_segment(
            segs, segment_id, create_segment, start, next_version
        )
        target = segs[idx]
        if moved is None:  # move exactly once, under collision-free names
            stem = f"{target.id}_delta{len(target.delta) + 1}_{token}"
            moved = []
            for i, staged in enumerate(sorted(staged_paths)):
                name = f"{stem}_p{i:05d}.parquet"
                iofs.move(staged, iofs.join(table_path, name))
                moved.append(name)
        new_deltas = [
            _delta_with_stats(table_path, n, start, end) for n in moved
        ]
        segs[idx] = dataclasses.replace(
            target, delta=_insert_deltas(tuple(target.delta), new_deltas, start)
        )
        new_snapshot = Snapshot(segments=tuple(segs), schema=snapshot.schema)
        try:
            _publish_snapshot(table_path, version, next_version, new_snapshot)
            return new_snapshot
        except CommitConflictError:
            if attempt == retries:
                raise
    raise AssertionError("unreachable")


def create_table_version_from_files(
    table_path: str,
    schema: TableSchema,
    staged_paths: list[str],
    start: datetime,
    end: datetime,
) -> Snapshot:
    """Publish a snapshot whose content is EXACTLY the staged files —
    the ``mode("overwrite")`` path of the bazof Data Source writer.
    Creates the table (version ``1``) when absent; on an existing table
    publishes above every numbered snapshot, so prior versions remain
    pinnable via ``.option("version", …)`` time travel while the
    pointer now resolves to the replacement state.

    Multi-writer safety mirrors :func:`commit_delta_files`: final file
    names carry a per-commit random token (moved exactly once), so
    concurrent overwrites never clobber each other's data files;
    existing-table publishes go through the optimistic
    ``_publish_snapshot`` check and re-derive the version on conflict.
    Two racing CREATIONS of a table that does not exist yet still
    last-write-win on ``version.txt`` (no CAS on object stores), but
    each points at its own intact file set — never a torn mix."""
    import uuid

    from bazof_spark.errors import CommitConflictError
    from bazof_spark.maintenance import _numeric_versions

    if not staged_paths:
        raise BazofError("cannot publish an empty file set")
    iofs.makedirs(table_path)
    version_path = iofs.join(table_path, VERSION_FILE)
    start, end = _aware_utc(start), _aware_utc(end)
    token = uuid.uuid4().hex[:8]
    moved: list[str] | None = None
    retries = 3
    for attempt in range(retries + 1):
        fresh = not iofs.exists(version_path)
        if fresh:
            expected = None
            next_version = "1"
        else:
            table = Table(
                path=table_path, name=os.path.basename(table_path.rstrip("/"))
            )
            expected = table.current_version()
            try:
                base = int(expected)
            except ValueError as exc:
                raise BazofError(
                    f"cannot bump non-numeric snapshot version {expected!r}"
                ) from exc
            next_version = str(
                max([base, *_numeric_versions(table_path)]) + 1
            )
        if moved is None:  # move exactly once, under collision-free names
            moved = []
            for i, staged in enumerate(sorted(staged_paths)):
                name = f"w_{token}_p{i:05d}.parquet"
                iofs.move(staged, iofs.join(table_path, name))
                moved.append(name)
        snapshot = Snapshot(
            segments=(
                Segment(
                    id=f"w{next_version}",
                    start=start,
                    delta=tuple(
                        _delta_with_stats(table_path, n, start, end)
                        for n in moved
                    ),
                ),
            ),
            schema=schema,
        )
        if expected is None:
            iofs.write_text(
                iofs.join(table_path, f"s{next_version}.json"),
                snapshot.serialize(),
            )
            iofs.replace_text(version_path, next_version)
            return snapshot
        try:
            _publish_snapshot(table_path, expected, next_version, snapshot)
            return snapshot
        except CommitConflictError:
            if attempt == retries:
                raise
    raise AssertionError("unreachable")


def upsert_with_retry(
    spark: SparkSession,
    table_path: str,
    df: DataFrame,
    retries: int = 3,
    **kwargs,
):
    """append_delta with optimistic-concurrency retries: on
    CommitConflictError the table is re-read (fresh version, fresh
    snapshot) and the upsert re-derived — the standard commit loop
    every optimistic lakehouse writer runs."""
    from bazof_spark.errors import CommitConflictError

    for attempt in range(retries + 1):
        try:
            return append_delta(spark, table_path, df, **kwargs)
        except CommitConflictError:
            if attempt == retries:
                raise


def delete_keys(
    spark: SparkSession,
    table_path: str,
    keys,
    at: datetime | None = None,
    **kwargs,
) -> Snapshot:
    """Delete ``keys`` from the table as of ``at`` (default: now, UTC) —
    the Delta-Lake-style DELETE over the format's merge semantics: one
    tombstone delta whose rows are ``(key, at)``; at any as-of ≥ ``at``
    the tombstone wins the merge and the key disappears from scans, at
    instants before it the old row is still visible (the delete is
    itself time-travel-consistent), and a LATER upsert resurrects the
    key (file precedence, exactly like an ordinary newer version).

    ``keys`` is an iterable of key strings (driver-side, bounded — a
    point delete) or a DataFrame with a ``key`` column (the distributed
    path: DELETE WHERE <predicate> at corpus scale never collects the
    matching keys). Extra kwargs pass through to :func:`append_delta`
    (``segment_id``, ``create_segment``, ``distributed``...)."""
    from datetime import timezone

    if at is None:
        at = datetime.now(timezone.utc)
    at = _aware_utc(at)
    if isinstance(keys, DataFrame):
        df = keys.select(
            F.col(KEY_COL).cast("string").alias(KEY_COL),
            F.lit(at).alias(EVENT_TIME_COL),
        ).dropDuplicates([KEY_COL])
        if df.isEmpty():
            # A predicate that matches nothing is a no-op, NOT an empty
            # tombstone commit: publishing one would permanently flip a
            # delete-free table to delete-capable (raw/stream schema
            # gains _tombstone, running streams fail fast on the delta)
            # without removing a single row. Return the current
            # snapshot unchanged instead.
            from bazof_spark.table import Table

            return Table(table_path, table_path).get_current_snapshot()
    else:
        ks = sorted({str(k) for k in keys})
        if not ks:
            # same no-op contract as the empty-DataFrame path above: an
            # empty request must not flip a delete-free table to
            # delete-capable (schema gains _tombstone) without removing
            # a single row
            from bazof_spark.table import Table

            return Table(table_path, table_path).get_current_snapshot()
        df = spark.createDataFrame(
            [(k, at) for k in ks], f"{KEY_COL} string, {EVENT_TIME_COL} timestamp"
        )
    return append_delta(
        spark, table_path, df, start=at, end=at, tombstone=True, **kwargs
    )


def merge_apply(
    spark: SparkSession,
    table_path: str,
    upsert_df: DataFrame | None = None,
    delete_keys_df: DataFrame | None = None,
    at: datetime | None = None,
    create_segment: bool = True,
    expected_version: str | None = None,
    validate: bool = True,
) -> Snapshot:
    """Apply a multi-clause MERGE outcome — upsert rows AND key
    tombstones — as ONE snapshot publish: the data delta and the
    tombstone delta land in the same ``s{v+1}.json``, so the statement
    is atomic (a reader either sees none of the MERGE or all of it;
    chaining append_delta + delete_keys would expose the half-applied
    intermediate version and bump twice). Delta Lake's multi-clause
    MERGE commits exactly one version for the same reason.

    The caller guarantees the two key sets are DISJOINT (first-match-
    wins clause compilation does this by construction) — within one
    version a tombstone and a data row for the same key would tie on
    precedence. Empty inputs degrade exactly like the single-form
    writers: no upsert rows and no delete keys is a version no-op
    (returns the current snapshot); an empty delete set never flips a
    delete-free table to delete-capable."""
    from datetime import timezone

    from bazof_spark.maintenance import _numeric_versions

    if at is None:
        at = datetime.now(timezone.utc)
    at = _aware_utc(at)

    table = Table(
        path=table_path, name=os.path.basename(table_path.rstrip("/"))
    )
    version = table.current_version()
    if expected_version is not None and version != expected_version:
        from bazof_spark.errors import CommitConflictError

        raise CommitConflictError(
            f"table moved {expected_version!r} → {version!r} since the "
            "merge was derived; re-read and re-derive before retrying"
        )
    snapshot = table.get_snapshot(version)
    try:
        current = int(version)
    except ValueError as exc:
        raise BazofError(
            f"cannot bump non-numeric snapshot version {version!r}"
        ) from exc
    next_version = str(max([current, *_numeric_versions(table_path)]) + 1)
    schema = snapshot.schema

    ordered = None
    if upsert_df is not None:
        ordered = _conform_to_schema(upsert_df, schema).persist()
        try:
            if ordered.isEmpty():
                ordered.unpersist()
                ordered = None
            elif validate:
                validate_data_file_invariants(ordered)
        except BaseException:
            ordered.unpersist()
            raise
    tomb = None
    if delete_keys_df is not None:
        # persist around the isEmpty probe + parquet write so the
        # delete-key derivation (joins over the target scan) runs once,
        # mirroring `ordered` above
        tomb = delete_keys_df.select(
            F.col(KEY_COL).cast("string").alias(KEY_COL),
            F.lit(at).alias(EVENT_TIME_COL),
        ).dropDuplicates([KEY_COL]).persist()
        try:
            if tomb.isEmpty():
                tomb.unpersist()
                tomb = None  # same no-op contract as delete_keys
        except BaseException:
            tomb.unpersist()
            if ordered is not None:
                ordered.unpersist()
            raise
    if ordered is None and tomb is None:
        return snapshot

    try:
        if ordered is not None:
            lo, hi = ordered.select(
                F.min(EVENT_TIME_COL), F.max(EVENT_TIME_COL)
            ).first()
            u_start, u_end = _aware_utc(lo), _aware_utc(hi)
        else:
            u_start = u_end = at

        segs = list(snapshot.segments)
        idx = _pick_target_segment(
            segs, None, create_segment, min(u_start, at), next_version
        )
        target = segs[idx]
        deltas = tuple(target.delta)
        n = len(deltas)
        if ordered is not None:
            name = _fresh_delta_name(table_path, target.id, n)
            dataframe_to_parquet_file(ordered, iofs.join(table_path, name))
            deltas = _insert_deltas(
                deltas,
                [
                    _delta_with_stats(
                        table_path, name, u_start, u_end, tombstone=False
                    )
                ],
                u_start,
            )
            n += 1
        if tomb is not None:
            name = _fresh_delta_name(table_path, target.id, n)
            dataframe_to_parquet_file(tomb, iofs.join(table_path, name))
            deltas = _insert_deltas(
                deltas,
                [
                    _delta_with_stats(
                        table_path, name, at, at, tombstone=True
                    )
                ],
                at,
            )
    finally:
        if ordered is not None:
            ordered.unpersist()
        if tomb is not None:
            tomb.unpersist()

    segs[idx] = dataclasses.replace(target, delta=deltas)
    new_snapshot = Snapshot(segments=tuple(segs), schema=schema)
    _publish_snapshot(table_path, version, next_version, new_snapshot)
    return new_snapshot


@contextlib.contextmanager
def _commit_lock(table_path: str):
    """Mutual exclusion for the check→flip publish window, resolved
    through the pluggable guard seam (:mod:`bazof_spark.commitguard`):
    local / ``file://`` tables get the token-verified O_EXCL file lock
    (a real CAS — two simultaneous publishers can no longer both pass
    the pointer check; the loser gets CommitConflictError and the
    retry loop re-derives), emulated object-store schemes lock on
    their local mirror (a conditional-put stand-in), and unregistered
    object-store URIs publish unguarded — the documented last-write-
    wins residual until a real conditional-put/locking service is
    registered via ``commitguard.register_commit_guard`` (the gap
    Delta closes with a LogStore). Yields the HeldGuard so the caller
    can ``verify()`` at the commit point."""
    from bazof_spark.commitguard import guard_for

    held = guard_for(table_path).acquire()
    try:
        yield held
    finally:
        held.release()


def _publish_snapshot(
    table_path: str,
    expected_version: str,
    next_version: str,
    snapshot: Snapshot,
) -> None:
    """Optimistic-concurrency publish: under the commit guard, re-check
    the version pointer still reads ``expected_version`` (the snapshot
    this commit was derived from), then write the snapshot and flip the
    pointer; a moved pointer means a concurrent writer won — raise
    CommitConflictError so the caller re-reads and retries instead of
    silently dropping the other commit's deltas from its snapshot copy.
    The snapshot is STAGED under an attempt-unique name and only
    finalized to ``s{N}.json`` after ``held.verify()`` passes, with a
    second ``verify()`` immediately before the pointer flip. Without
    the staging, a writer that stalled past the stale window (lock
    broken, successor published the SAME next_version and flipped the
    pointer) would wake and overwrite the successor's ``s{N}.json``
    with its own content before its verify() could abort — the pointer
    would then reference the aborted writer's snapshot, silently losing
    the successor's commit. Staging confines the pre-verify write to a
    name no reader or pointer ever references; only the verified winner
    touches ``s{N}.json``. A sub-millisecond verify→finalize /
    verify→flip window remains by construction — FULL closure needs a
    CAS/conditional-put guard (commitguard.register_commit_guard); on
    unguarded object stores the pointer re-check alone still catches
    every non-simultaneous race. Abandoned delta files and staged
    snapshots stay unreferenced until vacuum_table."""
    import uuid as _uuid

    from bazof_spark.errors import CommitConflictError

    with _commit_lock(table_path) as held:
        latest = Table(
            path=table_path, name=os.path.basename(table_path.rstrip("/"))
        ).current_version()
        if latest != expected_version:
            raise CommitConflictError(
                f"version pointer moved {expected_version!r} → {latest!r} "
                "while this commit ran; re-read the table and retry"
            )
        final = iofs.join(table_path, f"s{next_version}.json")
        staged = f"{final}.stage-{_uuid.uuid4().hex}"
        try:
            iofs.write_text(staged, snapshot.serialize())
            # finalize gate: a holder whose lock was broken while it
            # serialized must not touch the real s{N}.json at all
            held.verify()
            iofs.move(staged, final)
        except BaseException:
            # best-effort debris cleanup while re-raising the real error
            # (vacuum collects any stage file this leaves behind)
            with contextlib.suppress(Exception):
                iofs.delete(staged)
            raise
        # the flip is the commit point: confirm the guard is still ours
        # (a >stale-window stall may have had the lock broken under us)
        held.verify()
        # atomic flip: concurrent readers must never observe a torn/empty
        # version pointer (replace_text = temp+rename locally, single PUT
        # on object stores)
        iofs.replace_text(iofs.join(table_path, VERSION_FILE), next_version)
