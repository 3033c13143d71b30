"""Incremental time-bucketed rollup (continuous-aggregate / hypertable
rollup pattern).

The reference has no aggregation at all (it delegates to DataFusion;
SURVEY §2.B), but a 100 TB event log cannot afford to re-scan history
for every dashboard query. The classic fix — TimescaleDB continuous
aggregates, Druid rollup segments — is to materialize the finest
re-aggregable bucket level once and answer queries from
``materialized ∪ aggregated-tail``:

- **materialized**: per-(bucket, key) partial aggregates for every
  bucket that closed before the high-water mark T, stored as parquet
  partitioned by bucket date → planning-time partition pruning.
- **tail**: raw events with ``ts >= T`` aggregated on the fly (T is
  always a bucket boundary, so no bucket is split across the two
  sides).
- **refresh**: only buckets touched by NEW rows are recomputed —
  an incremental pass reads the tail slice, never history.

Exactness requires re-aggregable measures, the same contract as
``agg.rollup_from_partials``: sum/min/max merge losslessly, count
merges as sum. With integer/decimal sums the merged result is
bit-identical to a full recompute (float sums would reorder
additions).

Scale: the materialized side is |buckets × keys| rows — orders of
magnitude smaller than the log. The tail scan is bounded by one
refresh interval of data. Both sides partial-aggregate map-side before
their single shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bazof_spark.operators.agg import MeasureSpec, _check

BUCKET_COL = "bucket_start"


def _bucketed(
    df: DataFrame, ts_col: str, bucket_seconds: int
) -> DataFrame:
    # integer-floor bucketing on epoch µs: engine-portable (the same
    # arithmetic is one line of ANSI SQL) unlike window()/date_trunc
    # whose tz/DST behavior differs across engines. Long modulo, not
    # double division — exact at any epoch magnitude.
    us = 1_000_000 * bucket_seconds
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return df.withColumn(
        BUCKET_COL, F.timestamp_micros(epoch - epoch % F.lit(us))
    )


def aggregate_bucketed(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    measures: MeasureSpec,
    bucket_seconds: int,
) -> DataFrame:
    """Finest-level rollup: one row per (bucket_start, *keys)."""
    _check(measures)
    return (
        _bucketed(df, ts_col, bucket_seconds)
        .groupBy(BUCKET_COL, *keys)
        .agg(*[expr.alias(name) for name, (expr, _) in measures.items()])
    )


def merge_partials(
    parts: DataFrame, keys: Sequence[str], measures: MeasureSpec
) -> DataFrame:
    """Re-aggregate partial rollup rows (e.g. after a refresh appended
    a second partial for a bucket a late event touched)."""
    return parts.groupBy(BUCKET_COL, *keys).agg(
        *[
            getattr(F, merge)(name).alias(name)
            for name, (_, merge) in measures.items()
        ]
    )


class Rollup:
    """A materialized rollup over an event log.

    ``path`` holds the partial aggregates as parquet partitioned by
    ``bucket_date`` (derived from bucket_start) so historical queries
    prune partitions at planning time; ``watermark`` (a bucket
    boundary) is stored next to it in ``_WATERMARK``.
    """

    def __init__(
        self,
        spark,
        path: str,
        ts_col: str,
        keys: Sequence[str],
        measures: MeasureSpec,
        bucket_seconds: int,
    ):
        _check(measures)
        self.spark = spark
        self.path = path
        self.ts_col = ts_col
        self.keys = list(keys)
        self.measures = measures
        self.bucket_seconds = bucket_seconds

    # -- watermark bookkeeping (driver-side metadata, like version.txt;
    # all IO through iofs so URI paths — s3://, file:// — behave the
    # same as local ones instead of os.path.exists silently answering
    # False and forcing a rebuild every refresh)
    @property
    def _wm_path(self) -> str:
        from bazof_spark import iofs

        return iofs.join(self.path, "_WATERMARK")

    @property
    def _schema_path(self) -> str:
        from bazof_spark import iofs

        return iofs.join(self.path, "_SCHEMA")

    def _write_partials(self, agg: DataFrame, mode: str) -> None:
        """Write partial rows + persist their schema, so an
        empty-but-valid rollup (no bucket closed yet, or an all-late
        refresh) stays readable: Spark can't infer a schema from a
        data-file-less parquet directory."""
        import json

        from bazof_spark import iofs

        agg.write.mode(mode).partitionBy("bucket_date").parquet(self.path)
        if not iofs.exists(self._schema_path):
            iofs.write_text(
                self._schema_path, json.dumps(agg.schema.jsonValue())
            )

    def _read_partials(self) -> DataFrame:
        import json

        from pyspark.sql.types import StructType

        from bazof_spark import iofs

        reader = self.spark.read
        if iofs.exists(self._schema_path):
            reader = reader.schema(
                StructType.fromJson(json.loads(iofs.read_text(self._schema_path)))
            )
        return reader.parquet(self.path)

    def watermark(self) -> datetime | None:
        from bazof_spark import iofs

        if not iofs.exists(self._wm_path):
            return None
        return datetime.fromtimestamp(
            int(iofs.read_text(self._wm_path)), tz=timezone.utc
        )

    def _set_watermark(self, t: datetime) -> None:
        from bazof_spark import iofs

        iofs.write_text(self._wm_path, str(int(t.timestamp())))

    def floor_bucket(self, t: datetime) -> datetime:
        s = int(t.timestamp()) // self.bucket_seconds * self.bucket_seconds
        return datetime.fromtimestamp(s, tz=timezone.utc)

    # -- build / refresh / read
    def build(self, events: DataFrame, up_to: datetime) -> datetime:
        """Materialize every bucket closed strictly before
        ``floor_bucket(up_to)``; returns the watermark."""
        wm = self.floor_bucket(up_to)
        closed = events.filter(F.col(self.ts_col) < F.lit(wm))
        agg = aggregate_bucketed(
            closed, self.ts_col, self.keys, self.measures, self.bucket_seconds
        ).withColumn("bucket_date", F.to_date(BUCKET_COL))
        self._write_partials(agg, "overwrite")
        self._set_watermark(wm)
        return wm

    def refresh(self, events: DataFrame, up_to: datetime) -> datetime:
        """Incremental advance: aggregate ONLY ``[old_wm, new_wm)`` and
        append those partials — history is never re-read. Assumes rows
        below the old watermark were already present at build time;
        for late ARRIVALS (new rows with old event times, azof's
        delta-file case) use :meth:`reconcile`."""
        old = self.watermark()
        if old is None:
            return self.build(events, up_to)
        new = self.floor_bucket(up_to)
        if new <= old:
            return old
        slice_df = events.filter(
            (F.col(self.ts_col) >= F.lit(old))
            & (F.col(self.ts_col) < F.lit(new))
        )
        agg = aggregate_bucketed(
            slice_df,
            self.ts_col,
            self.keys,
            self.measures,
            self.bucket_seconds,
        ).withColumn("bucket_date", F.to_date(BUCKET_COL))
        self._write_partials(agg, "append")
        self._set_watermark(new)
        return new

    def reconcile(self, new_rows: DataFrame) -> None:
        """Fold LATE-ARRIVING rows (new rows whose event time is below
        the watermark — the case azof models with delta files) into the
        materialized partials: aggregate the batch per touched bucket
        and append; ``read`` re-merges per bucket, so the result equals
        a full rebuild that had seen the rows. Rows at/above the
        watermark are excluded — they belong to the live tail. Cost is
        one pass over the batch, never over history."""
        wm = self.watermark()
        if wm is None:
            raise ValueError("rollup not built; call build() first")
        late = new_rows.filter(F.col(self.ts_col) < F.lit(wm))
        agg = aggregate_bucketed(
            late, self.ts_col, self.keys, self.measures, self.bucket_seconds
        ).withColumn("bucket_date", F.to_date(BUCKET_COL))
        self._write_partials(agg, "append")

    # -- streaming continuous-aggregate mode: the rollup IS the store
    # (no raw log to serve a tail). foreachBatch appends each
    # micro-batch's partials; reads merge partials per bucket. The
    # foreachBatch at-least-once replay contract makes duplicate
    # partials possible after crash-recovery; pass the micro-batch
    # through dropDuplicates on a row id before folding when exact
    # counts must survive replays.
    def append_partials(self, batch: DataFrame) -> None:
        """Fold one micro-batch (any event times — late rows included)
        into the materialized partials. One aggregation pass over the
        batch; history never re-read."""
        agg = aggregate_bucketed(
            batch, self.ts_col, self.keys, self.measures, self.bucket_seconds
        ).withColumn("bucket_date", F.to_date(BUCKET_COL))
        self._write_partials(agg, "append")

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch`` — a Structured
        Streaming continuous aggregate in one line:
        ``stream.writeStream.foreachBatch(rollup.foreach_batch())``."""

        def _fold(batch_df: DataFrame, batch_id: int) -> None:
            if not batch_df.isEmpty():
                self.append_partials(batch_df)

        return _fold

    def read_materialized(self) -> DataFrame:
        """Merged view of the partials alone (streaming mode — no tail
        side). Equals the full GROUP BY over every batch ever folded."""
        cols = [BUCKET_COL, *self.keys, *self.measures.keys()]
        mat = self._read_partials().select(*cols)
        return merge_partials(mat, self.keys, self.measures).select(*cols)

    def read(self, events: DataFrame) -> DataFrame:
        """Exact finest-level rollup over the WHOLE log: materialized
        partials (re-merged per bucket) ∪ aggregated tail
        (``ts >= watermark``). Equals ``aggregate_bucketed(events)``
        row-for-row, but scans only rollup rows + one tail slice."""
        wm = self.watermark()
        if wm is None:
            raise ValueError("rollup not built; call build() first")
        cols = [BUCKET_COL, *self.keys, *self.measures.keys()]
        mat = self._read_partials().select(*cols)
        tail = aggregate_bucketed(
            events.filter(F.col(self.ts_col) >= F.lit(wm)),
            self.ts_col,
            self.keys,
            self.measures,
            self.bucket_seconds,
        ).select(*cols)
        return merge_partials(
            mat.unionByName(tail), self.keys, self.measures
        ).select(*cols)
