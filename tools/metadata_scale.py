"""Metadata-path scaling: snapshot size, parse time, and planning time
at large file counts (pure Python — no Spark; the metadata walk is
driver-side by design, like Delta log file skipping).

Synthesizes a snapshot with N delta files carrying realistic inline
zone-map stats (key bounds + a 2048-key bloom each, the shape the
writer records for modest files), then measures:

- serialized snapshot size;
- cold deserialize (JSON + base64) vs cached re-load
  (table._deserialize_cached);
- get_data_files planning for a point lookup (bloom probes) and for
  Current with no predicate.

Usage: python tools/metadata_scale.py [n_files]
Prints one JSON line.
"""

import json
import os
import sys
import time
import datetime as dt

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.metadata import Delta, KeyBloom, KeyRange, Segment, Snapshot  # noqa: E402
from bazof_spark.schema import ColumnDef, ColumnType, TableSchema  # noqa: E402
from bazof_spark.table import _deserialize_cached  # noqa: E402

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    keys_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    deltas = []
    for i in range(n_files):
        keys = [f"{(i * keys_per_file + j) % (n_files * keys_per_file):012d}"
                for j in range(keys_per_file)]
        deltas.append(
            Delta(
                file=f"d{i:06d}.parquet",
                start=T0 + dt.timedelta(minutes=i),
                end=T0 + dt.timedelta(minutes=i + 1),
                key_min=min(keys),
                key_max=max(keys),
                key_bloom=KeyBloom.build(keys),
            )
        )
    snap = Snapshot(
        segments=(Segment(id="s1", start=T0, delta=tuple(deltas)),),
        schema=TableSchema(
            columns=(
                ColumnDef(name="v", data_type=ColumnType.STRING, nullable=False),
            )
        ),
    )
    raw = snap.serialize()
    size_mb = len(raw) / 1e6

    t = time.perf_counter()
    cold = Snapshot.deserialize(raw)
    parse_cold_s = time.perf_counter() - t

    _deserialize_cached(raw)  # warm the cache
    t = time.perf_counter()
    _deserialize_cached(raw)
    parse_cached_s = time.perf_counter() - t

    probe = KeyRange.of_keys([deltas[n_files // 2].key_min])
    t = time.perf_counter()
    hit_files = cold.get_data_files(key_range=probe)
    plan_lookup_s = time.perf_counter() - t

    t = time.perf_counter()
    all_files = cold.get_data_files()
    plan_full_s = time.perf_counter() - t

    print(
        json.dumps(
            {
                "n_files": n_files,
                "snapshot_mb": round(size_mb, 1),
                "parse_cold_s": round(parse_cold_s, 3),
                "parse_cached_s": round(parse_cached_s, 6),
                "plan_point_lookup_s": round(plan_lookup_s, 3),
                "files_admitted": len(hit_files),
                "plan_full_s": round(plan_full_s, 3),
                "files_total": len(all_files),
            }
        )
    )


if __name__ == "__main__":
    main()
