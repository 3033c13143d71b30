"""Table = directory with ``version.txt`` + ``s{N}.json`` snapshots +
parquet data files (reference: crates/azof/src/table.rs:6-41,
docs/architecture.md:127-139).

Version resolution is driver-side metadata work: read the version
pointer, load the snapshot JSON. Paths resolve through either the local
filesystem or any fsspec-ish URI Spark itself can read; for object
stores the snapshot fetch goes through ``pyarrow.fs`` so the same code
serves s3://, gs://, abfs:// and file paths.
"""

from __future__ import annotations

import hashlib
import os
import threading
from collections import OrderedDict
from dataclasses import dataclass

from bazof_spark.errors import TableNotFoundError
from bazof_spark.metadata import Snapshot

VERSION_FILE = "version.txt"

# Content-addressed parse cache: snapshot JSON grew real weight with the
# inline zone-map stats (base64 blooms), and every scan re-loads one.
# Keyed by the sha256 of the RAW BYTES — never by (path, version), which
# overwrite-mode re-creation at the same path would poison — so a hit is
# definitionally the same document and staleness is impossible; the
# (small) pointer+snapshot reads still happen every call, only the
# JSON/base64 decode is skipped. Snapshots are frozen dataclasses of
# tuples, safe to share across threads and Lakehouse instances.
_PARSE_CACHE_MAX = 64
_parse_cache: "OrderedDict[str, Snapshot]" = OrderedDict()
_parse_lock = threading.Lock()


def _deserialize_cached(raw: str) -> Snapshot:
    key = hashlib.sha256(raw.encode("utf-8")).hexdigest()
    with _parse_lock:
        hit = _parse_cache.get(key)
        if hit is not None:
            _parse_cache.move_to_end(key)
            return hit
    snap = Snapshot.deserialize(raw)
    with _parse_lock:
        _parse_cache[key] = snap
        _parse_cache.move_to_end(key)
        while len(_parse_cache) > _PARSE_CACHE_MAX:
            _parse_cache.popitem(last=False)
    return snap


def _read_text(path: str) -> str:
    """Read a small metadata file from local FS or an object-store URI
    (one pyarrow.fs code path for both — see iofs.py)."""
    from bazof_spark import iofs

    return iofs.read_text(path)


def _join(base: str, *parts: str) -> str:
    if "://" in base:
        return "/".join([base.rstrip("/"), *parts])
    return os.path.join(base, *parts)


@dataclass(frozen=True)
class Table:
    """One keyed, event-time-versioned table rooted at ``path``."""

    path: str
    name: str

    def current_version(self) -> str:
        """Read ``version.txt`` → snapshot id (crates/azof/src/table.rs:35-41)."""
        version_path = _join(self.path, VERSION_FILE)
        try:
            return _read_text(version_path).strip()
        except (OSError, FileNotFoundError) as exc:
            raise TableNotFoundError(
                f"table {self.name!r}: cannot read {version_path}: {exc}"
            ) from exc

    def get_snapshot(self, version: str) -> Snapshot:
        """Load + deserialize ``s{version}.json`` (table.rs:16-33)."""
        snapshot_path = _join(self.path, f"s{version}.json")
        try:
            raw = _read_text(snapshot_path)
        except (OSError, FileNotFoundError) as exc:
            raise TableNotFoundError(
                f"table {self.name!r}: cannot read {snapshot_path}: {exc}"
            ) from exc
        return _deserialize_cached(raw)

    def get_current_snapshot(self) -> Snapshot:
        return self.get_snapshot(self.current_version())

    def data_file_path(self, file: str) -> str:
        """Absolute path/URI of a data file named in the snapshot."""
        return _join(self.path, file)
