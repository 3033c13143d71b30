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

import os
from dataclasses import dataclass

from bazof_spark.errors import TableNotFoundError
from bazof_spark.metadata import Snapshot

VERSION_FILE = "version.txt"


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
        return Snapshot.deserialize(raw)

    def get_current_snapshot(self) -> Snapshot:
        return self.get_snapshot(self.current_version())

    def data_file_path(self, file: str) -> str:
        """Absolute path/URI of a data file named in the snapshot."""
        return _join(self.path, file)
