"""Error types (reference: crates/azof/src/errors.rs)."""


class BazofError(Exception):
    """Base error for the bazof_spark engine."""


class MetadataError(BazofError):
    """Snapshot / segment metadata is malformed."""


class TableNotFoundError(BazofError):
    """Table directory or version pointer missing."""


class SqlRewriteError(BazofError):
    """Time-travel SQL clause is malformed (e.g. invalid timestamp)."""


class CommitConflictError(BazofError):
    """Another writer published a snapshot while this commit ran
    (optimistic concurrency check at publish time). Re-read the table
    and retry; any already-written delta files are unreferenced and
    will be collected by vacuum_table."""
