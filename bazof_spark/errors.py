"""Error types (reference: crates/azof/src/errors.rs)."""


class BazofError(Exception):
    """Base error for the bazof_spark engine."""


class MetadataError(BazofError):
    """Snapshot / segment metadata is malformed."""


class TableNotFoundError(BazofError):
    """Table directory or version pointer missing."""


class SqlRewriteError(BazofError):
    """Time-travel SQL clause is malformed (e.g. invalid timestamp)."""
