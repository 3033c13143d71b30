"""As-of query-time selector (reference: crates/azof/src/as_of.rs:3-7).

``AsOf`` is either ``Current`` (latest open-ended state) or
``EventTime(datetime)`` (point-in-time over the event-time axis). All
timestamps are timezone-aware UTC; the metadata format carries RFC3339
with millisecond precision, but the engine itself accepts microsecond
precision (Spark's native ``TimestampType`` resolution — a documented
superset of the reference's ms resolution).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

# RFC3339 with milliseconds, e.g. 2024-01-01T00:00:00.000Z
# (reference: crates/azof/src/metadata.rs:111).
RFC3339_MS = "%Y-%m-%dT%H:%M:%S.%f"


def parse_rfc3339(value: str) -> datetime:
    """Parse an RFC3339 timestamp string to an aware UTC datetime.

    Mirrors chrono's ``DateTime::parse_from_rfc3339`` acceptance
    (reference: crates/azof/src/metadata.rs:122-127): requires an explicit
    offset (``Z`` or ``+HH:MM``); fractional seconds optional.
    """
    s = value.strip()
    if s.endswith(("Z", "z")):
        s = s[:-1] + "+00:00"
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        raise ValueError(f"RFC3339 timestamp requires an offset: {value!r}")
    return dt.astimezone(timezone.utc)


def format_rfc3339_ms(dt: datetime) -> str:
    """Format an aware datetime as RFC3339 with millisecond precision."""
    dt = dt.astimezone(timezone.utc)
    return dt.strftime(RFC3339_MS)[:-3] + "Z"


def epoch_millis(dt: datetime) -> int:
    """Epoch milliseconds — used for versioned temp-view suffixes
    (reference: crates/azof-datafusion/src/parse.rs:73)."""
    return int(dt.timestamp() * 1000)


@dataclass(frozen=True)
class AsOf:
    """Query-time selector. ``AsOf.current()`` or ``AsOf.event_time(dt)``."""

    event_time_at: datetime | None = None

    @staticmethod
    def current() -> "AsOf":
        return Current

    @staticmethod
    def event_time(dt: datetime | str) -> "AsOf":
        if isinstance(dt, str):
            dt = parse_rfc3339(dt)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return AsOf(event_time_at=dt.astimezone(timezone.utc))

    @property
    def is_current(self) -> bool:
        return self.event_time_at is None

    def __repr__(self) -> str:  # pragma: no cover
        if self.is_current:
            return "AsOf.Current"
        return f"AsOf.EventTime({self.event_time_at.isoformat()})"


Current = AsOf()


def EventTime(dt: datetime | str) -> AsOf:  # noqa: N802 - mirrors reference enum variant
    return AsOf.event_time(dt)


def coerce_as_of(as_of: AsOf | datetime | str | None) -> AsOf:
    """Accept ``None`` (Current), a datetime, an RFC3339 string, or AsOf."""
    if as_of is None:
        return Current
    if isinstance(as_of, AsOf):
        return as_of
    return AsOf.event_time(as_of)
