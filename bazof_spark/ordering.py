"""Latest-wins ordering structs for the two raw-row sources.

The batch Data Source / ``Lakehouse.scan`` internals and the native
stream reader both expose ``_rank`` and ``_row_idx`` helper columns —
with OPPOSITE ``_rank`` conventions:

- **batch** (``spark.read.format("bazof")``, ``Lakehouse.scan``):
  ``_rank`` is the file-precedence index from the snapshot's pruning
  order (crates/azof/src/metadata.rs:47-73) — LOWER means higher
  precedence (child segments shadow parents, newer deltas shadow
  older);
- **stream** (``spark.readStream.format("bazof")``): ``_rank`` is the
  snapshot VERSION that committed the file — HIGHER means newer.

Consumers that hand-build the ``max_by`` precedence struct for one
source and reuse it on the other silently keep the *oldest* version of
every key. This helper is the one place that knows both conventions;
use it instead of writing the struct inline::

    winner = df.groupBy("key").agg(
        F.max_by(payload, latest_wins_ordering("stream")).alias("_w")
    )

Both variants share the remaining tie-breaks: newest ``event_time``
wins, then the FIRST physical row within a file (``-_row_idx`` — the
reference's intra-file rule, crates/azof/src/lakehouse.rs:54-79, which
its own financials fixture exercises with 5 duplicate (key, event_time)
pairs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bazof_spark.schema import EVENT_TIME_COL

SOURCES = ("batch", "stream")


def latest_wins_ordering(source: str = "batch") -> Column:
    """The ``max_by`` ordering struct under which the maximum row is the
    latest-wins winner for ``source`` (``"batch"`` or ``"stream"``).

    Expects the raw-row columns the corresponding reader emits:
    ``_rank``, ``event_time``, ``_row_idx``.
    """
    if source == "batch":
        # lower _rank = higher file precedence ⇒ negate for max_by
        rank = (-F.col("_rank")).alias("neg_rank")
    elif source == "stream":
        # _rank IS the committing snapshot version ⇒ higher = newer
        rank = F.col("_rank").alias("version")
    else:
        raise ValueError(
            f"source must be one of {SOURCES}, got {source!r}"
        )
    return F.struct(
        rank,
        F.col(EVENT_TIME_COL).alias("ts"),
        (-F.col("_row_idx")).alias("neg_row_idx"),
    )
