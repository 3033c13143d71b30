"""Cache for constructed Column expression TREES (opt round 1).

Building a large Column expression from Python costs one py4j round
trip (~0.3 ms) per function call; the banded-minhash and KMV-sketch
builders issue thousands (measured: 4,133 round trips = 1.25 s of
driver latency to CONSTRUCT the decontamination query, before any
execution). The trees these builders produce depend only on their
parameters — column names and integer knobs — never on data, so the
immutable Column object can be built once per process and reused:
every reuse yields the identical Catalyst tree, hence the identical
plan and results. This is the expression-level analogue of the JVM's
codegen cache (one-time cost paid at first use, irrelevant at scale):
no DATA is ever cached here, and a fresh process (every bench/oracle
invocation) still builds from scratch once.

Entries are keyed by the active SparkContext's id so a context restart
within one process (tests) never reuses a Column whose JVM gateway
objects belong to a stopped context.
"""

from __future__ import annotations

from typing import Callable

from pyspark import SparkContext
from pyspark.sql import Column

_CACHE: dict[tuple, object] = {}


def cached_column(key: tuple, builder: Callable[[], Column]) -> Column:
    """Return the Column built by ``builder``, constructing it at most
    once per (SparkContext, key). ``key`` must capture EVERY parameter
    the builder closes over (column names included)."""
    sc = SparkContext._active_spark_context
    full = (id(sc),) + key
    col = _CACHE.get(full)
    if col is None:
        col = _CACHE[full] = builder()
    return col


def cached_columns(
    key: tuple, builder: Callable[[], list[Column]]
) -> list[Column]:
    """Same contract for builders that return a LIST of Columns (e.g.
    the k per-hash projections of a KMV sketch). The list is copied on
    return so callers may extend it without poisoning the cache."""
    sc = SparkContext._active_spark_context
    full = (id(sc),) + key
    cols = _CACHE.get(full)
    if cols is None:
        cols = _CACHE[full] = builder()
    return list(cols)
