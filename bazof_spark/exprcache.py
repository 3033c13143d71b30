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

Key contract (opt round 2 hardening):

- Entries are scoped to the active SparkContext via a token stored ON
  the context instance (monotonic per-process counter). The previous
  scheme keyed on ``id(sc)``, which CPython may reuse for a new
  context after the old one is garbage-collected — a stale entry
  would then hand out Columns whose py4j gateway handles belong to a
  stopped JVM. The instance-held token cannot alias: a new context
  object starts without the attribute and is assigned a fresh value.
- Callers must key on EVERY parameter their builder closes over, and
  any Column baked into the key must be an UNRESOLVED caller-built
  tree (``F.col``/``F.lit`` compositions) rendered via ``str()``.
  ``str(Column)`` is not injective — ``F.col("1")`` and ``F.lit(1)``
  both render ``Column<'1'>``, and a df-bound (resolved) column from
  one DataFrame can stringify identically to another's — so call
  sites namespace keys with a leading site token and never pass
  df-bound attributes. A resolved column would not crash, but could
  silently serve a tree bound to the wrong plan; the unresolved-only
  rule is what keeps str() keys safe.
- Unhashable key components (e.g. a JSON-loaded list-of-lists merge
  table) fall back to building uncached instead of raising: the cache
  is an optimization, never a behavior change.
"""

from __future__ import annotations

import itertools
from typing import Callable

from pyspark import SparkContext
from pyspark.sql import Column

_CACHE: dict[tuple, object] = {}

# Monotonic per-process context tokens (see module docstring). The
# attribute rides on the SparkContext instance itself, so token
# lifetime exactly matches instance lifetime and id() reuse is moot.
_TOKEN_ATTR = "_bazof_exprcache_token"
_token_counter = itertools.count(1)


def _ctx_token() -> object:
    sc = SparkContext._active_spark_context
    if sc is None:  # no active context: nothing to scope to
        return None
    token = getattr(sc, _TOKEN_ATTR, None)
    if token is None:
        token = next(_token_counter)
        setattr(sc, _TOKEN_ATTR, token)
    return token


def cached_column(key: tuple, builder: Callable[[], Column]) -> Column:
    """Return the Column built by ``builder``, constructing it at most
    once per (SparkContext, key). ``key`` must capture EVERY parameter
    the builder closes over (column names included) and obey the
    module-docstring contract (unresolved Column strings only). An
    unhashable key degrades to an uncached build."""
    full = (_ctx_token(),) + key
    try:
        col = _CACHE.get(full)
    except TypeError:  # unhashable component in the caller's key
        return builder()
    if col is None:
        col = _CACHE[full] = builder()
    return col


def cached_columns(
    key: tuple, builder: Callable[[], list[Column]]
) -> list[Column]:
    """Same contract for builders that return a LIST of Columns (e.g.
    the k per-hash projections of a KMV sketch). The list is copied on
    return so callers may extend it without poisoning the cache."""
    full = (_ctx_token(),) + key
    try:
        cols = _CACHE.get(full)
    except TypeError:
        return list(builder())
    if cols is None:
        cols = _CACHE[full] = builder()
    return list(cols)
