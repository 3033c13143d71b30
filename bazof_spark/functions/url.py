"""URL canonicalization for web-scrape pipelines.

Before URL-level dedup or host-level aggregation, every crawl
pipeline canonicalizes URLs (the CommonCrawl/SURT idea): lowercase
the scheme and host, strip default ports, drop fragments and tracking
parameters, collapse duplicate path slashes, sort the query string.
Two raw spellings of the same resource must map to one key, or URL
dedup undercounts.

Pure Column expressions over ``pyspark.sql.functions`` — regex work
happens in the JVM inside whole-stage codegen, map-only, no Python.
The DuckDB oracle re-runs the same normalization with ITS regex
engine (RE2) and list functions, so the cross-engine check covers the
actual string semantics, not one engine against itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query parameters every pipeline strips: tracking noise that makes
# identical resources look distinct
TRACKING_PREFIXES = ("utm_",)


def url_normalize(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, default ports stripped
    (:80 for http, :443 for https), fragment dropped, path slashes
    collapsed with the trailing slash removed (root keeps its), query
    params de-tracked (utm_*) and sorted. Path case is preserved —
    paths are case-sensitive by spec.

    The tree (18 regex/array/when nodes) depends only on the input
    expression, so it is built once per (process, input-string) and
    reused — the exprcache discipline (opt round 1, change 15): every
    reuse is the identical immutable unresolved tree, hence identical
    plans and results."""
    from bazof_spark.exprcache import cached_column

    try:
        key = ("url_normalize", str(url))
    except Exception:
        return _url_normalize_build(url)
    return cached_column(key, lambda: _url_normalize_build(url))


def _url_normalize_build(url: Column) -> Column:
    no_frag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(
        F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    after = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(after, r"^([^/?]*)", 1))
    host = F.when(
        (scheme == "http"), F.regexp_replace(hostport, ":80$", "")
    ).when(
        (scheme == "https"), F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    pathq = F.regexp_replace(after, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "(.)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    def _keep_param(p: Column) -> Column:
        cond = F.length(p) > 0
        for prefix in TRACKING_PREFIXES:  # fold: the tuple is authoritative
            cond = cond & ~p.startswith(prefix)
        return cond

    params = F.array_sort(F.filter(F.split(query, "&"), _keep_param))
    qnorm = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )


def url_host(url_norm: Column) -> Column:
    """Registrable host of an already-normalized URL."""
    from bazof_spark.exprcache import cached_column

    def _build() -> Column:
        return F.regexp_extract(
            url_norm, r"^[a-z][a-z0-9+.\-]*://([^/?]*)", 1
        )

    try:
        key = ("url_host", str(url_norm))
    except Exception:
        return _build()
    return cached_column(key, _build)
