"""Corpus-quality workload extensions: repetition/boilerplate signals
and PII redaction. Same contract as workload.py — each query has a
DuckDB oracle with identical column aliases; floats rounded to 6 dp on
both sides.

The PII query synthesizes deterministic PII (email/phone/IPv4/SSN built
from doc_id) onto every document so the detection/redaction regexes are
actually exercised end-to-end, not vacuously matched on zero
occurrences. Patterns are RE2-compatible, so Spark (Java regex) and
DuckDB (RE2) evaluate the very same strings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bazof_spark.functions.redaction import (
    PII_PATTERNS,
    PII_TOKENS,
    pii_count,
    redact_pii,
)
from bazof_spark.functions.repetition import repetition_stats
from bazof_spark.functions.sketch import (
    histogram_quantile,
    histogram_quantile_oracle_sql,
    kmv_distinct_estimate,
    kmv_oracle_sql,
)


def _docs(spark, sf_dir):
    from bazof_spark.sources.tables import load_table, rebalance_if_undersplit

    return rebalance_if_undersplit(spark, load_table(spark, sf_dir, "documents"))


def text_repetition_q(spark, sf_dir):
    return repetition_stats(_docs(spark, sf_dir), n=2)


def _pii_text_col():
    d = F.col("doc_id")
    s = d.cast("string")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"), s, F.lit("@example.org or +1 555-"),
        (d % 900 + 100).cast("string"), F.lit("-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."), (d % 256).cast("string"),
        F.lit("."), ((d * 7) % 256).cast("string"),
        F.lit(" ssn 987-65-"), F.lpad((d % 10000).cast("string"), 4, "0"),
    )


def pii_redaction_q(spark, sf_dir):
    docs = _docs(spark, sf_dir).withColumn("_pii_text", _pii_text_col())
    t = F.col("_pii_text")
    return docs.select(
        "doc_id",
        *[
            pii_count(t, kind).alias(f"n_{kind}")
            for kind in PII_PATTERNS
        ],
        F.md5(redact_pii(t)).alias("redacted_md5"),
    )


_WORDS = "string_split_regex(trim(text), '\\s+')"
_GRAMS2 = (
    f"CASE WHEN len({_WORDS}) >= 2 THEN "
    f"list_transform(range(1, len({_WORDS})), "
    f"i -> array_to_string({_WORDS}[i:i+1], ' ')) "
    f"ELSE [array_to_string({_WORDS}, ' ')] END"
)

_TEXT_REPETITION_ORACLE = f"""
    WITH base AS (
        SELECT doc_id,
               length(text) AS chars,
               round(CASE WHEN len({_WORDS}) > 0
                     THEN 1.0 - len(list_distinct({_WORDS})) / len({_WORDS})
                     ELSE 0.0 END, 6) AS word_rep_ratio,
               unnest({_GRAMS2}) AS gram
        FROM documents
    ),
    cnt AS (
        SELECT doc_id, chars, word_rep_ratio, gram, COUNT(*) AS c
        FROM base GROUP BY ALL
    ),
    top AS (
        SELECT doc_id, chars, word_rep_ratio,
               max(struct_pack(c := c, gram := gram)) AS t
        FROM cnt GROUP BY doc_id, chars, word_rep_ratio
    )
    SELECT doc_id, word_rep_ratio, t.gram AS top_gram,
           round(CASE WHEN chars > 0
                 THEN t.c * length(t.gram) / chars
                 ELSE 0.0 END, 6) AS top_gram_frac
    FROM top
"""

_PII_TEXT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.org or +1 555-'"
    " || CAST(doc_id % 900 + 100 AS VARCHAR) || '-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || ' ssn 987-65-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _pii_oracle() -> str:
    counts = ",\n               ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS n_{kind}"
        for kind, pat in PII_PATTERNS.items()
    )
    redacted = "t"
    for kind, pat in PII_PATTERNS.items():
        redacted = (
            f"regexp_replace({redacted}, '{pat}', '{PII_TOKENS[kind]}', 'g')"
        )
    return f"""
        WITH p AS (SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents)
        SELECT doc_id,
               {counts},
               md5({redacted}) AS redacted_md5
        FROM p
    """


def sketch_distinct_kmv_q(spark, sf_dir):
    """Deterministic distinct-count sketch: estimate distinct customers
    per order priority from orders — one bounded-partial shuffle, the
    sketch profile an HLL rollup would have at 100 TB but
    oracle-checkable bit-for-bit."""
    from bazof_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "cust", F.col("o_custkey").cast("string")
    )
    return kmv_distinct_estimate(
        orders, ["o_orderpriority"], "cust", k=32
    )


_SKETCH_ORACLE = kmv_oracle_sql(
    "(SELECT o_orderpriority, CAST(o_custkey AS VARCHAR) AS cust FROM orders)",
    ["o_orderpriority"],
    "cust",
    k=32,
)


def sketch_kmv_mergeable_q(spark, sf_dir):
    """Sketch RE-AGGREGABILITY end-to-end: build one KMV sketch per
    (event_type, day) — the shape you'd persist daily at 100 TB — then
    MERGE the daily states per event_type and estimate. Because
    min-of-mins equals min-over-union, the merged estimate is
    bit-identical to computing directly on all rows, which is exactly
    what the oracle does: the comparison PROVES the merge loses
    nothing. Both aggregations carry k longs per group per partition;
    history is never rescanned."""
    from bazof_spark.functions.sketch import kmv_estimate, kmv_merge, kmv_sketch
    from bazof_spark.sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("user", F.col("user_id").cast("string"))
        .withColumn("_day", F.to_date("ts"))
    )
    daily = kmv_sketch(ev, ["event_type", "_day"], "user", k=32)
    merged = kmv_merge(daily, ["event_type"], k=32)
    return kmv_estimate(merged, ["event_type"], k=32)


# the oracle computes the estimate DIRECTLY over all rows — equality
# with the Spark side's daily-sketch→merge path is the merge proof
_SKETCH_MERGE_ORACLE = kmv_oracle_sql(
    "(SELECT event_type, CAST(user_id AS VARCHAR) AS user_ FROM events)",
    ["event_type"],
    "user_",
    k=32,
)


_HIST_ARGS = dict(
    group_cols=["l_returnflag"],
    value_col="l_extendedprice",
    lo=900.0,
    hi=105000.0,
    bins=128,
    quantiles=(0.5, 0.95),
)


def sketch_histogram_quantile_q(spark, sf_dir):
    """Fixed-bin histogram quantile estimates per return flag — the
    bounded-partial twin of agg_percentiles' exact (value-buffering)
    percentiles: the exchange carries at most 128 counts per group per
    partition at any scale."""
    from bazof_spark.sources.tables import load_table

    return histogram_quantile(
        load_table(spark, sf_dir, "lineitem"), **_HIST_ARGS
    )


QUERIES_CLEAN = {
    "text_repetition": text_repetition_q,
    "pii_redaction": pii_redaction_q,
    "sketch_distinct_kmv": sketch_distinct_kmv_q,
    "sketch_kmv_mergeable": sketch_kmv_mergeable_q,
    "sketch_histogram_quantile": sketch_histogram_quantile_q,
}

ORACLES_CLEAN = {
    "text_repetition": _TEXT_REPETITION_ORACLE,
    "pii_redaction": _pii_oracle(),
    "sketch_distinct_kmv": _SKETCH_ORACLE,
    "sketch_kmv_mergeable": _SKETCH_MERGE_ORACLE,
    "sketch_histogram_quantile": histogram_quantile_oracle_sql(
        "lineitem", **_HIST_ARGS
    ),
}
