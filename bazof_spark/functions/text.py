"""Text-analysis functions for large-scale training-data pipelines.

All pure Column expressions over ``pyspark.sql.functions`` — they stay
inside whole-stage codegen (no Python round trip), so a 100 TB documents
scan runs at parquet-read speed. Each has an exactly-equivalent ANSI-SQL
formulation (see ``__spark_entry__.oracle_sql``) used as the DuckDB
correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A BPE-ish token: word chars, or a single non-word non-space symbol —
# deterministic and cheap, standing in for a real tokenizer's count.
TOKEN_REGEX = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"

WORD_REGEX = r"[A-Za-z0-9_]+"

# Marker stopwords per language for the n-gram/keyword language-ID
# heuristic. Deterministic and tiny on purpose: language ID at scale is
# a per-row expression, not a model inference.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "las", "una"),
    "fr": ("le", "la", "les", "des", "une", "est", "dans", "pour"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
}


def word_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(WORD_REGEX))


def token_count(text: Column) -> Column:
    """Whitespace+symbol token count (the TOKEN_REGEX semantic),
    computed as word runs + symbol chars: exactly the alternation's
    match count, but 4× faster in Spark's regex path because the
    negated-class branch never runs (see punct_count). The SQL oracles
    keep the literal TOKEN_REGEX form."""
    return (word_count(text) + punct_count(text)).cast("int")


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_count(text: Column) -> Column:
    """Count of chars outside [\\sA-Za-z0-9_], computed by the identity
    ``length − word-chars − whitespace`` instead of a negated character
    class: Spark's regex path evaluates NEGATED classes ~10-20× slower
    than positive ones (measured 28.5 s vs 2.6 s over the 100× corpus
    for the identical zero-match count — the JVM matcher loses its
    fast scan path), and this count sits inside every quality/gopher
    expression on the 100 TB table. Value-identical for BMP text (one
    UTF-16 unit per char, which regexp_count also assumes)."""
    return (
        F.length(text)
        - F.regexp_count(text, F.lit(r"[A-Za-z0-9_]"))
        - F.regexp_count(text, F.lit(r"\s"))
    )


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    punct = punct_count(text)
    return F.when(F.length(text) > 0, punct / F.length(text)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Stopword tokens / word tokens (0 for wordless docs)."""
    pattern = r"(?i)\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    hits = F.regexp_count(text, F.lit(pattern))
    words = word_count(text)
    return F.when(words > 0, hits / words).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    letters = F.regexp_count(text, F.lit(r"[A-Za-z0-9_]"))
    words = word_count(text)
    return F.when(words > 0, letters / words).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    healthy stopword rate + sane mean word length. Deterministic
    arithmetic only — reproducible in ANSI SQL for the oracle."""
    n = F.length(text)
    length_component = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_component = F.greatest(
        F.lit(0.0), F.lit(1.0) - punct_ratio(text) * F.lit(4.0)
    )
    stop_component = F.least(stopword_ratio(text) * F.lit(5.0), F.lit(1.0))
    mwl = mean_word_length(text)
    mwl_component = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return (
        length_component * F.lit(0.4)
        + punct_component * F.lit(0.3)
        + stop_component * F.lit(0.2)
        + mwl_component * F.lit(0.1)
    )


def language_id(text: Column) -> Column:
    """Keyword-marker language ID: count marker-word hits per language,
    argmax wins; ties and zero-hit docs → 'und'. Deterministic argmax:
    higher count wins, then lexicographically smaller language code."""
    scored = None
    for code in sorted(LANG_MARKERS):
        pattern = r"(?i)\b(" + "|".join(LANG_MARKERS[code]) + r")\b"
        hits = F.regexp_count(text, F.lit(pattern))
        # struct(count DESC via max of (count, reversed code)) — encode
        # lexicographic preference by comparing on (hits, neg-ordinal)
        entry = F.struct(
            hits.alias("hits"),
            F.lit(-sorted(LANG_MARKERS).index(code)).alias("pref"),
            F.lit(code).alias("code"),
        )
        scored = entry if scored is None else F.greatest(scored, entry)
    return F.when(scored["hits"] > 0, scored["code"]).otherwise(F.lit("und"))


def shingles(text: Column, k: int = 3) -> Column:
    """Word k-gram shingles as an array<string> (consecutive words joined
    by a single space). Built-ins only — and the word split is LET-BOUND
    through a 1-element transform so it evaluates once per row: an
    inline `words` expression inside the per-offset lambda would re-run
    the \\s+ regex split for every shingle, O(words × text) per row
    (measured 2.1× slower on the documents corpus). Same trick as the
    dsir.py token materialization, expression-level because this
    function must stay composable as a Column."""

    def _over(words: Column) -> Column:
        n = F.size(words)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.array_join(F.slice(words, i + 1, k), " "),
            ),
        ).otherwise(F.array(F.array_join(words, " ")))

    return F.element_at(
        F.transform(F.array(F.split(F.trim(text), r"\s+")), _over), 1
    )


def fingerprint(text: Column, k: int = 5) -> Column:
    """Document fingerprint: minimum md5 over word k-gram shingles —
    a winnowing-style rolling fingerprint that is stable under document
    reordering-free edits and cheap to compare for containment/near-dup
    prefilters. md5 (not xxhash) so DuckDB reproduces it bit-for-bit."""
    return F.array_min(F.transform(shingles(text, k), F.md5))


def nfc_normalize(text: Column) -> Column:
    """Unicode NFC normalization — the canonical-composition pass every
    text pipeline runs before dedup/hashing (decomposed "e"+U+0301 and
    composed "é" must hash identically or near-dup families split).
    Spark has no normalization builtin, so this is an Arrow-batched
    pandas UDF over CPython's ``unicodedata`` (the Unicode reference
    data, a genuinely independent implementation from the DuckDB
    oracle's utf8proc-backed ``nfc_normalize`` — the cross-engine pair
    checks the actual normalization tables, not one library against
    itself). Map-only; at 100 TB this is a per-row string pass with no
    exchange."""
    import pandas as pd  # noqa: F401  (env-guaranteed)
    import unicodedata

    @F.pandas_udf("string")
    def _nfc(s):
        return s.map(
            lambda x: None if x is None else unicodedata.normalize("NFC", x)
        )

    return _nfc(text)
