"""PII detection / redaction for training-data pipelines.

Pure Column expressions (regexp_count / regexp_replace chains) — the
whole scrub runs inside whole-stage codegen at parquet-read speed; no
Python round trip. Patterns are RE2-compatible (no backreferences or
lookaround) so the DuckDB oracle evaluates the *same* pattern strings,
making redaction output byte-comparable across engines.

Beyond-reference surface (the reference repo has no text processing);
pattern set follows the common public scrubbers (email / NANP phone /
IPv4 / SSN).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters when redacting: emails first (they contain dots and
# digits that the laxer patterns could partially claim).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\+?[0-9]{1,2}[-. ][0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}

# Replacement tokens deliberately contain no digits/@/dots so a pass
# can never manufacture a match for a later pattern.
PII_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "ssn": "<SSN>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII kind (pre-redaction)."""
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind]))


def redact_pii(text: Column) -> Column:
    """Replace every PII occurrence with its kind token, in the fixed
    precedence order of PII_PATTERNS."""
    out = text
    for kind, pattern in PII_PATTERNS.items():
        out = F.regexp_replace(out, pattern, PII_TOKENS[kind])
    return out
