"""Byte-pair-encoding tokenizer: bounded-sample training + a pure-JVM
merge-chain encoder.

BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units") is THE tokenizer family of modern LLM pipelines
(GPT-2's byte-level BPE, SentencePiece's BPE mode); token counting
against a trained vocabulary is how every corpus is budgeted. The
reference has no tokenizer (its roadmap stops at tabular scans —
/root/reference/README.md); this continues the repo's LLM-pipeline
brief.

100 TB design in two halves:

* **Training is bounded**: merges are learned driver-side from a fixed
  deterministic sample (the classic recipe — vocab induction never
  needs the full corpus; production trains on a few GB sample exactly
  like this). Cost is O(sample), corpus-size independent.
* **Encoding is map-only and JVM-side**: a trained BPE encodes by
  applying merge rules IN RANK ORDER (equivalent to the greedy
  lowest-rank-pair loop, because a rule can only create pairs whose
  merges were learned later — the standard subword-nmt/GPT-2
  equivalence). Each rule application is one string ``replace`` over a
  canonical representation where every token is space-wrapped
  (``␣tok␣``), so adjacent tokens never share a delimiter and
  left-to-right non-overlapping replacement IS the BPE merge ("aaaa"
  + rule (a,a) → "aa aa", which a single-space encoding gets wrong).
  The whole encoder is therefore a chain of N built-in ``replace``
  expressions inside whole-stage codegen — zero Python in the hot
  path, zero shuffles, and the SQL twin is the same chain of
  ``replace()`` calls, making the output exactly oracle-checkable
  down to an md5 of the tokenized string.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_RE = re.compile(r"[a-z]+")


def word_freqs_from_texts(texts) -> Counter:
    """Lowercase-alpha word frequencies — the training corpus view.
    The [a-z]+ word model matches the encoder's split exactly."""
    freqs: Counter = Counter()
    for t in texts:
        if t:
            freqs.update(_WORD_RE.findall(t.lower()))
    return freqs


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    """Apply one merge left-to-right, non-overlapping — the BPE rule."""
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe_merges(
    word_freqs: dict, n_merges: int = 50
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from word frequencies — the
    Sennrich training loop: repeatedly merge the most frequent adjacent
    symbol pair, frequency-weighted by word counts. Ties break to the
    lexicographically LARGEST pair (any fixed rule works; this one is
    reproducible across engines and Python versions). Stops early if
    no pair repeats."""
    vocab: dict[tuple, int] = {}
    for w, f in word_freqs.items():
        key = tuple(w)
        vocab[key] = vocab.get(key, 0) + f
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab: dict[tuple, int] = {}
        for sym, f in vocab.items():
            m = _merge_word(sym, best)
            new_vocab[m] = new_vocab.get(m, 0) + f
        vocab = new_vocab
    return merges


def bpe_repr(text: Column) -> Column:
    """Canonical pre-merge representation: lowercase-alpha words, each
    character space-wrapped (``␣c␣``), words joined by ``#`` (which can
    never participate in a merge — tokens are alpha-only). Built from
    JVM expressions end-to-end; the tree depends only on the input
    expression, so it is built once per (process, input-string) — the
    exprcache discipline (opt round 1, change 15)."""
    from bazof_spark.exprcache import cached_column

    def _build() -> Column:
        words = F.filter(
            F.split(F.lower(text), "[^a-z]+"), lambda w: F.length(w) > 0
        )
        return F.array_join(
            F.transform(
                words, lambda w: F.regexp_replace(w, "(.)", " $1 ")
            ),
            "#",
        )

    try:
        key = ("bpe_repr", str(text))
    except Exception:
        return _build()
    return cached_column(key, _build)


def apply_merges(col: Column, merges: list[tuple[str, str]]) -> Column:
    """The encoder: one built-in ``replace`` per merge rule, in rank
    order. ``␣a␣␣b␣ → ␣ab␣`` — every token carries its own delimiters,
    so non-overlapping replacement merges newly-adjacent occurrences
    exactly like the greedy loop.

    The chain (one replace node per rule, N≈vocab size) is keyed on
    the input expression's string AND the merge list itself (opt
    round 1, change 15 — the BM25 precedent: model values are part of
    the key, so retrained merges always yield a fresh tree; trees are
    cached, never data)."""
    from bazof_spark.exprcache import cached_column

    def _build() -> Column:
        out = col
        for a, b in merges:
            out = F.replace(
                out, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} ")
            )
        return out

    try:
        # normalize so JSON-loaded list-of-lists merges hash (and hit
        # the same entry as the equivalent list-of-tuples)
        key = ("bpe_apply_merges", str(col), tuple(map(tuple, merges)))
    except Exception:
        return _build()
    return cached_column(key, _build)


def bpe_tokenize_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with the trained merges and emit exact,
    hashable evidence: (id, n_words, n_chars, n_tokens, digest) where
    n_tokens counts post-merge tokens (every token contributes exactly
    two spaces to the representation) and digest is the md5 of the
    full tokenized string — any divergence anywhere in the merge chain
    changes it. Map-only, all whole-stage-codegen expressions."""
    from bazof_spark.exprcache import cached_columns

    # the whole select list depends only on the column names and the
    # trained merges (keyed like apply_merges — retrained merges yield
    # a fresh tree); built once per process (opt round 1, change 15)
    def _cols() -> list:
        words = F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z]+"),
            lambda w: F.length(w) > 0,
        )
        encoded = apply_merges(bpe_repr(F.col(text_col)), merges)
        return [
            F.col(id_col),
            F.size(words).cast("int").alias("n_words"),
            F.aggregate(
                words, F.lit(0), lambda acc, w: acc + F.length(w)
            ).cast("long").alias("n_chars"),
            (
                (
                    F.length(encoded)
                    - F.length(F.replace(encoded, F.lit(" ")))
                )
                / 2
            ).cast("long").alias("n_tokens"),
            F.md5(encoded.cast("binary")).alias("digest"),
        ]

    try:
        # same normalization as apply_merges: list-of-lists merges hash
        key = ("bpe_tokenize_stats", id_col, text_col, tuple(map(tuple, merges)))
    except Exception:
        return df.select(*_cols())
    return df.select(*cached_columns(key, _cols))
