"""BPE tokenizer tests: the rank-order replace chain must equal the
greedy lowest-rank-pair loop (the equivalence the JVM encoder relies
on), the trainer must be deterministic, and the Spark encode must
match the Python reference token-for-token."""

import random

import pytest
from pyspark.sql import functions as F

from bazof_spark.operators.bpe import (
    _merge_word,
    apply_merges,
    bpe_repr,
    bpe_tokenize_stats,
    train_bpe_merges,
    word_freqs_from_texts,
)


def greedy_encode(word: str, merges) -> tuple:
    """The textbook encoder: repeatedly merge the lowest-rank pair."""
    ranks = {m: i for i, m in enumerate(merges)}
    sym = tuple(word)
    while True:
        best, bi = None, None
        for a, b in zip(sym, sym[1:]):
            r = ranks.get((a, b))
            if r is not None and (bi is None or r < bi):
                best, bi = (a, b), r
        if best is None:
            return sym
        sym = _merge_word(sym, best)


def chain_encode(word: str, merges) -> tuple:
    """Python mirror of the replace-chain encoder."""
    s = "".join(f" {c} " for c in word)
    for a, b in merges:
        s = s.replace(f" {a}  {b} ", f" {a}{b} ")
    return tuple(s.split())


TEXTS = [
    "the quick brown fox jumps over the lazy dog " * 3,
    "aaaa aaa aa baaab abab banana bandana",
    "lower lowest newer newest wider widest",
]


def test_chain_equals_greedy_fuzz():
    merges = train_bpe_merges(word_freqs_from_texts(TEXTS), 40)
    rng = random.Random(42)
    words = list(word_freqs_from_texts(TEXTS)) + ["aaaaaaa", "banananana"]
    for _ in range(400):
        words.append(
            "".join(rng.choice("abcdeno") for _ in range(rng.randint(1, 14)))
        )
    for w in words:
        assert greedy_encode(w, merges) == chain_encode(w, merges), w


def test_trainer_deterministic_and_freq_ordered():
    f = word_freqs_from_texts(["aa ab aa ab aa"])
    m = train_bpe_merges(f, 3)
    assert m[0] == ("a", "a")  # freq 3 beats ('a','b') freq 2
    assert m == train_bpe_merges(f, 3)
    # early stop: no pair repeats after everything merged
    assert len(train_bpe_merges({"ab": 1}, 10)) == 1


def test_spark_encode_matches_python_reference(spark):
    rows = [(i, t) for i, t in enumerate(TEXTS)] + [
        (90, ""),
        (91, "NO lowercase 123 !!"),
        (92, "MiXeD CaSe BaNaNa"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = train_bpe_merges(word_freqs_from_texts(TEXTS), 30)
    got = {
        r["doc_id"]: r
        for r in bpe_tokenize_stats(df, merges).collect()
    }
    import re

    for doc_id, text in rows:
        words = re.findall(r"[a-z]+", text.lower())
        toks = [t for w in words for t in chain_encode(w, merges)]
        r = got[doc_id]
        assert r["n_words"] == len(words)
        assert r["n_chars"] == sum(len(w) for w in words)
        assert r["n_tokens"] == len(toks), (doc_id, toks)
    # compression happened: the seen corpus tokenizes shorter than chars
    assert got[0]["n_tokens"] < got[0]["n_chars"]


def test_repr_and_merge_columns_roundtrip(spark):
    df = spark.createDataFrame([(0, "abab aa")], ["doc_id", "text"])
    merges = [("a", "b"), ("ab", "ab")]
    out = df.select(
        apply_merges(bpe_repr(F.col("text")), merges).alias("enc")
    ).collect()[0]["enc"]
    assert out == " abab # a  a "
