"""Adversarial-scale guards for the LSH dedup family.

The degenerate corpus web-scale dedup actually sees — many byte-identical
copies of one boilerplate page — must NOT produce a quadratic band-bucket
self-join. These tests pin the two guards in operators/dedup.py:

- exact-dup pre-collapse: copies fold to one representative before
  banding, so n identical docs contribute ONE banded row, not n (and
  the pair output is linear, not ~n²/2);
- bucket-size cap: candidate buckets larger than `max_bucket_size`
  are dropped before the self-join (mirroring `max_shingle_freq` in
  ngram_jaccard_pairs).
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bazof_spark.operators.dedup import (  # noqa: E402
    _banded_signatures,
    _collapse_exact,
    exact_groups,
    minhash_lsh_pairs,
    minhash_lsh_pairs_between,
    simhash_pairs,
)

BOILERPLATE = (
    "click here to accept cookies and continue to the site "
    "terms of service privacy policy all rights reserved"
)


def _degenerate_corpus(spark, n_copies=10_000):
    """n_copies byte-identical docs + two distinct near-dup docs."""
    copies = spark.range(n_copies).select(
        F.col("id").alias("doc_id"), F.lit(BOILERPLATE).alias("text")
    )
    distinct = spark.createDataFrame(
        [
            (1_000_000, "the quick brown fox jumps over the lazy dog today"),
            (1_000_001, "the quick brown fox jumps over the lazy dog tonight"),
        ],
        "doc_id long, text string",
    )
    return copies.union(distinct)


def test_minhash_identical_corpus_no_blowup(spark):
    """10k identical docs: without the collapse the band self-join would
    emit ~5·10⁷ pairs; with it, banding sees 3 distinct texts and the
    output holds only the one true near-dup pair among representatives."""
    df = _degenerate_corpus(spark)
    rows = minhash_lsh_pairs(df, threshold=0.3).collect()
    ids = {(r["id_a"], r["id_b"]) for r in rows}
    # no pair touches a non-representative copy (doc_id 1..9999)
    assert all(a == 0 or a >= 1_000_000 for a, _ in ids)
    assert all(b == 0 or b >= 1_000_000 for _, b in ids)
    assert (1_000_000, 1_000_001) in ids
    assert len(rows) <= 3  # pairs among the 3 representatives only


def test_minhash_banded_rows_linear_in_distinct_texts(spark):
    """Row bound: what enters the self-join is distinct_texts × bands,
    independent of copy count."""
    df = _degenerate_corpus(spark, n_copies=2_000)
    collapsed = _collapse_exact(df, "text", "doc_id")
    banded = _banded_signatures(collapsed, "text", "doc_id", 32, 8, 3)
    assert banded.count() == 3 * 8


def test_simhash_identical_corpus_no_blowup(spark):
    df = _degenerate_corpus(spark)
    rows = simhash_pairs(df, max_hamming=10, bands=16).collect()
    assert all(
        (r["id_a"] == 0 or r["id_a"] >= 1_000_000)
        and (r["id_b"] == 0 or r["id_b"] >= 1_000_000)
        for r in rows
    )
    assert len(rows) <= 3


def test_bucket_cap_drops_oversized_buckets(spark):
    """With max_bucket_size=1 every shared bucket is oversized, so no
    candidate pairs survive — proving the cap actually gates the join."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta eta"),
        ],
        "doc_id long, text string",
    )
    assert (
        minhash_lsh_pairs(df, threshold=0.1, max_bucket_size=1).count() == 0
    )
    assert simhash_pairs(df, max_hamming=30, bands=32, max_bucket_size=1).count() == 0
    # and with the default cap the near-dup pair IS found
    assert minhash_lsh_pairs(df, threshold=0.1).count() == 1


def test_decontamination_reexpands_exact_copies(spark):
    """Cross-table matching with collapse_exact opted in keeps its exact
    output contract: every byte-identical corpus copy of a matched text
    is reported, even though only the representative went through
    banding — and the default (guards off, zero corpus shuffle) agrees."""
    probe = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (100, "one two three four five six seven eight nine ten"),
            (101, "one two three four five six seven eight nine ten"),
            (102, "one two three four five six seven eight nine ten"),
            (103, "completely unrelated text about medieval basket weaving"),
        ],
        "doc_id long, text string",
    )
    rows = minhash_lsh_pairs_between(
        probe, corpus, threshold=0.5, collapse_exact=True, max_bucket_size=10_000
    ).collect()
    assert {r["corpus_id"] for r in rows} == {100, 101, 102}
    assert all(r["probe_id"] == 1 for r in rows)
    assert all(r["est_jaccard"] == 1.0 for r in rows)
    default_rows = minhash_lsh_pairs_between(probe, corpus, threshold=0.5).collect()
    assert {(r["probe_id"], r["corpus_id"], r["est_jaccard"]) for r in default_rows} == {
        (r["probe_id"], r["corpus_id"], r["est_jaccard"]) for r in rows
    }


def _random_corpus(spark, seed: int, n_docs: int = 60):
    """Distinct-text corpus with planted near-dups (shared prefixes)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(n_docs):
        base = list(rng.choice(vocab, size=12))
        rows.append((d, " ".join(base) + f" uniq{d}"))
        if d % 7 == 0:  # planted near-dup of this doc
            rows.append((1000 + d, " ".join(base) + f" uniq{d}b"))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("seed", [3, 17, 42])
def test_guards_are_pure_scale_protections_minhash(spark, seed):
    """On a benign corpus (no exact dups, no oversized buckets) the
    guards must not change the answer: collapse+cap on == both off."""
    df = _random_corpus(spark, seed)
    on = minhash_lsh_pairs(df, threshold=0.4).collect()
    off = minhash_lsh_pairs(
        df, threshold=0.4, collapse_exact=False, max_bucket_size=None
    ).collect()
    assert sorted(map(tuple, on)) == sorted(map(tuple, off))
    assert len(on) > 0  # planted near-dups were actually found


@pytest.mark.parametrize("seed", [5, 29])
def test_guards_are_pure_scale_protections_simhash(spark, seed):
    df = _random_corpus(spark, seed)
    on = simhash_pairs(df, max_hamming=12, bands=16).collect()
    off = simhash_pairs(
        df, max_hamming=12, bands=16, collapse_exact=False,
        max_bucket_size=None,
    ).collect()
    assert sorted(map(tuple, on)) == sorted(map(tuple, off))
    assert len(on) > 0


def test_exact_groups_mapping(spark):
    df = spark.createDataFrame(
        [(3, "aaa"), (7, "aaa"), (5, "bbb")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["rep_id"] for r in exact_groups(df).collect()}
    assert got == {3: 3, 7: 3, 5: 5}


def test_parameter_validation_raises(spark):
    """Misconfigurations that would silently break recall or correctness
    must fail fast."""
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="divide num_hashes"):
        minhash_lsh_pairs(df, num_hashes=8, bands=16).collect()
    with pytest.raises(ValueError, match="divide num_hashes"):
        minhash_lsh_pairs(df, num_hashes=32, bands=5).collect()
    with pytest.raises(ValueError, match="bands > max_hamming"):
        simhash_pairs(df, max_hamming=4, bands=4).collect()
    from bazof_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [("doc-a", "doc-b")], "id_a string, id_b string"
    )
    with pytest.raises(ValueError, match="integral ids"):
        dedup_clusters(pairs)


def test_exact_dedup_source_priority_winners(spark):
    """Hand-computed winners: listed source beats unlisted regardless of
    id; within a tier the lowest id wins; unlisted sources tie at the
    post-list rank."""
    from bazof_spark.operators.dedup import exact_dedup_source_priority

    rows = [
        # digest group A: curated (listed #0) must beat lower-id crawl
        (1, "same text", "crawl"),
        (2, "same text", "curated"),
        # group B: two unlisted sources -> lowest id wins
        (10, "other text", "webX"),
        (11, "other text", "webY"),
        # group C: listed #1 beats listed #0? NO - curated outranks src5
        (20, "third text", "src5"),
        (21, "third text", "curated"),
        # group D: singleton
        (30, "alone", "crawl"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["digest"]: (r["keep_id"], r["keep_source"], r["n_copies"])
        for r in exact_dedup_source_priority(
            df, priority=["curated", "src5"]
        ).collect()
    }
    winners = {(kid, src, n) for kid, src, n in got.values()}
    assert winners == {
        (2, "curated", 2),
        (10, "webX", 2),
        (21, "curated", 2),
        (30, "crawl", 1),
    }
