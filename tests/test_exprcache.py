"""The expression-tree cache (opt round 1): construction reuse must be
identity-level (same Column object per key) and must never change what
a query computes."""

from pyspark.sql import functions as F

from bazof_spark.exprcache import _CACHE, cached_column, cached_columns
from bazof_spark.operators.dedup import minhash_signature


def test_cached_column_identity_per_key(spark):  # noqa: F811
    a = cached_column(("t1", 1), lambda: F.lit(1) + F.lit(2))
    b = cached_column(("t1", 1), lambda: F.lit(99))  # builder must not run
    assert a is b
    c = cached_column(("t1", 2), lambda: F.lit(3))
    assert c is not a


def test_cached_columns_returns_copy(spark):  # noqa: F811
    xs = cached_columns(("t2",), lambda: [F.lit(1), F.lit(2)])
    xs.append(F.lit(3))
    ys = cached_columns(("t2",), lambda: [])
    assert len(ys) == 2  # caller's append did not poison the cache


def test_minhash_signature_cached_and_equal(spark):  # noqa: F811
    s1 = minhash_signature(F.col("text"), 32, 3)
    s2 = minhash_signature(F.col("text"), 32, 3)
    assert s1 is s2  # one tree per (expr, num_hashes, k)
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "an entirely different text body here")],
        "id long, text string",
    )
    rows = df.select("id", s1.alias("sig")).orderBy("id").collect()
    assert rows[0]["sig"] == rows[1]["sig"]  # identical text, identical sig
    assert rows[0]["sig"] != rows[2]["sig"]
    # REUSING the cached tree twice in ONE plan (probe + corpus side of
    # a cross-table query) must resolve cleanly
    both = df.select(s1.alias("a"), s2.alias("b")).collect()
    assert all(r["a"] == r["b"] for r in both)


def test_cache_keys_are_context_scoped(spark):  # noqa: F811
    cached_column(("t3",), lambda: F.lit(1))
    assert any(k[1:] == ("t3",) for k in _CACHE)
    # every key carries the active context id as its first element
    assert all(isinstance(k[0], int) for k in _CACHE)
