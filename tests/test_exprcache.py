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


def test_url_normalize_cached_and_keyed_on_input(spark):  # noqa: F811
    """Change 15: url_normalize/url_host build once per (process,
    input-string) and distinct inputs get distinct trees."""
    from bazof_spark.functions.url import url_host, url_normalize

    a1 = url_normalize(F.col("u"))
    a2 = url_normalize(F.col("u"))
    assert a1 is a2
    b = url_normalize(F.col("v"))
    assert b is not a1
    h1 = url_host(F.col("n"))
    assert url_host(F.col("n")) is h1
    df = spark.createDataFrame(
        [("HTTP://WWW.X.COM:80//a//b/?utm_source=f&b=2&a=1#frag",),
         ("http://www.x.com/a/b?a=1&b=2",)],
        "u string",
    )
    rows = df.select(a1.alias("n")).collect()
    # both raw spellings canonicalize to the same resource
    assert rows[0]["n"] == rows[1]["n"] == "http://www.x.com/a/b?a=1&b=2"


def test_chunk_documents_cache_keyed_on_knobs(spark):  # noqa: F811
    """Change 15: chunk_documents reuses its select lists per knob set;
    different knobs must NOT share trees, and results are unchanged."""
    from bazof_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20)))], "doc_id long, text string"
    )
    out1 = chunk_documents(df, chunk_tokens=8, overlap=0).collect()
    out2 = chunk_documents(df, chunk_tokens=8, overlap=0).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    assert len(out1) == 3  # ceil(20/8)
    assert out1[0]["chunk_text"].split() == [f"w{i}" for i in range(8)]
    # different knobs -> different chunking (distinct cached trees)
    out3 = chunk_documents(df, chunk_tokens=10, overlap=5).collect()
    assert len(out3) == 3  # ceil((20-5)/5)
    assert out3[1]["chunk_text"].split()[0] == "w5"


def test_bpe_apply_merges_keyed_on_merges(spark):  # noqa: F811
    """Change 15: the encode chain is keyed on the MERGE LIST itself —
    retrained merges must yield a fresh tree (the BM25 precedent:
    trees are cached, never data)."""
    from bazof_spark.operators.bpe import apply_merges, bpe_repr

    rep = bpe_repr(F.col("t"))
    assert bpe_repr(F.col("t")) is rep
    m1 = [("a", "b")]
    m2 = [("a", "b"), ("ab", "c")]
    e1 = apply_merges(rep, m1)
    assert apply_merges(rep, m1) is e1
    e2 = apply_merges(rep, m2)
    assert e2 is not e1
    df = spark.createDataFrame([("abc",)], "t string")
    r1 = df.select(e1.alias("x")).collect()[0]["x"]
    r2 = df.select(e2.alias("x")).collect()[0]["x"]
    assert r1 == " ab  c "   # one merge applied
    assert r2 == " abc "     # second-stage merge applied


def test_context_tokens_never_alias_across_instances(spark):  # noqa: F811
    """Opt round 2 hardening (VERDICT r12 item 8): cache scoping keys
    on a token stored ON the context instance, not id(sc) — CPython
    can hand a new context the id of a garbage-collected old one, and
    a stale entry would serve Columns whose gateway handles belong to
    a stopped JVM. Distinct instances must get distinct tokens even
    when their id() collides."""
    from pyspark import SparkContext

    from bazof_spark.exprcache import _TOKEN_ATTR, _ctx_token

    class _FakeCtx:
        pass

    real = SparkContext._active_spark_context
    try:
        tokens = set()
        for _ in range(3):
            fake = _FakeCtx()
            SparkContext._active_spark_context = fake
            t1 = _ctx_token()
            assert _ctx_token() == t1  # stable per instance
            tokens.add(t1)
            del fake  # id() is now reusable by the next instance
        assert len(tokens) == 3  # no aliasing across instances
    finally:
        SparkContext._active_spark_context = real
    # the real context keeps its own stable token
    assert getattr(real, _TOKEN_ATTR, None) == _ctx_token()


def test_unhashable_key_degrades_to_uncached_build(spark):  # noqa: F811
    """ADVICE r12: an unhashable key component (JSON-loaded
    list-of-lists merges) must fall back to building, not raise."""
    calls = []

    def _build():
        calls.append(1)
        return F.lit(7)

    col = cached_column(("t_unhashable", ["a", "b"]), _build)
    assert calls == [1]
    cached_column(("t_unhashable", ["a", "b"]), _build)
    assert calls == [1, 1]  # uncached: builder runs each time
    cols = cached_columns(("t_unhashable2", {"k": 1}), lambda: [col])
    assert len(cols) == 1


def test_bpe_merges_accept_json_loaded_lists(spark):  # noqa: F811
    """ADVICE r12: a list-of-lists merge table (json.load output) must
    work through apply_merges and bpe_tokenize_stats, and hit the same
    cache entry as the equivalent list-of-tuples."""
    from bazof_spark.operators.bpe import apply_merges, bpe_repr, bpe_tokenize_stats

    rep = bpe_repr(F.col("t"))
    as_lists = [["a", "b"]]
    as_tuples = [("a", "b")]
    e1 = apply_merges(rep, as_lists)
    e2 = apply_merges(rep, as_tuples)
    assert e1 is e2  # normalized key: same entry
    df = spark.createDataFrame([("abc",)], "t string")
    assert df.select(e1.alias("x")).collect()[0]["x"] == " ab  c "
    stats = bpe_tokenize_stats(
        df.select(F.col("t").alias("text"), F.lit(1).alias("doc_id")),
        as_lists,
    ).collect()
    assert stats[0]["n_tokens"] == 2  # 'ab', 'c'
