"""Unit tests for the corpus-quality signals: repetition stats and PII
redaction, on crafted rows where the expected values are hand-computable
(the oracle-parity test covers the documents-table scale path).
"""

from pyspark.sql import functions as F

from bazof_spark.functions.redaction import pii_count, redact_pii
from bazof_spark.functions.repetition import (
    repetition_stats,
    word_repetition_ratio,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_repetition_ratio(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d"),          # all distinct -> 0
            (2, "a a a a"),          # 1 distinct of 4 -> 0.75
            (3, "x y x y"),          # 2 of 4 -> 0.5
        ],
    ).select("doc_id", F.round(word_repetition_ratio(F.col("text")), 6).alias("r"))
    got = {r["doc_id"]: r["r"] for r in df.collect()}
    assert got == {1: 0.0, 2: 0.75, 3: 0.5}


def test_repetition_stats_top_bigram(spark):
    # "to be to be or" -> bigrams: "to be" x2, "be to", "be or" x1 each
    df = repetition_stats(_docs(spark, [(7, "to be to be or")]), n=2)
    row = df.collect()[0]
    assert row["top_gram"] == "to be"
    # 2 occurrences * 5 chars / 14 chars total
    assert abs(row["top_gram_frac"] - round(2 * 5 / 14, 6)) < 1e-9
    assert abs(row["word_rep_ratio"] - round(1 - 3 / 5, 6)) < 1e-9


def test_repetition_stats_tie_breaks_to_greatest_gram(spark):
    # "b b a a": bigrams "b b", "b a", "a a" all x1 -> max struct picks
    # the lexicographically greatest gram at the tied count.
    df = repetition_stats(_docs(spark, [(1, "b b a a")]), n=2)
    assert df.collect()[0]["top_gram"] == "b b"


def test_pii_counts_and_redaction(spark):
    text = (
        "write bob.smith+x@corp.example.com or call +1 555-867-5309, "
        "server 192.168.0.1, ssn 123-45-6789 end"
    )
    df = _docs(spark, [(1, text)]).select(
        pii_count(F.col("text"), "email").alias("e"),
        pii_count(F.col("text"), "phone").alias("p"),
        pii_count(F.col("text"), "ipv4").alias("i"),
        pii_count(F.col("text"), "ssn").alias("s"),
        redact_pii(F.col("text")).alias("red"),
    )
    row = df.collect()[0]
    assert (row["e"], row["p"], row["i"], row["s"]) == (1, 1, 1, 1)
    assert row["red"] == (
        "write <EMAIL> or call <PHONE>, server <IP>, ssn <SSN> end"
    )


def test_redaction_is_idempotent_and_clean_text_untouched(spark):
    clean = "no personal data here just words"
    df = _docs(spark, [(1, clean)]).select(
        redact_pii(redact_pii(F.col("text"))).alias("red")
    )
    assert df.collect()[0]["red"] == clean


def test_kmv_distinct_estimate_accuracy(spark):
    from bazof_spark.functions.sketch import kmv_distinct_estimate

    # 2000 distinct values repeated 3x: estimate within ~3/sqrt(k)=53%
    # of truth (k=32); deterministic, so this is a fixed number, not a
    # flaky statistical bound.
    df = spark.range(6000).select(
        F.lit("g").alias("grp"), (F.col("id") % 2000).cast("string").alias("v")
    )
    row = kmv_distinct_estimate(df, ["grp"], "v", k=32).collect()[0]
    assert row["n_rows"] == 6000
    assert 1000 < row["distinct_est"] < 4000


def test_histogram_quantile_within_one_bin_of_exact(spark):
    from bazof_spark.functions.sketch import histogram_quantile

    df = spark.range(10000).select(
        F.lit("g").alias("grp"), (F.col("id") % 1000).cast("double").alias("v")
    )
    row = histogram_quantile(
        df, ["grp"], "v", lo=0.0, hi=1000.0, bins=100, quantiles=(0.5, 0.95)
    ).collect()[0]
    assert row["n_rows"] == 10000
    # true p50=499.5, p95=949.5 (uniform 0..999); bin width 10 -> the
    # upper-edge estimate is within one bin of the exact value
    assert abs(row["q50_est"] - 500.0) <= 10.0
    assert abs(row["q95_est"] - 950.0) <= 10.0


def test_unigram_lm_scores_exact_math(spark):
    """Hand-computed add-1 unigram log-probs: vocab from a 2-doc trusted
    corpus, OOV scored through the cnt=0 slot, fluent text ranked above
    gibberish."""
    import math

    from bazof_spark.operators.lm import (
        lm_quality_select,
        train_unigram_lm,
        unigram_logprob,
    )

    trusted = spark.createDataFrame(
        [("t1", "the cat sat"), ("t2", "the cat ran")], "id string, text string"
    )
    model = train_unigram_lm(trusted, vocab_size=3)
    got = {r["token"]: r["cnt"] for r in model.collect()}
    # counts: the=2 cat=2 sat=1 ran=1; top-3 tie-break by token ASC
    assert got == {"the": 2, "cat": 2, "ran": 1}

    docs = spark.createDataFrame(
        [("d1", "the cat"), ("d2", "zz qq")], "doc_id string, text string"
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_logprob(docs, model).collect()
    }
    total, v = 5, 3  # sum(cnt), |vocab|
    denom = total + 1.0 * (v + 1)
    lp = lambda c: math.log((c + 1.0) / denom)
    assert out["d1"][0] == 2
    assert abs(out["d1"][1] - (lp(2) + lp(2)) / 2) < 1e-12
    assert abs(out["d2"][1] - lp(0)) < 1e-12  # both tokens OOV
    assert out["d1"][1] > out["d2"][1]

    kept = lm_quality_select(docs, model, keep_fraction=0.5)
    assert [r["doc_id"] for r in kept.collect()] == ["d1"]
    # exact budget: 0.0 keeps NOTHING (percent_rank would keep the top)
    assert lm_quality_select(docs, model, keep_fraction=0.0).count() == 0


def test_bigram_lm_interpolation_exact_math(spark):
    """Hand-computed interpolated bigram log-probs: seen context uses
    λ·p_bi + (1-λ)·p_uni, unseen context and first token fall back to
    pure unigram."""
    import math

    from bazof_spark.operators.lm import (
        bigram_logprob,
        train_bigram_lm,
        train_unigram_lm,
    )

    trusted = spark.createDataFrame(
        [("t1", "a b a b"), ("t2", "a b c")], "id string, text string"
    )
    uni = train_unigram_lm(trusted, vocab_size=10)
    bi = train_bigram_lm(trusted, max_bigrams=10)
    got_bi = {
        (r["prev"], r["tok"]): r["cnt"] for r in bi.collect()
    }
    # pairs: t1 → (a,b),(b,a),(a,b); t2 → (a,b),(b,c)
    assert got_bi == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}

    docs = spark.createDataFrame([("d1", "a b z")], "doc_id string, text string")
    out = bigram_logprob(docs, uni, bi, lam=0.5).collect()[0]
    # unigram: a=3 b=3 c=1, total=7, V=3 → p_uni(t) = (cnt+1)/11
    pu = lambda c: (c + 1.0) / 11.0
    # token 'a': first token → p_uni(3)
    # token 'b': ctx 'a' seen (ptot=3): 0.5*(3/3) + 0.5*pu(3)
    # token 'z': ctx 'b' seen (ptot=2): 0.5*(0/2) + 0.5*pu(0)
    exp = (
        math.log(pu(3))
        + math.log(0.5 * 1.0 + 0.5 * pu(3))
        + math.log(0.5 * 0.0 + 0.5 * pu(0))
    ) / 3
    assert out["n_tokens"] == 3
    assert abs(out["avg_logprob"] - exp) < 1e-12


def test_quality_lr_distills_the_rule_filter(spark):
    """The distilled model: (a) features_py twins the Column features
    exactly, (b) training is deterministic, (c) out-of-sample agreement
    with the Gopher rule on the full sf0.001 corpus stays high — the
    whole point of distillation (measured 0.92; pinned with slack)."""
    import numpy as np

    from bazof_spark.operators.quality import (
        distill_quality_lr,
        feature_columns,
        features_py,
        quality_lr_score,
    )
    from bazof_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # (a) Python twins == Column features, bit-exact
    sample = docs.orderBy("doc_id").limit(20).select(
        "text", *[c.alias(f"f{i}") for i, c in
                  enumerate(feature_columns(F.col("text")))]
    ).collect()
    for r in sample:
        got = features_py(r["text"])
        want = np.array([r[f"f{i}"] for i in range(5)])
        assert np.array_equal(got, want), (got, want)
    # (b) deterministic
    m1 = distill_quality_lr(docs, sample_rows=128)
    m2 = distill_quality_lr(docs, sample_rows=128)
    assert m1 == m2
    # (c) out-of-sample agreement with the rule filter
    from bazof_spark.workload import QUERIES

    pred = {
        r["doc_id"]: r["predicted_keep"]
        for r in quality_lr_score(docs, distill_quality_lr(docs)).collect()
    }
    rule = {
        r["doc_id"]: r["keep"]
        for r in QUERIES["gopher_quality_filter"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    agree = sum(pred[d] == rule[d] for d in rule) / len(rule)
    assert agree >= 0.85, f"distillation agreement too low: {agree}"


def test_nfc_normalize_composes_and_is_idempotent(spark):
    import unicodedata

    from bazof_spark.functions.text import nfc_normalize

    decomposed = "résumé Ångström"
    df = _docs(spark, [(0, decomposed), (1, "plain ascii"), (2, "")])
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            nfc_normalize(F.col("text")).alias("nrm"),
            F.length("text").alias("lr"),
        ).collect()
    }
    assert out[0]["nrm"] == unicodedata.normalize("NFC", decomposed)
    assert len(out[0]["nrm"]) < out[0]["lr"]  # marks composed away
    assert out[1]["nrm"] == "plain ascii" and out[2]["nrm"] == ""


def test_url_normalize_canonical_cases(spark):
    from bazof_spark.functions.url import url_host, url_normalize

    rows = [
        (0, "HTTP://WWW.Ex.COM:80//a//b/?utm_source=x&b=2&a=1#frag"),
        (1, "https://ex.com:443/"),
        (2, "http://ex.com:8080/Keep/Case/"),
        (3, "https://ex.com"),
        (4, "http://ex.com/?utm_source=only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: (r["n"], r["h"])
        for r in df.select(
            "doc_id",
            url_normalize(F.col("url")).alias("n"),
            url_host(url_normalize(F.col("url"))).alias("h"),
        ).collect()
    }
    assert got[0] == ("http://www.ex.com/a/b?a=1&b=2", "www.ex.com")
    assert got[1] == ("https://ex.com/", "ex.com")
    # non-default port kept, path case preserved, trailing slash dropped
    assert got[2] == ("http://ex.com:8080/Keep/Case", "ex.com:8080")
    assert got[3] == ("https://ex.com/", "ex.com")
    assert got[4] == ("http://ex.com/", "ex.com")


def test_filter_cascade_rejects_null_text(spark, tmp_path):
    """A NULL-text document must be rejected at the first stage of the
    filter cascade, not fall through every NULL gate as 'kept'."""
    import pandas as pd

    from bazof_spark.workload import filter_cascade_q

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                None,
                "",
                "the cat and the dog walked to a house in the park and "
                "that was that because the sun is shining over the water "
                "today with many other fine words about the world we see",
            ],
            "lang": ["en", "en", "en"],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    got = {
        r["doc_id"]: (r["first_failed"], r["keep"])
        for r in filter_cascade_q(spark, str(tmp_path)).collect()
    }
    assert got[1] == ("langid", 0)   # NULL text: rejected, not kept
    assert got[2][1] == 0            # empty text rejected somewhere
    assert got[3][0] in {"kept", "quality", "gopher", "langid"}
