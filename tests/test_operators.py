"""Unit tests for generic operators: as-of join, dedup internals,
multimodal plumbing."""

import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from bazof_spark.operators.asof import asof_join, latest_by_key
from bazof_spark.operators.dedup import exact_dedup, simhash_pairs
from bazof_spark.operators.multimodal import (
    IMAGE_SCHEMA,
    extract_image_features,
    media_metadata_stats,
    sample_video_frames,
)


def ts(d, h=0):
    return datetime(2024, 1, d, h, tzinfo=timezone.utc)


def test_latest_by_key(spark):
    df = spark.createDataFrame(
        [
            ("a", ts(1), 1),
            ("a", ts(3), 3),
            ("a", ts(5), 5),
            ("b", ts(2), 20),
        ],
        ["k", "t", "v"],
    )
    got = {
        r["k"]: r["v"]
        for r in latest_by_key(df, "k", "t").collect()
    }
    assert got == {"a": 5, "b": 20}
    got = {
        r["k"]: r["v"]
        for r in latest_by_key(df, "k", "t", as_of=ts(4)).collect()
    }
    assert got == {"a": 3, "b": 20}


def test_latest_by_key_precedence(spark):
    """File-precedence beats timestamp (metadata.rs:47-73 semantics)."""
    df = spark.createDataFrame(
        [("a", ts(1), 0, "child"), ("a", ts(9), 1, "parent")],
        ["k", "t", "rank", "v"],
    )
    got = latest_by_key(df, "k", "t", precedence_col="rank").collect()
    assert got[0]["v"] == "child"


def test_asof_join(spark):
    quotes = spark.createDataFrame(
        [("A", ts(1), 100.0), ("A", ts(5), 105.0), ("B", ts(2), 50.0)],
        ["sym", "qt", "price"],
    )
    trades = spark.createDataFrame(
        [("A", ts(3), 10), ("A", ts(6), 20), ("B", ts(1), 5)],
        ["sym", "tt", "qty"],
    )
    got = asof_join(trades, quotes, key="sym", probe_ts="tt", build_ts="qt")
    rows = {(r["sym"], r["qty"]): r["price"] for r in got.collect()}
    # trade A@3 sees quote @1; A@6 sees quote @5; B@1 has no quote yet
    assert rows == {("A", 10): 100.0, ("A", 20): 105.0}
    left = asof_join(
        trades, quotes, key="sym", probe_ts="tt", build_ts="qt", how="left"
    )
    assert left.count() == 3


def test_asof_join_tolerance_rejects_numeric_ts(spark):
    """A numeric epoch ts would be silently mis-scaled by the tolerance
    bound's timestamp cast (seconds vs micros) — must refuse."""
    import pytest

    probe = spark.createDataFrame([(1, 100)], "k long, pts long")
    build = spark.createDataFrame([(1, 90, "v")], "k long, bts long, val string")
    with pytest.raises(TypeError, match="timestamp/date"):
        asof_join(probe, build, "k", "pts", "bts", tolerance=5)
    # without tolerance any orderable ts type remains fine
    assert asof_join(probe, build, "k", "pts", "bts").count() == 1


def test_iofs_replace_text_atomic_flip(tmp_path):
    from bazof_spark import iofs

    p = str(tmp_path / "version.txt")
    iofs.replace_text(p, "1")
    assert iofs.read_text(p) == "1"
    iofs.replace_text(p, "2")
    assert iofs.read_text(p) == "2"
    # file:// URI route hits the same rename path
    iofs.replace_text("file://" + p, "3")
    assert iofs.read_text(p) == "3"
    # no temp litter left behind
    assert [f for f in os.listdir(tmp_path) if f.startswith(".tmp-")] == []


def test_exact_dedup_counts(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["doc_id", "text"]
    )
    got = {r["keep_id"]: r["n_copies"] for r in exact_dedup(df).collect()}
    assert got == {1: 2, 3: 1}


def test_simhash_identical_docs_zero_hamming(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "totally different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    # exact copies are collapsed by default (exact_dedup's job); the
    # hamming-0 pair is still observable with the guard opted out
    assert simhash_pairs(df).count() == 0
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(df, collapse_exact=False).collect()
    }
    assert pairs == {(1, 2): 0}


def test_multimodal_feature_extraction(spark):
    rows = [
        ("m1", b"\x01" * 600, {"format": "png", "width": 4, "height": 4, "n_channels": 3}),
        ("m2", b"\x02" * 300, {"format": "jpg", "width": 2, "height": 2, "n_channels": 3}),
        ("m3", None, {"format": "png", "width": 0, "height": 0, "n_channels": 0}),
    ]
    df = spark.createDataFrame(rows, IMAGE_SCHEMA)
    feats = extract_image_features(df).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert len(by_id["m1"]["features"]) == 16
    assert by_id["m1"]["n_bytes"] == 600
    assert by_id["m3"]["features"] == [0.0] * 16
    # deterministic: same bytes → same features
    feats2 = extract_image_features(df).collect()
    assert {r["media_id"]: r["features"] for r in feats2} == {
        r["media_id"]: r["features"] for r in feats
    }

    frames = sample_video_frames(df, every_n=1).collect()
    assert sum(1 for f in frames if f["media_id"] == "m1") == 2  # 600//256=2

    stats = {r["format"]: r["n"] for r in media_metadata_stats(df).collect()}
    assert stats == {"png": 2, "jpg": 1}


def test_dedup_clusters_transitive_chain(spark):
    from bazof_spark.operators.dedup import dedup_clusters

    # chain 1-2-3 (1-3 NOT a pair: transitivity must merge them),
    # separate pair 10-11, and a long path 20..24 (diameter > 1 round)
    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    expected = {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        10: (10, 2), 11: (10, 2),
        20: (20, 5), 21: (20, 5), 22: (20, 5), 23: (20, 5), 24: (20, 5),
    }
    # driver union-find path AND distributed propagation path must agree
    for threshold in (100_000, 0):
        got = {
            r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
            for r in dedup_clusters(df, driver_threshold=threshold).collect()
        }
        assert got == expected, f"driver_threshold={threshold}"


def test_resize_images_nn_kernel(spark):
    from bazof_spark.operators.multimodal import resize_images

    # true 2×4×1 grid halved to 1×2: source pixel (i*2//1=0? no —
    # rows = (arange(1)*2)//1 = [0]; cols = (arange(2)*4)//2 = [0, 2]
    img = bytes([10, 20, 30, 40, 50, 60, 70, 80])  # rows: [10..40],[50..80]
    rows = [
        ("g", img, {"format": "raw", "width": 4, "height": 2, "n_channels": 1}),
        # meta mismatching byte count → 1×len×1 fallback
        ("f", bytes([1, 2, 3, 4]), {"format": "raw", "width": 9, "height": 9, "n_channels": 9}),
        ("e", None, {"format": "raw", "width": 0, "height": 0, "n_channels": 0}),
    ]
    df = spark.createDataFrame(rows, IMAGE_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(df, out_w=2, out_h=1).collect()}
    assert bytes(out["g"]["resized"]) == bytes([10, 30])
    assert out["g"]["checksum"] == 40 and out["g"]["n_bytes"] == 2
    # fallback grid: cols = (arange(2)*4)//2 = [0, 2] → bytes 1, 3
    assert bytes(out["f"]["resized"]) == bytes([1, 3])
    assert out["e"]["n_bytes"] == 0 and out["e"]["checksum"] == 0

    # multi-channel: 1×2×2 → 1×1 keeps both channels of pixel 0
    img2 = bytes([9, 8, 7, 6])
    df2 = spark.createDataFrame(
        [("c", img2, {"format": "raw", "width": 2, "height": 1, "n_channels": 2})],
        IMAGE_SCHEMA,
    )
    [r] = resize_images(df2, out_w=1, out_h=1).collect()
    assert bytes(r["resized"]) == bytes([9, 8]) and r["checksum"] == 17


def test_metadata_stats_prunes_binary_column(spark, tmp_path):
    """Metadata-only queries must never read the binary blob: the parquet
    ReadSchema excludes `content` (Catalyst column pruning)."""
    df = spark.createDataFrame(
        [("m1", b"x" * 1000, {"format": "png", "width": 1, "height": 1, "n_channels": 3})],
        IMAGE_SCHEMA,
    )
    path = str(tmp_path / "media.parquet")
    df.write.parquet(path)
    stats = media_metadata_stats(spark.read.parquet(path))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "content" not in read_schema[0]


def test_salted_join_equals_plain_join(spark):
    from bazof_spark.operators.skew import salted_group_count, salted_join
    from pyspark.sql import functions as F

    # one hot key (90% of rows) + a long tail
    big = spark.createDataFrame(
        [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)],
        ["k", "v"],
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], ["k", "tag"]
    )
    plain = big.join(small, "k").select("k", "v", "tag")
    salted = salted_join(big, small, "k", n_salts=8).select("k", "v", "tag")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )

    counts = {
        r["k"]: r["count"]
        for r in salted_group_count(big, "k", n_salts=8).collect()
    }
    assert counts["hot"] == 900 and counts["k5"] == 1


def test_binned_range_join_edges(spark):
    """End-exclusive / start-inclusive bounds and bin-boundary spans."""
    from datetime import datetime

    from bazof_spark.operators.range_join import binned_range_join

    T = datetime
    points = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 0, 0)),   # == start → included
            (2, T(2024, 1, 1, 10, 59, 59)), # inside, crosses into next bin
            (3, T(2024, 1, 1, 11, 0, 0)),   # == end → excluded
            (4, T(2024, 1, 1, 9, 59, 59)),  # before start, same bin → excluded
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, T(2024, 1, 1, 10, 0, 0), T(2024, 1, 1, 11, 0, 0))],
        "iid long, start timestamp, end timestamp",
    )
    got = sorted(
        r.pid
        for r in binned_range_join(
            points,
            intervals,
            point_ts="ts",
            interval_start="start",
            interval_end="end",
            bin_width_seconds=1800,  # interval spans 2 bins
        ).collect()
    )
    assert got == [1, 2]

    # no duplicate matches when an interval covers many bins
    wide = spark.createDataFrame(
        [(200, T(2024, 1, 1, 0, 0, 0), T(2024, 1, 2, 0, 0, 0))],
        "iid long, start timestamp, end timestamp",
    )
    out = binned_range_join(
        points,
        wide,
        point_ts="ts",
        interval_start="start",
        interval_end="end",
        bin_width_seconds=600,
    )
    assert sorted(r.pid for r in out.collect()) == [1, 2, 3, 4]


def test_approx_sketches_within_tolerance(spark):
    """HLL++ distinct counts and quantile sketches: the scale path for
    distinct/percentile when exact is too expensive. Not oracle-gated
    (sketches are engine-specific); bounded against exact instead."""
    from pyspark.sql import functions as F

    from bazof_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05

    exact_med = ev.select(
        F.percentile(F.col("value"), F.lit(0.5))
    ).first()[0]
    approx_med = ev.select(
        F.percentile_approx("value", 0.5, 10000)
    ).first()[0]
    assert abs(approx_med - exact_med) <= abs(exact_med) * 0.02 + 1e-9


def test_grouping_sets_from_partials_match_builtin(spark):
    """rollup_from_partials / cube_from_partials == built-in
    rollup()/cube() row-for-row (decimal measures: exact re-agg)."""
    from pyspark.sql import functions as F

    from bazof_spark.operators.agg import (
        cube_from_partials,
        rollup_from_partials,
    )
    from bazof_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    measures = {
        "sum_qty": (F.sum(F.col("l_quantity").cast("decimal(18,2)")), "sum"),
        "n_rows": (F.count(F.lit(1)), "sum"),
        "max_price": (F.max("l_extendedprice"), "max"),
    }
    keys = ["l_returnflag", "l_linestatus"]

    def norm(df):
        return sorted(
            map(lambda r: tuple(str(x) for x in r), df.collect())
        )

    built_rollup = li.rollup(*keys).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        F.max("l_extendedprice").alias("max_price"),
    ).select(*keys, "sum_qty", "n_rows", "max_price")
    assert norm(rollup_from_partials(li, keys, measures)) == norm(built_rollup)

    built_cube = li.cube(*keys).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        F.max("l_extendedprice").alias("max_price"),
    ).select(*keys, "sum_qty", "n_rows", "max_price")
    assert norm(cube_from_partials(li, keys, measures)) == norm(built_cube)

    import pytest

    with pytest.raises(ValueError):
        rollup_from_partials(
            li, keys, {"bad": (F.avg("l_quantity"), "avg")}
        )


def test_deterministic_split_and_sample(spark):
    from bazof_spark.functions.sampling import (
        assign_split,
        deterministic_sample,
    )
    from pyspark.sql import functions as F

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    tagged = df.select("doc_id", assign_split(F.col("doc_id")).alias("s"))
    counts = {r["s"]: r["n"] for r in tagged.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03  # hash-uniformity
    # identical across invocations
    again = {r["s"]: r["n"] for r in df.select(assign_split(F.col("doc_id")).alias("s")).groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == again

    s10 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.1).collect()}
    s20 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.2).collect()}
    assert s10 <= s20  # nested: a kept row stays kept as rate grows
    assert abs(len(s10) / 5000 - 0.1) < 0.02
    # growth-stability: appending rows never changes earlier assignments
    bigger = spark.range(0, 10000).withColumnRenamed("id", "doc_id")
    s10b = {r["doc_id"] for r in deterministic_sample(bigger, "doc_id", 0.1).collect()}
    assert s10 == {x for x in s10b if x < 5000}

    with pytest.raises(ValueError):
        deterministic_sample(df, "doc_id", 1.5)
    with pytest.raises(ValueError):
        assign_split(F.col("doc_id"), train=0.9, val=0.2)


def test_pack_offsets_concat_and_chunk(spark):
    from bazof_spark.operators.packing import pack_offsets

    # single shard so in-shard order is just doc_id
    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 0), (4, 600)], ["doc_id", "n_tokens"]
    )
    got = {
        r["doc_id"]: (r["tok_offset"], r["start_seq"], r["end_seq"])
        for r in pack_offsets(df, "n_tokens", seq_len=512, n_shards=1).collect()
    }
    # stream: doc1 [0,300) seq0; doc2 [300,600) spans seq0→1; doc3 empty
    # at 600 → seq1; doc4 [600,1200) spans seq1→2
    assert got == {
        1: (0, 0, 0),
        2: (300, 0, 1),
        3: (600, 1, 1),
        4: (600, 1, 2),
    }

    with pytest.raises(ValueError):
        pack_offsets(df, "n_tokens", seq_len=0)


def test_bm25_rank_ordering(spark):
    from bazof_spark.operators.retrieval import bm25_rank

    df = spark.createDataFrame(
        [
            (1, "merge merge merge scan"),      # heavy on rare-ish terms
            (2, "merge scan hash hash hash"),   # all three terms
            (3, "apple banana cherry"),         # no match
            (4, "scan " + "filler " * 50),      # long doc → length penalty
        ],
        ["doc_id", "text"],
    )
    got = bm25_rank(df, ["merge", "scan", "hash"], top_k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert 3 not in ids  # unmatched docs never appear
    assert set(ids) == {1, 2, 4}
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[2]["n_matched"] == 3 and by_id[1]["n_matched"] == 2
    # length normalization: doc4's lone 'scan' in 51 words scores below
    # doc1's dense match
    assert by_id[4]["score"] < by_id[1]["score"]
    # scores sorted desc in output
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)

    with pytest.raises(ValueError):
        bm25_rank(df, [])


def test_chunk_documents_boundaries(spark):
    from bazof_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens, 2 chunks
            (2, "solo"),                                 # < 1 window
            (3, " ".join(f"x{i}" for i in range(8))),   # exactly one window
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.chunk_id): (r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    }
    # doc 1: ceil((10-2)/6)=2 chunks; starts 0 and 6; second is short
    assert out[(1, 0)][0] == 8
    assert out[(1, 0)][1].startswith("w0 ") and out[(1, 0)][1].endswith(" w7")
    assert out[(1, 1)] == (4, "w6 w7 w8 w9")  # overlap of 2 tokens
    assert out[(2, 0)] == (1, "solo")
    assert out[(3, 0)][0] == 8 and (3, 1) not in out
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_mixture_sample_exact_targets(spark):
    import pytest
    from pyspark.sql import functions as F

    from bazof_spark.functions.sampling import mixture_sample

    # skewed strata: en dominates, zh is scarce
    df = (
        spark.range(0, 4000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") < 3000, "en")
            .when(F.col("doc_id") < 3600, "de")
            .when(F.col("doc_id") < 3950, "fr")
            .otherwise("zh"),
        )
    )
    pct = {"en": 40, "de": 30, "fr": 20, "zh": 10}
    out = mixture_sample(df, "lang", pct, budget_num=1, budget_den=4)
    rows = out.collect()
    budget = 4000 * 1 // 4
    targets = {
        "en": min(budget * 40 // 100, 3000),
        "de": min(budget * 30 // 100, 600),
        "fr": min(budget * 20 // 100, 350),
        "zh": min(budget * 10 // 100, 50),  # capped by the 50-row stratum
    }
    got = {}
    for r in rows:
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    assert got == targets
    # ranks are contiguous 1..target per stratum
    for lang, t in targets.items():
        ranks = sorted(r["mix_rank"] for r in rows if r["lang"] == lang)
        assert ranks == list(range(1, t + 1))
    # deterministic across invocations
    again = {
        (r["doc_id"], r["mix_rank"])
        for r in mixture_sample(df, "lang", pct, budget_num=1, budget_den=4).collect()
    }
    assert again == {(r["doc_id"], r["mix_rank"]) for r in rows}
    # a stratum absent from pct is dropped entirely
    no_zh = mixture_sample(df, "lang", {"en": 50}, budget_num=1, budget_den=4)
    assert no_zh.filter(F.col("lang") != "en").count() == 0

    with pytest.raises(ValueError):
        mixture_sample(df, "lang", {"en": 60, "de": 60})


def test_pagerank_two_node_cycle_exact(spark):
    """On the 2-cycle a<->b PageRank is uniform (0.5, 0.5) at every
    iteration — exact, no tolerance. A 3-node chain with reverse edges
    must rank the middle node highest."""
    from pyspark.sql import functions as F

    from bazof_spark.operators.graph import pagerank

    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r["node"]: r["pr"] for r in pagerank(cyc, iterations=4).collect()}
    assert got == {"a": 0.5, "b": 0.5}

    chain = spark.createDataFrame(
        [("a", "m"), ("m", "a"), ("m", "z"), ("z", "m")],
        "src string, dst string",
    )
    pr = {r["node"]: r["pr"] for r in pagerank(chain, iterations=10).collect()}
    assert pr["m"] > pr["a"] and pr["m"] > pr["z"]
    assert abs(pr["a"] - pr["z"]) < 1e-12  # symmetric ends
    assert abs(sum(pr.values()) - 1.0) < 1e-9  # no dangling leak here

    # the every_node_receives fast path (valid on these symmetrized
    # graphs: every node has an in-edge) must give identical ranks
    fast = {
        r["node"]: r["pr"]
        for r in pagerank(
            chain, iterations=10, every_node_receives=True
        ).collect()
    }
    assert fast == pr
    # a dangling graph (sink z) must keep the safe path's semantics:
    # both paths only agree when the guarantee actually holds, so here
    # we just pin the SAFE path (z never redistributes, mass leaks)
    dangle = spark.createDataFrame(
        [("a", "z"), ("b", "z")], "src string, dst string"
    )
    safe = {r["node"]: r["pr"] for r in pagerank(dangle, iterations=2).collect()}
    assert safe["z"] > safe["a"] == safe["b"]


def test_gapfill_locf_and_zero_fill(spark):
    """Dense hourly grid from a sparse series: zero-filled counts, LOCF
    values, null before a key's first observation."""
    from datetime import datetime

    from bazof_spark.operators.gapfill import gapfill

    rows = [
        ("a", datetime(2024, 1, 1, 0), 1, 10.0),
        ("a", datetime(2024, 1, 1, 3), 2, 30.0),
        ("b", datetime(2024, 1, 1, 2), 5, 50.0),
    ]
    series = spark.createDataFrame(
        rows, "k string, h timestamp, n long, v double"
    )
    out = gapfill(
        series, keys=["k"], ts_col="h", step="1 hour",
        locf_cols=("v",), zero_cols=("n",),
    )
    got = {
        (r["k"], r["h"].hour): (r["n"], r["v"]) for r in out.collect()
    }
    # spine spans global bounds 00:00..03:00 for BOTH keys
    assert len(got) == 8
    assert got[("a", 0)] == (1, 10.0)
    assert got[("a", 1)] == (0, 10.0)  # gap: zero count, LOCF value
    assert got[("a", 2)] == (0, 10.0)
    assert got[("a", 3)] == (2, 30.0)
    assert got[("b", 0)] == (0, None)  # before b's first observation
    assert got[("b", 1)] == (0, None)
    assert got[("b", 2)] == (5, 50.0)
    assert got[("b", 3)] == (0, 50.0)


def test_rrf_fuse_hand_computed(spark):
    from bazof_spark.operators.retrieval import rrf_fuse

    bm = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    dn = spark.createDataFrame(
        [(3, 1), (4, 2)], "doc_id long, rank int"
    )
    out = {
        r["doc_id"]: (r["rrf_score"], r["rank_bm25"], r["rank_dense"])
        for r in rrf_fuse({"bm25": bm, "dense": dn}, k=60).collect()
    }
    assert abs(out[3][0] - (1 / 63 + 1 / 61)) < 1e-12  # in both lists
    assert out[3][1] == 3 and out[3][2] == 1
    assert abs(out[1][0] - 1 / 61) < 1e-12 and out[1][2] is None
    assert abs(out[4][0] - 1 / 62) < 1e-12 and out[4][1] is None
    # top_k cut is deterministic: 3 (highest) first
    top = rrf_fuse({"bm25": bm, "dense": dn}, top_k=1).collect()
    assert [r["doc_id"] for r in top] == [3]


def test_edit_distance_pairs_blocking_and_threshold(spark):
    from bazof_spark.operators.dedup import edit_distance_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # dist 3
            (3, "the quick brown fox leaps over a sleepy dog"),  # small dist
            (4, "completely different text with nothing shared"),
            (5, "xxe quick brown fox jumps over the lazy dog"),  # head edit
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in edit_distance_pairs(
            docs, max_dist=10, prefix_len=8
        ).collect()
    }
    assert out[(1, 2)] == 3
    assert (1, 3) in out and out[(1, 3)] <= 10
    assert all(4 not in p for p in out)
    # doc 5 differs in the BLOCKING PREFIX: missed by design (one-pass
    # prefix blocking), despite edit distance 2
    assert all(5 not in p for p in out)


def test_gapfill_explicit_bounds_seed_locf_from_before_window(spark):
    """An observation BEFORE the explicit window must seed the LOCF
    carry into the window; rows outside [lo, hi] stay out of the
    output."""
    from datetime import datetime

    from bazof_spark.operators.gapfill import gapfill

    series = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 9), 1, 10.0),   # before window
            ("a", datetime(2024, 1, 1, 11), 2, 20.0),  # inside
        ],
        "k string, h timestamp, n long, v double",
    )
    out = gapfill(
        series, keys=["k"], ts_col="h", step="1 hour",
        locf_cols=("v",), zero_cols=("n",),
        bounds=(datetime(2024, 1, 1, 10), datetime(2024, 1, 1, 12)),
    )
    got = {r["h"].hour: (r["n"], r["v"]) for r in out.collect()}
    assert set(got) == {10, 11, 12}  # 09:00 excluded from output
    assert got[10] == (0, 10.0)  # seeded by the pre-window observation
    assert got[11] == (2, 20.0)
    assert got[12] == (0, 20.0)


def test_scd2_compresses_and_closes_intervals(spark):
    """Consecutive same-value observations compress into one version;
    each version closes at the next version's start; the last is
    current. Null attribute values compare null-safely (a null→null
    run is ONE version, not many)."""
    from datetime import datetime

    from bazof_spark.operators.scd import scd2_from_log

    def t(h):
        return datetime(2024, 1, 1, h)

    rows = [
        # key a: x, x (compressed), y, x — 3 versions
        ("a", t(1), 1, "x"),
        ("a", t(2), 2, "x"),
        ("a", t(3), 3, "y"),
        ("a", t(4), 4, "x"),
        # key b: null, null (compressed), z — 2 versions
        ("b", t(1), 5, None),
        ("b", t(2), 6, None),
        ("b", t(3), 7, "z"),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int, attr string")
    out = scd2_from_log(df, "k", "ts", ["attr"], tiebreak_cols=["eid"]).collect()
    got = sorted(
        (
            (r["k"], r["attr"], r["valid_from"].hour,
             r["valid_to"].hour if r["valid_to"] else None, r["is_current"])
            for r in out
        ),
        key=lambda t: tuple((x is None, 0 if x is None else x) for x in t),
    )
    assert got == [
        ("a", "x", 1, 3, False),
        ("a", "x", 4, None, True),
        ("a", "y", 3, 4, False),
        ("b", "z", 3, None, True),  # None attr sorts last per position
        ("b", None, 1, 3, False),
    ]


def test_scd2_same_ts_tiebreak_and_validation(spark):
    from datetime import datetime

    import pytest as _pytest

    from bazof_spark.operators.scd import scd2_from_log

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", t0, 2, "late"), ("a", t0, 1, "early")],
        "k string, ts timestamp, eid int, attr string",
    )
    out = scd2_from_log(df, "k", "ts", ["attr"], tiebreak_cols=["eid"]).collect()
    cur = [r for r in out if r["is_current"]]
    assert len(cur) == 1 and cur[0]["attr"] == "late"
    with _pytest.raises(ValueError, match="attr_cols"):
        scd2_from_log(df, "k", "ts", [])


def test_scd2_single_exchange(spark):
    """Both window passes share the key partitioning: exactly one
    shuffle in the plan (the 100 TB cost model in the docstring)."""
    from datetime import datetime

    from bazof_spark.operators.scd import scd2_from_log
    from bazof_spark.plans.inspect import shuffle_count

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, h), h, "x") for h in range(1, 5)],
        "k string, ts timestamp, eid int, attr string",
    )
    out = scd2_from_log(df, "k", "ts", ["attr"], tiebreak_cols=["eid"])
    assert shuffle_count(out) <= 1


def test_bm25_empty_and_all_empty_corpus(spark):
    """Zero rows, or every doc tokenizing to nothing, must yield an
    empty ranking — not a driver TypeError from NULL aggregate stats
    (regression: the literal-injection rewrite fed int(None))."""
    from bazof_spark.operators.retrieval import bm25_rank

    empty = spark.createDataFrame([], "doc_id int, text string")
    assert bm25_rank(empty, ["spark"]).count() == 0
    blank = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "!!!")], "doc_id int, text string"
    )
    assert bm25_rank(blank, ["spark"]).count() == 0


def test_span_dedup_stats_hand_computed(spark):
    """Known duplicate-span layout, chunk_tokens=3: first occurrence is
    the lowest (doc_id, chunk_id); repeats — within a document or
    across documents — count as duplicates."""
    from bazof_spark.operators.dedup import span_dedup_stats

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f"),        # chunks: "a b c", "d e f" (both first)
            (1, "a b c x y z"),        # "a b c" dup, "x y z" first
            (2, "x y z"),              # dup of doc1 chunk1
            (3, "d e f d e f d"),      # dup, dup, "d" first
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dup_frac"])
        for r in span_dedup_stats(docs, chunk_tokens=3).collect()
    }
    assert got == {
        0: (2, 0, 0.0),
        1: (2, 1, 0.5),
        2: (1, 1, 1.0),
        3: (3, 2, 0.666667),
    }


def test_temperature_weights_tempers_toward_uniform(spark):
    """alpha=1 reproduces the raw mix; alpha=0 is uniform; alpha=0.3
    up-weights tails (boost > 1) and down-weights heads (< 1)."""
    from bazof_spark.functions.sampling import temperature_weights

    rows = [(i, "en") for i in range(90)] + [(90 + i, "sw") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    t1 = {r["lang"]: r for r in temperature_weights(df, alpha=1.0).collect()}
    assert t1["en"]["p_tempered"] == t1["en"]["p_raw"] == 0.9
    t0 = {r["lang"]: r for r in temperature_weights(df, alpha=0.0).collect()}
    assert t0["en"]["p_tempered"] == t0["sw"]["p_tempered"] == 0.5
    t = {r["lang"]: r for r in temperature_weights(df, alpha=0.3).collect()}
    assert t["sw"]["boost"] > 1.0 > t["en"]["boost"]
    assert abs(t["en"]["p_tempered"] + t["sw"]["p_tempered"] - 1.0) < 1e-5
