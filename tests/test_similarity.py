"""Similarity-search tests: exactness of the brute-force baseline,
recall of the LSH ANN path against it, determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bazof_spark.operators.similarity import (
    cosine_pairs_blocked,
    cosine_topk_bruteforce,
    ivf_ann_topk,
    lsh_ann_topk,
)

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(123)
    base = rng.standard_normal((40, DIM))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], i % 4))
    # seeded near-duplicates: 40..43 are tiny perturbations of 0..3
    for i in range(4):
        nd = base[i] + rng.standard_normal(DIM) * 0.01
        rows.append((40 + i, [float(x) for x in nd], i % 4))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_bruteforce_topk_matches_numpy(emb):
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.array(pdf["embedding"].tolist())
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = normed @ normed.T
    queries = emb.filter(F.col("vec_id") < 3).withColumnRenamed(
        "vec_id", "query_id"
    )
    got = cosine_topk_bruteforce(emb, queries, k=3).collect()
    for r in got:
        qi, ni = r["query_id"], r["neighbor_id"]
        assert sims[qi][ni] == pytest.approx(r["cosine_sim"], abs=1e-9)
    # top-1 for query 0 must be its seeded near-duplicate (vec 40)
    top1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    assert top1[0] == 40 and top1[1] == 41 and top1[2] == 42


def test_ann_recall_against_bruteforce(emb):
    queries = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id"
    )
    bf = cosine_topk_bruteforce(emb, queries, k=3).collect()
    ann = lsh_ann_topk(
        emb, queries, k=3, dim=DIM, n_bits=4, n_tables=8
    ).collect()
    bf_set = {(r["query_id"], r["neighbor_id"]) for r in bf}
    ann_set = {(r["query_id"], r["neighbor_id"]) for r in ann}
    recall = len(bf_set & ann_set) / len(bf_set)
    assert recall >= 0.5, f"ANN recall too low: {recall}"
    # the seeded near-dup (cos ≈ 0.9999) must never be missed
    assert (0, 40) in ann_set


def test_ann_deterministic(emb):
    queries = emb.filter(F.col("vec_id") < 4).withColumnRenamed(
        "vec_id", "query_id"
    )
    a = sorted(map(tuple, lsh_ann_topk(emb, queries, k=3, dim=DIM).collect()))
    b = sorted(map(tuple, lsh_ann_topk(emb, queries, k=3, dim=DIM).collect()))
    assert a == b


def test_ivf_full_probe_is_exact(emb):
    """Probing every inverted list must recover the brute-force result
    exactly (IVF with n_probe == n_lists is exhaustive)."""
    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    bf = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_ann_topk(
            emb, queries, k=3, n_lists=8, n_probe=8, sample_rows=44
        ).collect()
    }
    assert ivf == bf


def test_ivf_partial_probe_recall(emb):
    queries = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id"
    )
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(
            emb, queries, k=3, n_lists=8, n_probe=3, sample_rows=44
        ).collect()
    }
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # the seeded near-dup lands in the same list as its original
    assert (0, 40) in ivf


def test_blocked_pairs_find_neardups(emb):
    pairs = cosine_pairs_blocked(emb, "label", threshold=0.95).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert {(0, 40), (1, 41), (2, 42), (3, 43)} <= got
    for r in pairs:
        assert r["cosine_sim"] >= 0.95

def test_semdedup_prune_matches_bruteforce(emb):
    from bazof_spark.operators.similarity import semdedup_prune

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.array(pdf["embedding"].tolist())
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cent = normed[:6]  # corpus-slice quantizer, vec_id 0..5
    ids = pdf["vec_id"].to_numpy()
    assign = np.argmax(normed @ cent.T, axis=1)
    sims = normed @ normed.T
    thr = 0.9
    expect = {}
    for i, vid in enumerate(ids):
        lower = [
            j
            for j in range(len(ids))
            if ids[j] < vid and assign[j] == assign[i] and sims[j, i] >= thr
        ]
        expect[int(vid)] = (int(assign[i]), not lower)

    got = semdedup_prune(emb, mat[:6], threshold=thr).collect()
    assert len(got) == len(ids)  # one row per corpus vector
    for r in got:
        exp_list, exp_kept = expect[r["vec_id"]]
        assert r["list_id"] == exp_list, r
        assert r["is_kept"] == exp_kept, r
    # the seeded near-duplicates (40..43 of 0..3) must be pruned
    pruned = {r["vec_id"] for r in got if not r["is_kept"]}
    assert {40, 41, 42, 43} <= pruned


def _pq_codebooks(emb, m_subs=4, n_codes=8):
    from bazof_spark.operators.similarity import pq_codebooks_from_rows

    pdf = emb.toPandas().sort_values("vec_id").head(n_codes)
    return pq_codebooks_from_rows(
        np.array(pdf["embedding"].tolist()), m_subs=m_subs
    )


def test_pq_codebook_shape_and_normalization(emb):
    cb = _pq_codebooks(emb)
    assert cb.shape == (4, 8, DIM // 4)
    # concatenating code j's subvectors across subspaces rebuilds the
    # unit-normalized row j
    rebuilt = np.concatenate([cb[m][2] for m in range(4)])
    assert np.linalg.norm(rebuilt) == pytest.approx(1.0, abs=1e-12)


def test_pq_full_rerank_is_exact(emb):
    """With rerank >= corpus size the ADC stage only orders candidates;
    the exact re-rank must recover brute force bit-for-bit."""
    from bazof_spark.operators.similarity import pq_adc_topk

    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    bf = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_adc_topk(
            emb, queries, _pq_codebooks(emb), k=3, rerank=44
        ).collect()
    }
    assert pq == bf


def test_pq_partial_rerank_recall_and_determinism(emb):
    from bazof_spark.operators.similarity import pq_adc_topk

    queries = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id"
    )
    cb = _pq_codebooks(emb)
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    got = pq_adc_topk(emb, queries, cb, k=3, rerank=12).collect()
    pq_set = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(bf & pq_set) / len(bf)
    assert recall >= 0.5, f"PQ recall too low: {recall}"
    # a near-identical pair quantizes to (almost) the same codes — the
    # seeded near-dup must survive the ADC cutoff
    assert (0, 40) in pq_set
    again = pq_adc_topk(emb, queries, cb, k=3, rerank=12).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_pq_codebook_dim_mismatch_raises(emb):
    from bazof_spark.operators.similarity import pq_codebooks_from_rows

    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks_from_rows(np.ones((4, DIM)), m_subs=5)


def _centroids(emb, n):
    pdf = (
        emb.filter(F.col("vec_id") < n)
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    return np.array(pdf["embedding"].tolist(), dtype=np.float64)


def test_ivfpq_full_probe_full_rerank_is_exact(emb):
    """IVF-PQ with n_probe == n_lists and rerank >= corpus degenerates
    to brute force: list pruning admits everything, ADC only orders,
    the exact re-rank recovers the true top-k bit-for-bit."""
    from bazof_spark.operators.similarity import ivf_pq_topk

    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    cent = _centroids(emb, 8)
    bf = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_pq_topk(
            emb, queries, _pq_codebooks(emb), cent,
            k=3, n_probe=8, rerank=44,
        ).collect()
    }
    assert got == bf


def test_ivfpq_partial_probe_recall_and_determinism(emb):
    from bazof_spark.operators.similarity import ivf_pq_topk

    queries = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id"
    )
    cent = _centroids(emb, 8)
    cb = _pq_codebooks(emb)
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    got = ivf_pq_topk(emb, queries, cb, cent, k=3, n_probe=3, rerank=12).collect()
    s = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(bf & s) / len(bf)
    assert recall >= 0.5, f"IVF-PQ recall too low: {recall}"
    # the seeded near-dup shares its original's list AND codes — it
    # must survive both the list pruning and the ADC cutoff
    assert (0, 40) in s
    again = ivf_pq_topk(
        emb, queries, cb, cent, k=3, n_probe=3, rerank=12
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_trained_pq_codebooks_deterministic_and_usable(emb):
    """pq_codebooks_trained: right shape, deterministic for a fixed
    (sample, seed), and full-rerank through them still recovers brute
    force (codebook quality affects the CUTOFF, never the re-rank)."""
    from bazof_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks_trained,
    )

    cb1 = pq_codebooks_trained(
        emb, m_subs=4, n_codes=8, seed=29, sample_rows=44
    )
    cb2 = pq_codebooks_trained(
        emb, m_subs=4, n_codes=8, seed=29, sample_rows=44
    )
    assert cb1.shape == (4, 8, DIM // 4)
    assert np.array_equal(cb1, cb2)
    # a different seed trains different codebooks (it's really training)
    cb3 = pq_codebooks_trained(
        emb, m_subs=4, n_codes=8, seed=30, sample_rows=44
    )
    assert not np.array_equal(cb1, cb3)

    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    bf = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_adc_topk(emb, queries, cb1, k=3, rerank=44).collect()
    }
    assert got == bf


def test_pca_model_and_projection(emb):
    """Model invariants (orthonormal components, descending variance,
    deterministic sign) and projection correctness vs plain numpy on
    the full fixture."""
    from bazof_spark.operators.pca import pca_model_from_sample, pca_project

    comps, mean = pca_model_from_sample(
        emb, n_components=4, sample_rows=44
    )
    assert comps.shape == (4, DIM) and mean.shape == (DIM,)
    # orthonormal rows
    g = comps @ comps.T
    assert np.allclose(g, np.eye(4), atol=1e-10)
    # sign convention: the largest-|entry| coordinate is positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0
    # variance along components is non-increasing (top-k by eigenvalue)
    pdf = emb.toPandas().sort_values("vec_id")
    x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    proj = (x - mean) @ comps.T
    v = proj.var(axis=0)
    assert all(v[i] >= v[i + 1] - 1e-9 for i in range(3))
    # distributed projection equals numpy (fold vs matmul, ~1e-12)
    got = {
        r["vec_id"]: r["pc"]
        for r in pca_project(emb, comps, mean).collect()
    }
    for i, vid in enumerate(pdf["vec_id"]):
        assert np.allclose(got[vid], proj[i], atol=1e-9), vid
    # deterministic across calls
    comps2, mean2 = pca_model_from_sample(
        emb, n_components=4, sample_rows=44
    )
    assert np.array_equal(comps, comps2) and np.array_equal(mean, mean2)


def test_ivfpq_residual_full_probe_full_rerank_is_exact(emb):
    """Residual encoding changes the approximate ordering only — with
    full probe + full rerank it must still recover brute force."""
    from bazof_spark.operators.similarity import (
        ivf_pq_residual_topk,
        residual_pq_codebooks_from_rows,
    )

    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    cent = _centroids(emb, 8)
    # codebook rows 8..15: DISJOINT from the centroid slice 0..7 —
    # rows==centroids zeroes every residual (and now raises)
    pdf = emb.toPandas().sort_values("vec_id").iloc[8:16]
    cb = residual_pq_codebooks_from_rows(
        np.array(pdf["embedding"].tolist()), cent, m_subs=4
    )
    bf = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_pq_residual_topk(
            emb, queries, cb, cent, k=3, n_probe=8, rerank=44
        ).collect()
    }
    assert got == bf


def test_ivfpq_residual_partial_recall_and_determinism(emb):
    from bazof_spark.operators.similarity import (
        ivf_pq_residual_topk,
        residual_pq_codebooks_from_rows,
    )

    queries = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "query_id"
    )
    cent = _centroids(emb, 8)
    pdf = emb.toPandas().sort_values("vec_id").iloc[8:16]
    cb = residual_pq_codebooks_from_rows(
        np.array(pdf["embedding"].tolist()), cent, m_subs=4
    )
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    got = ivf_pq_residual_topk(
        emb, queries, cb, cent, k=3, n_probe=3, rerank=12
    ).collect()
    s = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(bf & s) / len(bf)
    assert recall >= 0.5, f"residual IVF-PQ recall too low: {recall}"
    # seeded near-dup: same list AND near-identical residual codes
    assert (0, 40) in s
    again = ivf_pq_residual_topk(
        emb, queries, cb, cent, k=3, n_probe=3, rerank=12
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_trained_residual_ivfpq_full_probe_full_rerank_is_exact(emb):
    """Trained residual codebooks (per-subspace L2 k-means ON residual
    subvectors — the Faiss by_residual=true trainer) change only the
    approximate ordering: full probe + full rerank recovers brute force,
    and the trainer is deterministic across calls."""
    from bazof_spark.operators.similarity import (
        ivf_pq_residual_topk,
        residual_pq_codebooks_trained,
    )

    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    cent = _centroids(emb, 8)
    cb = residual_pq_codebooks_trained(
        emb, cent, m_subs=4, n_codes=8, seed=31, sample_rows=24
    )
    assert cb.shape == (4, 8, 4)  # (m_subs, n_codes, DIM // m_subs)
    assert float(np.abs(cb).max()) > 1e-3  # genuinely non-zero
    cb2 = residual_pq_codebooks_trained(
        emb, cent, m_subs=4, n_codes=8, seed=31, sample_rows=24
    )
    assert np.array_equal(cb, cb2)
    bf = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_pq_residual_topk(
            emb, queries, cb, cent, k=3, n_probe=8, rerank=44
        ).collect()
    }
    assert got == bf


def test_residual_codebooks_reject_rows_equal_centroids(emb):
    """rows ⊆ centroids assigns every codebook row to itself (cosine
    1.0) → all residuals exactly 0 → a vacuous index whose ADC term is
    identically zero. The constructor must refuse it loudly."""
    from bazof_spark.operators.similarity import (
        residual_pq_codebooks_from_rows,
    )

    cent = _centroids(emb, 8)
    with pytest.raises(ValueError, match="near-.?zero"):
        residual_pq_codebooks_from_rows(cent, cent, m_subs=4)
    # disjoint rows produce genuinely non-zero codebooks
    rows = (
        emb.toPandas().sort_values("vec_id").iloc[8:16]["embedding"]
    ).tolist()
    cb = residual_pq_codebooks_from_rows(np.array(rows), cent, m_subs=4)
    assert float(np.abs(cb).max()) > 1e-3


def test_opq_rotation_properties_and_full_rerank(emb):
    """Round 9 — OPQ (Ge 2013): the learned rotation must be orthogonal
    (cosine-preserving), must not INCREASE sample quantization error vs
    plain trained PQ, and with rerank >= corpus the OPQ index recovers
    brute force bit-for-bit (the re-rank scores original vectors)."""
    from bazof_spark.operators.similarity import (
        _lloyd_kmeans_l2,
        opq_trained,
        pq_adc_topk,
    )

    rot, cb = opq_trained(
        emb, m_subs=4, n_codes=8, seed=29, sample_rows=44, iters=6
    )
    assert np.abs(rot @ rot.T - np.eye(rot.shape[0])).max() < 1e-9
    assert cb.shape == (4, 8, DIM // 4)

    # quantization error on the training sample: OPQ <= plain PQ
    rows = [
        np.asarray(r[0], dtype=np.float64)
        for r in emb.orderBy("vec_id").select("embedding").limit(44).collect()
    ]
    x = np.stack(rows)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    sub = DIM // 4

    def err(y, books):
        sv = y.reshape(len(y), 4, sub)
        d = ((sv[:, :, None, :] - books[None]) ** 2).sum(3)
        codes = d.argmin(2)
        yh = books[np.arange(4)[None, :], codes].reshape(len(y), DIM)
        return float(((y - yh) ** 2).sum())

    plain = np.stack(
        [
            _lloyd_kmeans_l2(x.reshape(len(x), 4, sub)[:, m, :], 8, 29 + m)
            for m in range(4)
        ]
    )
    assert err(x @ rot, cb) <= err(x, plain) + 1e-9

    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    bf = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    opq = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in pq_adc_topk(
            emb, queries, cb, k=3, rerank=44, rotation=rot
        ).collect()
    }
    assert opq == bf


def test_sq8_topk_near_exact_and_int8_range(emb):
    """SQ8 on a 16-dim corpus: int8 codes are fine enough that the
    quantized ranking reproduces the exact one on the seeded
    near-duplicate structure; codes stay inside [-127, 127]."""
    from bazof_spark.operators.similarity import quantize_int8, sq8_topk

    queries = emb.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb, queries, k=3).collect()
    }
    sq = sq8_topk(emb, queries, k=3).collect()
    sq_set = {(r["query_id"], r["neighbor_id"]) for r in sq}
    recall = len(bf & sq_set) / len(bf)
    assert recall >= 0.9, f"SQ8 recall too low: {recall}"
    # top-1 must still be the seeded near-duplicate (sim ~0.9999 —
    # quantization noise is ~1/254 per dim, far below the gap)
    top1 = {r["query_id"]: r["neighbor_id"] for r in sq if r["rank"] == 1}
    assert top1[0] == 40 and top1[1] == 41

    codes = emb.select(
        quantize_int8(F.col("embedding")).getField("q").alias("q")
    ).collect()
    for row in codes:
        assert all(-127 <= x <= 127 for x in row["q"])


def test_lloyd_kmeans_fixed_point_exit_is_bit_identical():
    """Opt round 1: both k-means trainers break out of the fixed
    10-iteration loop once the assignment reaches a fixed point, and
    skip mean recomputation for clusters whose membership did not
    change. Pin: the trained centroids are BITWISE identical to the
    always-10-iterations reference loop (the update is a pure function
    of membership, so an unchanged assignment reproduces its exact
    centroids) — including duplicate-heavy samples that exercise empty
    clusters."""
    import numpy as np

    from bazof_spark.operators.similarity import (
        _lloyd_kmeans,
        _lloyd_kmeans_l2,
    )

    def ref_spherical(x, n_lists, seed):
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        rng = np.random.default_rng(seed)
        cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
        for _ in range(10):
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(len(cent)):
                members = x[assign == c]
                if len(members):
                    m = members.mean(axis=0)
                    cent[c] = m / max(np.linalg.norm(m), 1e-12)
        return cent

    def ref_l2(x, n_codes, seed):
        rng = np.random.default_rng(seed)
        cent = x[
            rng.choice(len(x), size=min(n_codes, len(x)), replace=False)
        ].copy()
        for _ in range(10):
            d = ((x[:, None, :] - cent[None]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            for c in range(len(cent)):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        return cent

    for seed in range(12):
        rng = np.random.default_rng(seed + 1000)
        n = int(rng.integers(16, 300))
        dim = int(rng.choice([8, 16, 64]))
        x = rng.normal(size=(n, dim))
        if seed % 3 == 0:
            x[: n // 2] = x[0]  # duplicates → empty-cluster edges
        k = int(rng.choice([4, 8, 16]))
        assert (_lloyd_kmeans(x.copy(), k, seed) ==
                ref_spherical(x.copy(), k, seed)).all()
        assert (_lloyd_kmeans_l2(x.copy(), k, seed) ==
                ref_l2(x.copy(), k, seed)).all()
