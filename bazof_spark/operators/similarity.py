"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:

- ``cosine_topk_bruteforce`` — the exact baseline: broadcast the (small)
  query set, score every corpus vector with a JVM-side fold
  (``F.aggregate``/``zip_with`` — no Python UDF), take top-k per query
  with ``row_number`` over a window partitioned by query. The corpus-side
  scan is embarrassingly parallel; the only shuffle is (n_queries × k)
  candidate rows.

- ``lsh_ann_topk`` — the scale path: random-hyperplane LSH. Deterministic
  planes (numpy, fixed seed) are embedded as literals; both queries and
  corpus get a sign-bit bucket id; candidates = same bucket (multi-probe
  via several independent tables); exact re-rank inside buckets. At
  100 TB the bucket join replaces the full scan: cost ∝ corpus/2^bits
  per table instead of corpus.

- ``cosine_neardup_pairs`` — near-duplicate detection by embedding
  cosine: all pairs ≥ threshold, LSH-bucketed candidate generation with
  exact verification.

All dot products are computed in float64 after an explicit cast so
results are bit-reproducible against the DuckDB oracle (both engines do
an ordered left-to-right double fold).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def _cached_on_inputs(tag: str, builder, *cols: Column) -> Column:
    """Build-once discipline for this module's vector-fold combinators
    (opt round 1, the exprcache pattern): the HOF lambda builds below
    cost 30-60 py4j round trips apiece and the ANN queries compose them
    dozens of times per construction. The produced tree depends only on
    the input expression TREES, so the inputs' string forms (one round
    trip each via Column.__repr__) key a per-process cache; every reuse
    is the identical immutable unresolved tree, hence identical plans
    and results.

    CONTRACT (exprcache module docstring, hardened opt round 2): the
    ``cols`` must be UNRESOLVED caller-built trees (``F.col``/``F.lit``
    compositions), never df-bound attributes — resolved columns from
    different DataFrames can stringify identically, and a str() key
    collision would silently serve a tree bound to the wrong plan.
    Every call site in this module passes unresolved trees."""
    from bazof_spark.exprcache import cached_column

    try:
        key = (tag,) + tuple(str(c) for c in cols)
    except Exception:  # non-Column input (tests passing odd types)
        return builder(*cols)
    return cached_column(key, lambda: builder(*cols))


def dot(a: Column, b: Column) -> Column:
    """Ordered double fold — deterministic, JVM-side."""

    def _build(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return _cached_on_inputs("sim.dot", _build, a, b)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # zero-norm floor: a single all-zero vector would otherwise throw
    # DIVIDE_BY_ZERO under Spark 4's default ANSI mode and kill the
    # whole job (the numpy paths in this module guard identically);
    # real embeddings have norms ~1, so results are unchanged
    def _build(a: Column, b: Column) -> Column:
        return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))

    return _cached_on_inputs("sim.cosine", _build, a, b)


def normalize(vec: Column) -> Column:
    """Unit-normalize once per vector — do this BEFORE any pairwise
    stage: cosine then degrades to a single dot per pair (one 64-wide
    fold instead of three), and the normalization cost is O(corpus)
    instead of O(pairs). The inverse norm rides in via array_repeat so
    it is evaluated once per ROW (an outer-reference inside a lambda
    would be re-evaluated per element)."""

    def _build(vec: Column) -> Column:
        inv = F.lit(1.0) / F.greatest(norm(vec), F.lit(1e-12))  # zero-norm
        return F.zip_with(
            vec, F.array_repeat(inv, F.size(vec)), lambda x, n: x * n
        )

    return _cached_on_inputs("sim.normalize", _build, vec)


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 quantization of an embedding — the standard
    4×-compression step before shipping vectors into an ANN index at
    corpus scale (memory/shuffle volume drops with byte width; recall
    loss is the known trade-off).

    ``q_i = floor(v_i * 127/max|v| + 0.5)`` — floor(x+0.5) instead of
    round() because IEEE-754 double multiply + floor is reproducible
    across engines while half-even vs half-away rounding is not.
    Returns a struct (scale double, q array<int>); all-zero vectors get
    scale 0 and all-zero codes. JVM-side fold, no UDF."""
    def _build(vec: Column) -> Column:
        a = _as_double(vec)
        mx = F.array_max(F.transform(a, lambda x: F.abs(x)))
        scale = F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(0.0))
        q = F.zip_with(
            a,
            F.array_repeat(scale, F.size(a)),  # scale evaluated once/row
            lambda x, s: F.floor(x * s + F.lit(0.5)).cast("int"),
        )
        return F.struct(scale.alias("scale"), q.alias("q"))

    return _cached_on_inputs("sim.quantize_int8", _build, vec)


def matryoshka_topk(
    corpus: DataFrame,
    queries: DataFrame,
    prefix_dims: int = 16,
    candidates: int = 25,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage search over matryoshka-style embeddings (prefixes of
    the vector are themselves usable embeddings): a COARSE pass ranks
    by cosine over the first ``prefix_dims`` dims (prefix_dims/dim of
    the arithmetic and, at scale, of the bytes read when prefixes are
    stored as their own column), keeps ``candidates`` per query, then
    an EXACT pass re-ranks only those on the full vector. Determinism:
    both cutoffs order by (sim DESC, id ASC).

    Scale: stage 1 is the only corpus-wide pass; stage 2 touches
    |queries|·candidates rows. The candidate join is on the corpus id —
    broadcast (candidate set is tiny) so the corpus full-vector side
    never shuffles."""
    trunc = lambda c: F.slice(c, 1, prefix_dims)  # noqa: E731
    coarse = cosine_topk_bruteforce(
        corpus.select(id_col, trunc(F.col(vec_col)).alias(vec_col)),
        queries.select(
            query_id_col, trunc(F.col(vec_col)).alias(vec_col)
        ),
        k=candidates,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    ).select(query_id_col, "neighbor_id")
    cand = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        normalize(_as_double(F.col(vec_col))).alias("_cv"),
    ).join(
        F.broadcast(coarse), "neighbor_id"  # tiny candidate set, map-side
    ).join(
        F.broadcast(
            queries.select(
                query_id_col,
                normalize(_as_double(F.col(vec_col))).alias("_qv"),
            )
        ),
        query_id_col,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.select(
            query_id_col,
            "neighbor_id",
            dot(F.col("_qv"), F.col("_cv")).alias("_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            "rank",
            F.col("_sim").alias("cosine_sim"),
        )
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, rank, cosine_sim), self-matches
    (same id) excluded, ties broken by neighbor_id ASC for determinism.
    """
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        normalize(_as_double(F.col(vec_col))).alias("_qv"),
    )
    # The scoring below is per-pair CPU (|corpus| x |queries| 64-wide
    # folds) in the SCAN stage — no exchange precedes it, so a
    # single-file corpus would serialize the whole pass onto one core
    # (the sources.tables.rebalance_if_undersplit contract; a no-op at
    # real scale where the scan arrives as many splits).
    from bazof_spark.sources.tables import rebalance_if_undersplit

    corpus = rebalance_if_undersplit(corpus.sparkSession, corpus)
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        normalize(_as_double(F.col(vec_col))).alias("_cv"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "_qid",
        "_cid",
        dot(F.col("_qv"), F.col("_cv")).alias("_sim"),
    ).filter(F.col("_qid") != F.col("_cid"))
    w = Window.partitionBy("_qid").orderBy(
        F.col("_sim").desc(), F.col("_cid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_cid").alias("neighbor_id"),
            "rank",
            F.col("_sim").alias("cosine_sim"),
        )
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Flat scalar-quantized ANN — the SQ8 rung of the public index
    ladder (Faiss ``IndexScalarQuantizer``/QT_8bit): the corpus is
    stored as int8 codes via :func:`quantize_int8` (4× smaller than
    float32, 8× than float64 — at 100 TB the quantized corpus is the
    ONLY data-sized relation, so scan/shuffle volume shrinks by the
    same factor), queries stay float and score asymmetrically against
    the codes.

    Key identity that keeps this exact AND oracle-checkable: with the
    symmetric quantizer ``q_i = floor(v_i·scale + 0.5)`` the
    dequantized vector is ``q/scale``, and cosine is scale-invariant —
    ``cos(query, q/scale) == cos(query, q)`` — so the per-row scale
    cancels and the score is a plain cosine between the float query
    and the INTEGER code vector. No dequantization pass, no per-row
    scale in the hot loop, and the DuckDB twin is one
    ``list_cosine_similarity`` over reproducible integers.

    Output matches :func:`cosine_topk_bruteforce`: (query_id,
    neighbor_id, rank, cosine_sim), self-matches excluded, ties by
    neighbor_id ASC.
    """
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        _as_double(F.col(vec_col)).alias("_v"),
    ).select(
        "_cid",
        _as_double(quantize_int8(F.col("_v")).getField("q")).alias("_cq"),
    )
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        _as_double(F.col(vec_col)).alias("_qv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .select("_qid", "_cid", cosine(F.col("_qv"), F.col("_cq")).alias("_sim"))
        .filter(F.col("_qid") != F.col("_cid"))
    )
    w = Window.partitionBy("_qid").orderBy(
        F.col("_sim").desc(), F.col("_cid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_cid").alias("neighbor_id"),
            "rank",
            F.col("_sim").alias("cosine_sim"),
        )
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def _bucket_udf(planes_all: np.ndarray):
    """Arrow-batched sign-bit bucketing: vec -> array of n_tables bucket
    ids (bit i of table t = (vec · plane_ti) >= 0), one numpy matmul per
    batch.

    Why a Pandas UDF and not JVM expressions: the sign bits are a dense
    (batch × dim) @ (dim × n_tables·n_bits) product. Expressed as
    ``aggregate``/``zip_with`` folds it is interpreted per element (HOF
    lambdas don't enter whole-stage codegen) and the plane literals bloat
    the plan (n_tables × n_bits × dim scalars, shipped to every task);
    measured, plan construction alone cost seconds. One vectorized BLAS
    matmul per Arrow batch is the 100-TB-honest design; the planes ride
    in the task closure (a few KB). All tables are computed in one pass,
    replacing an n_tables-way union of re-scans."""
    n_tables, n_bits, dim = planes_all.shape
    P = planes_all.reshape(n_tables * n_bits, dim).T  # (dim, T*B)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        if any(x is None for x in vecs):
            raise ValueError(
                "NULL embedding in LSH bucketing — filter or impute "
                "null vectors upstream"
            )
        v = np.array([np.asarray(x, dtype=np.float64) for x in vecs])
        if v.ndim != 2 or v.shape[1] != P.shape[0]:
            raise ValueError(
                f"embedding dim mismatch: vectors are "
                f"{v.shape[1] if v.ndim == 2 else 'ragged'}-d but the "
                f"hyperplanes were built for dim={P.shape[0]} — pass "
                "the correct dim= to the ANN operator"
            )
        signs = (v @ P >= 0).reshape(len(vecs), n_tables, n_bits)
        ids = (signs * weights).sum(axis=2)  # (batch, n_tables)
        return pd.Series(list(ids))

    return buckets


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_bits: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidate generation
    (n_tables independent bucketings) + exact cosine re-rank.

    Output: (query_id, neighbor_id, rank, cosine_sim) — same shape as
    the brute-force baseline so recall can be measured directly.
    """
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        normalize(_as_double(F.col(vec_col))).alias("_cv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        normalize(_as_double(F.col(vec_col))).alias("_qv"),
    )
    buckets = _bucket_udf(
        np.stack([_hyperplanes(dim, n_bits, seed + t) for t in range(n_tables)])
    )
    # one scan computes every table's bucket id; posexplode replaces an
    # n_tables-way union of re-reads
    c_all = c.select(
        "_cid", "_cv", F.posexplode(buckets("_cv")).alias("_tbl", "_bkt")
    )
    q_all = q.select(
        "_qid", "_qv", F.posexplode(buckets("_qv")).alias("_tbl", "_bkt")
    )

    cand = (
        c_all.join(F.broadcast(q_all), on=["_tbl", "_bkt"])
        .filter(F.col("_qid") != F.col("_cid"))
        .select("_qid", "_qv", "_cid", "_cv")
        .dropDuplicates(["_qid", "_cid"])
    )
    scored = cand.select(
        "_qid", "_cid", dot(F.col("_qv"), F.col("_cv")).alias("_sim")
    )
    w = Window.partitionBy("_qid").orderBy(F.col("_sim").desc(), F.col("_cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_cid").alias("neighbor_id"),
            "rank",
            F.col("_sim").alias("cosine_sim"),
        )
    )


def _lloyd_kmeans(x: np.ndarray, n_lists: int, seed: int) -> np.ndarray:
    """Seeded spherical Lloyd k-means over a sample matrix (rows =
    vectors). Pure numpy and fully deterministic for a given (sample,
    n_lists, seed) — the DuckDB-oracle path recomputes THIS function on
    the same sample to embed identical centroid literals in SQL."""
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    prev = None
    for _ in range(10):
        assign = np.argmax(x @ cent.T, axis=1)
        # Lloyd fixed point (opt round 1): an unchanged assignment
        # reproduces the exact centroids it came from (the update is a
        # pure function of membership), so every remaining iteration is
        # a bit-identical no-op — break. Per-cluster: only memberships
        # that changed need their mean recomputed; untouched clusters
        # keep the identical centroid. Results are bitwise unchanged
        # (same inputs to the same ops); only dead work is skipped.
        if prev is not None and np.array_equal(assign, prev):
            break
        changed = (
            range(len(cent))
            if prev is None
            else np.unique(
                np.concatenate([assign[assign != prev], prev[assign != prev]])
            )
        )
        for c in changed:
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
        prev = assign
    return cent


def sample_lowest_id_vectors(
    corpus: DataFrame,
    sample_rows: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """RAW (un-normalized) matrix of the ``sample_rows`` lowest-id
    vectors — the one deterministic bounded sample every trainer here
    draws. Exposed so a query composing SEVERAL trainers (IVF coarse +
    PQ codebooks) collects it ONCE and hands the matrix to each via
    their ``sample=`` parameter instead of re-running the identical
    distributed top-k job per trainer (opt round 1, guide §2.4)."""
    rows = [
        np.asarray(r[0], dtype=np.float64)
        for r in corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .select(vec_col)
        .limit(sample_rows)
        .collect()
    ]
    return np.stack(rows)


def _train_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_lists: int,
    seed: int,
    sample_rows: int,
    id_col: str | None = None,
    sample: np.ndarray | None = None,
) -> np.ndarray:
    """Coarse quantizer: Lloyd k-means on a BOUNDED sample (driver-side
    numpy, like Spark ML's init step). The sample size is fixed and
    independent of corpus size, so this is O(1) w.r.t. the 100 TB scan;
    assignment of the full corpus stays distributed.

    With `id_col` the sample is the `sample_rows` lowest-id vectors
    (a distributed top-k, same cost class as limit) — fully
    deterministic across runs and cluster layouts, unlike a bare
    ``limit`` whose row choice depends on partition scheduling.
    ``sample`` (the RAW matrix of exactly that sample) skips the
    collect — see :func:`sample_lowest_id_vectors`."""
    if sample is not None:
        return _lloyd_kmeans(np.asarray(sample, dtype=np.float64), n_lists, seed)
    base = corpus.select(vec_col) if id_col is None else (
        corpus.select(id_col, vec_col).orderBy(id_col).select(vec_col)
    )
    rows = [
        np.asarray(r[0], dtype=np.float64)
        for r in base.limit(sample_rows).collect()
    ]
    return _lloyd_kmeans(np.stack(rows), n_lists, seed)


def _list_assign_udf(centroids: np.ndarray, n_probe: int):
    """vec -> array of n_probe nearest-centroid list ids (one matmul
    per Arrow batch; centroids ride in the closure)."""
    C = centroids.T  # (dim, n_lists)

    @F.pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        v = np.array([np.asarray(x, dtype=np.float64) for x in vecs])
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        sims = v @ C
        top = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32") for row in top])

    # the function IS deterministic; the marker stops the optimizer
    # from DUPLICATING it below pushed join-key filters (guide §4.4 —
    # the plan showed the corpus assignment evaluated twice, once under
    # isnotnull(_list) and again in the projection). Results unchanged;
    # the corpus matmul runs once per row instead of twice.
    return assign.asNondeterministic()


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 13,
    sample_rows: int = 2048,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the other standard ANN
    scale path next to :func:`lsh_ann_topk`: a coarse quantizer
    partitions the corpus into ``n_lists`` inverted lists; each query
    probes its ``n_probe`` nearest lists and re-ranks exactly inside
    them. Cost ∝ corpus × n_probe / n_lists per query batch instead of
    the full corpus; with ``n_probe == n_lists`` recall is exactly 1.

    ``centroids`` (n_lists × dim) overrides the default k-means
    training — pass a deterministic set (e.g. a fixed slice of the
    corpus, normalized) when the result must be reproducible across
    engines; the inverted-list structure and probing are identical
    either way.

    Output matches the brute-force baseline: (query_id, neighbor_id,
    rank, cosine_sim).
    """
    if centroids is not None:
        cent = centroids / np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
    else:
        cent = _train_centroids(
            corpus, vec_col, n_lists, seed, sample_rows, id_col=id_col
        )
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        normalize(_as_double(F.col(vec_col))).alias("_cv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        normalize(_as_double(F.col(vec_col))).alias("_qv"),
    )
    c_assigned = c.withColumn(
        "_list", _list_assign_udf(cent, 1)("_cv")[0]
    )
    q_probed = q.select(
        "_qid",
        "_qv",
        F.explode(_list_assign_udf(cent, n_probe)("_qv")).alias("_list"),
    )
    cand = c_assigned.join(F.broadcast(q_probed), on="_list").filter(
        F.col("_qid") != F.col("_cid")
    )
    scored = cand.select(
        "_qid", "_cid", dot(F.col("_qv"), F.col("_cv")).alias("_sim")
    )
    w = Window.partitionBy("_qid").orderBy(F.col("_sim").desc(), F.col("_cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_cid").alias("neighbor_id"),
            "rank",
            F.col("_sim").alias("cosine_sim"),
        )
    )


def cosine_pairs_blocked(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = 2048,
) -> DataFrame:
    """EXACT cosine pairs within a blocking key: (id_a, id_b, cosine_sim)
    with id_a < id_b and sim >= threshold. The blocking column (a label,
    a shard, an LSH bucket…) bounds the quadratic term to one block —
    the standard exact-verification step after any candidate generator.

    Executed as ``applyInPandas`` per block: normalize once, then one
    BLAS matmul per (chunk × block) tile instead of an interpreted
    64-element fold per pair (a self-join + HOF dot was ~50× slower at
    2k vectors and the gap grows with block size). Blocks shuffle once
    on the blocking key; tiles bound the similarity matrix held in
    memory to chunk_rows × remaining-block-rows — a skewed block still
    scales a tile's width with the BLOCK size (cap the blocking key's
    cardinality upstream, e.g. _cap_buckets, for a hard bound).
    """
    id_type = df.schema[id_col].dataType.simpleString()
    v = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("_id"),
        _as_double(F.col(vec_col)).alias("_v"),
    )
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine_sim double"

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        mat = np.array([np.asarray(x, dtype=np.float64) for x in pdf["_v"]])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        ids = pdf["_id"].to_numpy()
        out_a, out_b, out_s = [], [], []
        for lo in range(0, n, chunk_rows):
            hi = min(lo + chunk_rows, n)
            # only columns >= lo can survive the upper-triangle filter:
            # computing them halves the FLOPs and shrinks later tiles
            sims = mat[lo:hi] @ mat[lo:].T  # (chunk, n - lo)
            rows, cols = np.nonzero(sims >= threshold)
            keep = cols > rows  # both relative to lo ⇒ id_a < id_b
            rows, cols = rows[keep], cols[keep]
            out_a.append(ids[rows + lo])
            out_b.append(ids[cols + lo])
            out_s.append(sims[rows, cols])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine_sim": np.concatenate(out_s),
            }
        )

    return v.groupBy("_blk").applyInPandas(per_block, out_schema)


def semdedup_prune(
    corpus: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk_rows: int = 2048,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540): cluster embeddings with a coarse quantizer, then
    inside each cluster prune every vector that is a cosine
    near-duplicate of a LOWER-id vector in the same cluster. Output one
    row per corpus vector: (vec_id, list_id, is_kept).

    The prune rule is id-anchored (prune v iff ∃ u in v's cluster with
    id(u) < id(v) and cos(u, v) >= threshold) rather than the paper's
    keep-farthest-from-centroid: min-id representatives are the
    convention every dedup operator in this repo uses
    (operators/dedup.py), and an id predicate is engine-portable — the
    DuckDB oracle reproduces it exactly, which "farthest, ties broken by
    clustering randomness" is not.

    Scale shape: assignment is one Arrow-batched matmul per batch
    (map-only); the quadratic term is confined to one cluster and
    further tiled by ``chunk_rows`` (see :func:`cosine_pairs_blocked`),
    so executor memory is bounded regardless of cluster size. At 100 TB
    pick ``n_lists ≈ corpus_rows / target_cluster_size`` so clusters
    stay ~10⁴-10⁵ rows — the paper's regime — and train centroids with
    :func:`_train_centroids` (bounded sample, O(1) in corpus size).
    Pass a fixed corpus slice as ``centroids`` when the result must be
    bit-reproducible across engines (same convention as
    ``embedding_ann_ivf``).
    """
    cent = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    v = corpus.select(
        F.col(id_col).alias("_id"),
        normalize(_as_double(F.col(vec_col))).alias("_v"),
    )
    assigned = v.withColumn("_list", _list_assign_udf(cent, 1)("_v")[0])
    assigned = assigned.persist()  # read by the pair generator AND the
    # final projection; without this the assignment UDF runs twice
    pairs = cosine_pairs_blocked(
        assigned,
        "_list",
        threshold=threshold,
        id_col="_id",
        vec_col="_v",
        chunk_rows=chunk_rows,
    )
    # a vector is pruned iff it appears as the HIGHER id of any
    # qualifying pair. No broadcast hint: the pruned set scales with
    # near-dup density (it can be a large fraction of the corpus, the
    # exact case this operator targets) — let AQE pick the join side
    pruned = pairs.select(F.col("id_b").alias("_pruned")).distinct()
    return (
        assigned.join(
            pruned,
            assigned["_id"] == F.col("_pruned"),
            "left",
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_list").cast("int").alias("list_id"),
            F.col("_pruned").isNull().alias("is_kept"),
        )
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_bits: int = 6,
    n_tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine_sim)
    with id_a < id_b and cosine_sim >= threshold. LSH buckets generate
    candidates; cosine verifies exactly. Raise n_tables for recall."""
    v = df.select(
        F.col(id_col).alias("_id"),
        normalize(_as_double(F.col(vec_col))).alias("_v"),
    )
    buckets = _bucket_udf(
        np.stack([_hyperplanes(dim, n_bits, seed + t) for t in range(n_tables)])
    )
    all_t = v.select(
        "_id", "_v", F.posexplode(buckets("_v")).alias("_tbl", "_bkt")
    ).persist()  # both self-join sides read it: without this the
    # Arrow-batched bucket UDF scans the corpus twice
    l, r = all_t.alias("l"), all_t.alias("r")
    cand = (
        l.join(
            r,
            on=[
                F.col("l._tbl") == F.col("r._tbl"),
                F.col("l._bkt") == F.col("r._bkt"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("l._v").alias("va"),
            F.col("r._id").alias("id_b"),
            F.col("r._v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select(
            "id_a", "id_b", dot(F.col("va"), F.col("vb")).alias("cosine_sim")
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def pq_codebooks_from_rows(rows: np.ndarray, m_subs: int) -> np.ndarray:
    """Deterministic product-quantization codebooks from a fixed corpus
    slice: unit-normalize each row, split the dim into ``m_subs`` equal
    subspaces, and use row j's m-th subvector as code j of subspace m.
    Shape (m_subs, n_codes, sub_dim). A production deployment trains
    per-subspace k-means instead (same seam as IVF's `_train_centroids`
    — a bounded sample, driver-side numpy); the fixed slice keeps every
    code, and therefore the whole index, reproducible in a SQL oracle."""
    rows = np.asarray(rows, dtype=np.float64)
    rows = rows / np.maximum(np.linalg.norm(rows, axis=1, keepdims=True), 1e-12)
    n_codes, dim = rows.shape
    if dim % m_subs:
        raise ValueError(f"dim {dim} not divisible by m_subs {m_subs}")
    sub = dim // m_subs
    # (n_codes, m_subs, sub) -> (m_subs, n_codes, sub)
    return rows.reshape(n_codes, m_subs, sub).transpose(1, 0, 2).copy()


def _lloyd_kmeans_l2(x: np.ndarray, n_codes: int, seed: int) -> np.ndarray:
    """Seeded PLAIN-L2 Lloyd k-means (no normalization) — the PQ
    codebook trainer: sub-vectors of a unit vector are not themselves
    unit, so spherical k-means (``_lloyd_kmeans``) would distort them.
    Deterministic for a given (sample, n_codes, seed); the DuckDB
    oracle re-runs THIS function on the same sample to embed identical
    codebook literals. Ties in assignment break to the lower code id
    (argmin-first), matching the encode UDF."""
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_codes, len(x)), replace=False)].copy()
    prev = None
    for _ in range(10):
        d = ((x[:, None, :] - cent[None]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        # same fixed-point shortcut as _lloyd_kmeans: unchanged
        # assignment ⇒ identical centroids forever after (bitwise);
        # unchanged memberships keep their identical mean
        if prev is not None and np.array_equal(assign, prev):
            break
        changed = (
            range(len(cent))
            if prev is None
            else np.unique(
                np.concatenate([assign[assign != prev], prev[assign != prev]])
            )
        )
        for c in changed:
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        prev = assign
    return cent


def pq_codebooks_trained(
    corpus: DataFrame,
    m_subs: int = 8,
    n_codes: int = 16,
    seed: int = 29,
    sample_rows: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: np.ndarray | None = None,
) -> np.ndarray:
    """TRAINED product-quantization codebooks — the production path the
    fixed-slice :func:`pq_codebooks_from_rows` documents as its seam:
    per-subspace L2 k-means on a BOUNDED deterministic sample (the
    ``sample_rows`` lowest-id vectors, unit-normalized — the same O(1)
    sampling contract as IVF's ``_train_centroids``). Shape
    (m_subs, n_codes, sub_dim). Fully deterministic for a given
    (corpus, m_subs, n_codes, seed, sample_rows), so a SQL oracle can
    re-derive the identical codebooks from the same parquet.
    ``sample`` (the RAW matrix of exactly that sample) skips the
    collect — see :func:`sample_lowest_id_vectors`."""
    if sample is not None:
        x = np.asarray(sample, dtype=np.float64)
    else:
        x = sample_lowest_id_vectors(corpus, sample_rows, id_col, vec_col)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n, dim = x.shape
    if dim % m_subs:
        raise ValueError(f"dim {dim} not divisible by m_subs {m_subs}")
    sub = dim // m_subs
    subvecs = x.reshape(n, m_subs, sub)
    return np.stack(
        [
            _lloyd_kmeans_l2(subvecs[:, m, :], n_codes, seed + m)
            for m in range(m_subs)
        ]
    )


def opq_rotation_codebooks_from_sample(
    x: np.ndarray,
    m_subs: int = 8,
    n_codes: int = 16,
    seed: int = 29,
    iters: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """OPQ training core (Ge, He, Ke, Sun — "Optimized Product
    Quantization", CVPR 2013; Faiss's ``OPQMatrix``): learn an
    orthogonal rotation R minimizing PQ quantization error by
    alternating (a) per-subspace L2 k-means on the rotated sample and
    (b) the orthogonal-Procrustes solve R = U·Vᵀ from the SVD of
    Xᵀ·X̂ (X̂ = the codebook reconstruction). Pure numpy over the
    BOUNDED normalized sample ``x`` — deterministic for a given
    (sample, m_subs, n_codes, seed, iters), which is what lets the
    DuckDB oracle re-derive bit-identical (rotation, codebooks)
    literals through THIS function. Returns (R: d×d, codebooks:
    (m_subs, n_codes, sub))."""
    x = np.asarray(x, dtype=np.float64)
    n, dim = x.shape
    if dim % m_subs:
        raise ValueError(f"dim {dim} not divisible by m_subs {m_subs}")
    sub = dim // m_subs

    def _train(y: np.ndarray) -> np.ndarray:
        sv = y.reshape(n, m_subs, sub)
        return np.stack(
            [
                _lloyd_kmeans_l2(sv[:, m, :], n_codes, seed + m)
                for m in range(m_subs)
            ]
        )

    def _reconstruct(y: np.ndarray, cb: np.ndarray) -> np.ndarray:
        sv = y.reshape(n, m_subs, sub)
        d = ((sv[:, :, None, :] - cb[None]) ** 2).sum(axis=3)
        codes = np.argmin(d, axis=2)  # ties → lower code id
        return cb[np.arange(m_subs)[None, :], codes].reshape(n, dim)

    rot = np.eye(dim)
    for _ in range(iters):
        y = x @ rot
        cb = _train(y)
        xhat = _reconstruct(y, cb)
        u, _sv, vt = np.linalg.svd(x.T @ xhat)
        rot = u @ vt
    # final codebooks consistent with the final rotation
    cb = _train(x @ rot)
    return rot, cb


def opq_trained(
    corpus: DataFrame,
    m_subs: int = 8,
    n_codes: int = 16,
    seed: int = 29,
    sample_rows: int = 256,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """TRAINED OPQ (rotation + codebooks) from the repo's standard
    bounded sample (the ``sample_rows`` lowest-id vectors,
    unit-normalized — corpus-size-independent, same O(1) contract as
    every trainer here). Feed the pair to :func:`pq_adc_topk` via its
    ``rotation=`` parameter: the index encodes rotated vectors, query
    LUTs rotate the query, and the exact re-rank runs on the ORIGINAL
    vectors (an orthogonal rotation preserves cosine)."""
    rows = [
        np.asarray(r[0], dtype=np.float64)
        for r in corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .select(vec_col)
        .limit(sample_rows)
        .collect()
    ]
    x = np.stack(rows)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return opq_rotation_codebooks_from_sample(
        x, m_subs=m_subs, n_codes=n_codes, seed=seed, iters=iters
    )


def _pq_encode_udf(codebooks: np.ndarray, rotation: np.ndarray | None = None):
    """vec -> array<int> of per-subspace code ids (nearest codebook
    entry by L2 over the unit-normalized vector's subvectors; ties →
    lower code id via argmin-first). One vectorized distance batch per
    Arrow batch — the codebooks (m_subs × n_codes × sub doubles, a few
    KB) ride in the task closure, the same shape as IVF assignment.
    ``rotation`` (OPQ): an orthogonal d×d matrix applied to the
    normalized vector BEFORE subspace split — one extra batch matmul,
    still map-only."""
    cb = np.asarray(codebooks, dtype=np.float64)  # (M, J, sub)
    rot = None if rotation is None else np.asarray(rotation, dtype=np.float64)
    m_subs, _, sub = cb.shape

    @F.pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        v = np.array([np.asarray(x, dtype=np.float64) for x in vecs])
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        if rot is not None:
            v = v @ rot
        s = v.reshape(len(v), m_subs, sub)
        # (batch, M, J): squared L2 between subvector and each code
        d = ((s[:, :, None, :] - cb[None]) ** 2).sum(axis=3)
        codes = np.argmin(d, axis=2)  # first min = lowest code id
        return pd.Series([row.astype("int32") for row in codes])

    return encode


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rotation: np.ndarray | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC) + exact re-rank — the third standard ANN scale path next to
    LSH and IVF (Jégou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011; the PQ half of Faiss's IVF-PQ).

    The corpus is ENCODED once: each unit-normalized vector becomes
    m_subs small code ids (a map-only pass; at scale the index stores
    m_subs bytes per vector instead of 4·dim — the 32× memory/scan
    compression is the point of PQ). Each query precomputes a lookup
    table LUT[m][j] = <query_sub_m, codebook[m][j]> driver-side (tiny:
    |queries|·m_subs·n_codes doubles), and the approximate similarity
    of a corpus vector is the JVM-side sum of m_subs LUT entries — no
    full-width dot product touches the corpus. The top ``rerank``
    candidates per query are re-ranked exactly on their full vectors
    (fetched by a broadcast id join, so the corpus full-vector column
    is scanned, never shuffled).

    Approximate scores are rounded to 6 dp BEFORE the candidate cutoff
    (ties then break on neighbor id) so the cutoff is reproducible
    across engines despite sum-association differences.

    Output matches the family: (query_id, neighbor_id, rank,
    cosine_sim)."""
    cb = np.asarray(codebooks, dtype=np.float64)

    c = corpus.select(
        F.col(id_col).alias("_cid"),
        _pq_encode_udf(cb, rotation)(
            _as_double(F.col(vec_col))
        ).alias("_codes"),
    )
    # bounded collect: the query SET is small by contract (same bound
    # as IVF's centroid slice); the corpus side stays fully distributed
    q_rows = queries.select(query_id_col, vec_col).orderBy(query_id_col).collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id_col} long, neighbor_id long, rank int, cosine_sim double"
        )
    luts = _query_luts(q_rows, cb, query_id_col, vec_col, rotation)
    lut_df = corpus.sparkSession.createDataFrame(
        luts, f"{query_id_col} long, _lut array<array<double>>"
    )
    # ADC: approx sim = ordered fold over subspaces of LUT[m][codes[m]]
    approx = (
        c.crossJoin(F.broadcast(lut_df))
        .filter(F.col(query_id_col) != F.col("_cid"))
        .select(query_id_col, "_cid", F.round(_adc_sum(), 6).alias("_asim"))
    )
    wa = Window.partitionBy(query_id_col).orderBy(
        F.col("_asim").desc(), F.col("_cid").asc()
    )
    cand = (
        approx.withColumn("_arn", F.row_number().over(wa))
        .filter(F.col("_arn") <= rerank)
        .select(query_id_col, "_cid")
    )
    return _exact_rerank(
        corpus, queries, cand, k, id_col, vec_col, query_id_col
    )


def _adc_sum() -> Column:
    """The shared ADC fold — sum over subspaces of LUT[m][codes[m]]
    over the fixed helper columns (_codes, _lut) — built once per
    process (exprcache): the three ADC call sites each paid ~50 py4j
    round trips rebuilding this identical lambda tree."""
    from bazof_spark.exprcache import cached_column

    return cached_column(
        ("sim.adc_sum", "_codes", "_lut"),
        lambda: F.aggregate(
            F.zip_with(
                "_codes",
                "_lut",
                lambda code, row: F.element_at(row, code + 1),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def _query_luts(
    q_rows,
    cb: np.ndarray,
    query_id_col: str,
    vec_col: str,
    rotation: np.ndarray | None = None,
):
    """Per-query ADC lookup tables, driver-side (tiny: |queries| ×
    m_subs × n_codes doubles): LUT[m][j] = <q_sub_m, cb[m][j]> over the
    unit-normalized (and, for OPQ, rotated) query."""
    m_subs, _, sub = cb.shape
    luts = []
    for r in q_rows:
        qv = np.asarray(r[vec_col], dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        if rotation is not None:
            qv = qv @ np.asarray(rotation, dtype=np.float64)
        qs = qv.reshape(m_subs, sub)
        lut = np.einsum("ms,mjs->mj", qs, cb)
        luts.append((r[query_id_col], [[float(x) for x in row] for row in lut]))
    return luts


def _exact_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    cand: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Exact top-k over a (query_id, _cid) candidate set: candidate ids
    are tiny → broadcast them INTO the corpus scan (the full-vector
    column is scanned, never shuffled); queries broadcast too."""
    qn = queries.select(
        F.col(query_id_col),
        normalize(_as_double(F.col(vec_col))).alias("_qv"),
    )
    rer = (
        corpus.select(
            F.col(id_col).alias("_cid"),
            normalize(_as_double(F.col(vec_col))).alias("_cv"),
        )
        .join(F.broadcast(cand), "_cid")
        .join(F.broadcast(qn), query_id_col)
        .select(
            query_id_col,
            "_cid",
            dot(F.col("_qv"), F.col("_cv")).alias("_sim"),
        )
    )
    wk = Window.partitionBy(query_id_col).orderBy(
        F.col("_sim").desc(), F.col("_cid").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            F.col("_cid").alias("neighbor_id"),
            "rank",
            F.col("_sim").alias("cosine_sim"),
        )
    )


def _residual_assign_encode_udf(centroids: np.ndarray, codebooks: np.ndarray):
    """vec -> array<int> [list_id, code_0..code_{m-1}] where codes
    quantize the RESIDUAL (v_norm − centroid[list_id]) — one Arrow
    batch pass computing both index structures of residual IVF-PQ."""
    C = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    m_subs, _, sub = cb.shape

    @F.pandas_udf("array<int>")
    def assign_encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        v = np.array([np.asarray(x, dtype=np.float64) for x in vecs])
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        lists = np.argmax(v @ C.T, axis=1)
        r = v - C[lists]
        s = r.reshape(len(v), m_subs, sub)
        d = ((s[:, :, None, :] - cb[None]) ** 2).sum(axis=3)
        codes = np.argmin(d, axis=2)
        out = np.concatenate([lists[:, None], codes], axis=1)
        return pd.Series([row.astype("int32") for row in out])

    return assign_encode


def residual_pq_codebooks_from_rows(
    rows: np.ndarray, centroids: np.ndarray, m_subs: int
) -> np.ndarray:
    """Deterministic RESIDUAL codebooks from a fixed corpus slice: code
    j of subspace m = the m-th subvector of row j's residual against
    its assigned centroid (argmax cosine, first-max ties) — the
    residual twin of :func:`pq_codebooks_from_rows`, keeping the whole
    index reproducible in a SQL oracle."""
    rows = np.asarray(rows, dtype=np.float64)
    rows = rows / np.maximum(np.linalg.norm(rows, axis=1, keepdims=True), 1e-12)
    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    lists = np.argmax(rows @ C.T, axis=1)
    res = rows - C[lists]
    n_codes, dim = res.shape
    if dim % m_subs:
        raise ValueError(f"dim {dim} not divisible by m_subs {m_subs}")
    sub = dim // m_subs
    cb = res.reshape(n_codes, m_subs, sub).transpose(1, 0, 2).copy()
    # rows ⊆ centroids makes every residual — hence every codebook
    # entry — exactly zero: ADC degenerates to the q·centroid bias and
    # the "index" silently stops indexing. Fail loudly instead: derive
    # codebooks from a slice DISJOINT from the centroid slice.
    if float(np.abs(cb).max(initial=0.0)) < 1e-9:
        raise ValueError(
            "residual codebooks are (near-)zero — the codebook rows "
            "coincide with their assigned centroids (rows == centroids "
            "degenerates every residual to 0); use a row slice disjoint "
            "from the centroid slice"
        )
    return cb


def _residual_codebooks_from_sample(
    x: np.ndarray, centroids: np.ndarray, m_subs: int, n_codes: int, seed: int
) -> np.ndarray:
    """numpy core of :func:`residual_pq_codebooks_trained`, shared with
    the DuckDB oracle builder so both engines embed IDENTICAL literals:
    assign each (unit-normalized) sample row to its nearest centroid by
    cosine (first-max ties), then per-subspace L2 Lloyd k-means on the
    RESIDUAL subvectors — k-means on residuals is what
    ``by_residual=true`` trains in Faiss (Jégou et al. 2011 §V)."""
    x = np.asarray(x, dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    lists = np.argmax(x @ C.T, axis=1)
    res = x - C[lists]
    n, dim = res.shape
    if dim % m_subs:
        raise ValueError(f"dim {dim} not divisible by m_subs {m_subs}")
    sub = dim // m_subs
    subvecs = res.reshape(n, m_subs, sub)
    cb = np.stack(
        [
            _lloyd_kmeans_l2(subvecs[:, m, :], n_codes, seed + m)
            for m in range(m_subs)
        ]
    )
    if float(np.abs(cb).max(initial=0.0)) < 1e-9:
        raise ValueError(
            "trained residual codebooks are (near-)zero — the sample "
            "coincides with the centroid set; train on a real corpus "
            "sample"
        )
    return cb


def residual_pq_codebooks_trained(
    corpus: DataFrame,
    centroids: np.ndarray,
    m_subs: int = 8,
    n_codes: int = 16,
    seed: int = 31,
    sample_rows: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: np.ndarray | None = None,
) -> np.ndarray:
    """TRAINED residual codebooks — the production counterpart of the
    fixed-slice :func:`residual_pq_codebooks_from_rows`, completing the
    Faiss-default column (by_residual=true + trained quantizers):
    per-subspace L2 k-means on the RESIDUALS of a bounded deterministic
    sample (the ``sample_rows`` lowest-id vectors) against the given
    coarse centroids. O(1) w.r.t. corpus size like every trainer here;
    fully deterministic for (corpus, centroids, m_subs, n_codes, seed,
    sample_rows) so a SQL oracle re-derives identical literals.
    ``sample`` (the RAW matrix of exactly that sample) skips the
    collect — see :func:`sample_lowest_id_vectors`."""
    if sample is None:
        sample = sample_lowest_id_vectors(corpus, sample_rows, id_col, vec_col)
    return _residual_codebooks_from_sample(
        np.asarray(sample, dtype=np.float64), centroids, m_subs, n_codes, seed
    )


def ivf_pq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — Faiss IVFADC's default
    (``by_residual=true``, Jégou et al. 2011 §V): codes quantize
    v − centroid[assigned list], which is smaller in norm than v
    itself, so the same code budget buys finer quantization. The ADC
    identity: q·v ≈ q·centroid_l + Σ_m <q_sub_m, cb[m][code_m]> — the
    per-(query, probed-list) BIAS q·centroid_l is a driver-side scalar
    and the LUT is list-independent, so scoring stays the broadcast
    equi-join on the list id that :func:`ivf_pq_topk` uses (scored
    volume ∝ n_probe/n_lists), plus one scalar add. Exact re-rank on
    full vectors as in the whole family; approx scores round to 6 dp
    before the cutoff for cross-engine reproducibility."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m_subs, _, sub = cb.shape
    cent = np.asarray(centroids, dtype=np.float64)
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    n_probe = min(n_probe, len(cent))

    enc = _residual_assign_encode_udf(cent, cb)(
        _as_double(F.col(vec_col))
    )
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        enc[0].alias("_list"),
        F.slice(enc, 2, m_subs).alias("_codes"),
    )
    q_rows = queries.select(query_id_col, vec_col).orderBy(query_id_col).collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id_col} long, neighbor_id long, rank int, cosine_sim double"
        )
    luts = dict(_query_luts(q_rows, cb, query_id_col, vec_col))
    probe_rows = []
    for r in q_rows:
        qv = np.asarray(r[vec_col], dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        top = np.argsort(-(qv @ cent.T), kind="stable")[:n_probe]
        for lid in top:
            probe_rows.append((
                r[query_id_col],
                int(lid),
                float(qv @ cent[lid]),  # the residual ADC bias q·c_l
                luts[r[query_id_col]],
            ))
    lut_df = corpus.sparkSession.createDataFrame(
        probe_rows,
        f"{query_id_col} long, _list int, _bias double, "
        "_lut array<array<double>>",
    )
    approx = (
        c.join(F.broadcast(lut_df), "_list")
        .filter(F.col(query_id_col) != F.col("_cid"))
        .select(
            query_id_col,
            "_cid",
            F.round(F.col("_bias") + _adc_sum(), 6).alias("_asim"),
        )
    )
    wa = Window.partitionBy(query_id_col).orderBy(
        F.col("_asim").desc(), F.col("_cid").asc()
    )
    cand = (
        approx.withColumn("_arn", F.row_number().over(wa))
        .filter(F.col("_arn") <= rerank)
        .select(query_id_col, "_cid")
    )
    return _exact_rerank(
        corpus, queries, cand, k, id_col, vec_col, query_id_col
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ: coarse inverted-file pruning composed with PQ/ADC
    scoring — the standard 100 TB ANN index shape (Faiss IVFADC, Jégou
    et al. 2011 §V; here the ``by_residual=false`` variant: codes
    quantize the vector itself, not the residual, so the same codebooks
    and encodings serve both the pure-ADC and the IVF-composed index).

    The corpus pass is map-only and produces BOTH index structures at
    once: the nearest-centroid list id (IVF assignment) and the m_subs
    PQ code ids. Each query probes its ``n_probe`` nearest lists and
    ADC-scores ONLY the codes in those lists — scored-candidate volume
    is ∝ corpus × n_probe / n_lists instead of the full corpus, which
    is what pure ADC (:func:`pq_adc_topk`) scans. Scoring joins the
    broadcast per-(query, probed-list) LUT relation on the list id; the
    top ``rerank`` approximate candidates re-rank exactly on full
    vectors. Approx scores round to 6 dp before the cutoff (ties →
    neighbor id) so the candidate set reproduces across engines.

    Output matches the family: (query_id, neighbor_id, rank,
    cosine_sim)."""
    cb = np.asarray(codebooks, dtype=np.float64)
    cent = np.asarray(centroids, dtype=np.float64)
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    n_probe = min(n_probe, len(cent))

    # ONE map-only corpus pass: coarse list id + PQ codes
    c = corpus.select(
        F.col(id_col).alias("_cid"),
        _list_assign_udf(cent, 1)(_as_double(F.col(vec_col)))[0].alias("_list"),
        _pq_encode_udf(cb)(_as_double(F.col(vec_col))).alias("_codes"),
    )
    q_rows = queries.select(query_id_col, vec_col).orderBy(query_id_col).collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id_col} long, neighbor_id long, rank int, cosine_sim double"
        )
    # per-query LUT + probed lists, driver-side (queries are bounded by
    # contract); one relation row per (query, probed list) so scoring is
    # an equi-join on the list id — only probed lists' codes are scored
    luts = dict(_query_luts(q_rows, cb, query_id_col, vec_col))
    probe_rows = []
    for r in q_rows:
        qv = np.asarray(r[vec_col], dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        top = np.argsort(-(qv @ cent.T), kind="stable")[:n_probe]
        for lid in top:
            probe_rows.append(
                (r[query_id_col], int(lid), luts[r[query_id_col]])
            )
    lut_df = corpus.sparkSession.createDataFrame(
        probe_rows,
        f"{query_id_col} long, _list int, _lut array<array<double>>",
    )
    approx = (
        c.join(F.broadcast(lut_df), "_list")
        .filter(F.col(query_id_col) != F.col("_cid"))
        .select(
            query_id_col,
            "_cid",
            F.round(_adc_sum(), 6).alias("_asim"),
        )
    )
    wa = Window.partitionBy(query_id_col).orderBy(
        F.col("_asim").desc(), F.col("_cid").asc()
    )
    cand = (
        approx.withColumn("_arn", F.row_number().over(wa))
        .filter(F.col("_arn") <= rerank)
        .select(query_id_col, "_cid")
    )
    return _exact_rerank(
        corpus, queries, cand, k, id_col, vec_col, query_id_col
    )
