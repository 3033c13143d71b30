"""PCA projection for embedding columns — the dimensionality-reduction
pass a training-data pipeline runs before indexing/clustering (and the
basis of PCA-whitening): project each vector onto the top-k principal
components of the corpus.

Design for 100 TB and for cross-engine verification, following the
repo's trained-model pattern (IVF/PQ training in
operators/similarity.py): the MODEL is computed driver-side from a
BOUNDED deterministic sample (the ``sample_rows`` lowest-id vectors —
O(1) w.r.t. corpus size, same contract as ``_train_centroids``), and
only the projection runs distributed. numpy's symmetric ``eigh`` is
deterministic for a given sample; eigenvector sign is fixed by making
each component's largest-|entry| coordinate positive, so the model is
bit-reproducible and a SQL oracle can embed the identical components
as literals.

The projection itself exploits linearity to stay a single JVM-side
fold per component: (v − mean)·c = v·c − mean·c, where mean·c is a
precomputed scalar — no per-row centering array, no Python UDF, and
the left-to-right double fold matches DuckDB's ``list_dot_product``
exactly (the same equivalence every cosine query in this repo relies
on), so results reproduce bit-for-bit before the 6-dp rounding.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bazof_spark.operators.similarity import _as_double


def pca_model_from_sample(
    corpus: DataFrame,
    n_components: int = 8,
    sample_rows: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """(components (k × dim), mean (dim,)) from the bounded sample:
    mean-centered covariance → ``np.linalg.eigh`` → top-k eigenvectors
    by descending eigenvalue, each sign-fixed (largest-|entry|
    coordinate made positive — ``argmax`` takes the first maximum, so
    the convention is total)."""
    rows = [
        np.asarray(r[0], dtype=np.float64)
        for r in corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .select(vec_col)
        .limit(sample_rows)
        .collect()
    ]
    x = np.stack(rows)
    mean = x.mean(axis=0)
    xc = x - mean
    cov = (xc.T @ xc) / len(x)
    vals, vecs = np.linalg.eigh(cov)  # ascending; columns are vectors
    order = np.argsort(vals)[::-1][:n_components]
    comps = vecs[:, order].T.copy()  # (k, dim)
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, mean


def pca_project(
    corpus: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Map-only projection: (id, pc array<double> of length k), where
    pc[i] = (v − mean)·c_i computed as v·c_i − mean·c_i. The model
    rides as ONE broadcast row (k·dim doubles — literals at this size
    would bloat the plan the way the LSH hyperplanes did); scoring is
    a nested JVM fold inside the zip over components, so the corpus
    pass has zero Python and zero shuffles."""
    comps = np.asarray(components, dtype=np.float64)
    mean = np.asarray(mean, dtype=np.float64)
    mdots = comps @ mean  # (k,) scalars: mean·c_i
    model = corpus.sparkSession.createDataFrame(
        [(
            [[float(x) for x in c] for c in comps],
            [float(x) for x in mdots],
        )],
        "_comps array<array<double>>, _mdots array<double>",
    )
    return (
        corpus.select(
            F.col(id_col), _as_double(F.col(vec_col)).alias("_v")
        )
        .crossJoin(F.broadcast(model))
        .select(
            id_col,
            F.zip_with(
                "_comps",
                "_mdots",
                lambda c, md: F.aggregate(
                    F.zip_with(F.col("_v"), c, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                - md,
            ).alias(out_col),
        )
    )
