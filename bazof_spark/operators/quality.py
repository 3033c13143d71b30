"""Model-assisted quality filtering: a logistic-regression scorer
DISTILLED from the Gopher rule filter — the CCNet/fastText-style
pattern where a hard rule set (or a curated seed) provides weak labels
and a trained model turns them into a SOFT, rankable quality score
(Rae et al. 2021 §A1.1 for the rules; Wenzek et al. 2019 for the
model-assisted shape).

Design follows the repo's trained-model pattern (IVF/PQ/PCA): the
MODEL is trained driver-side on a BOUNDED deterministic sample (the
``sample_rows`` lowest doc_ids — O(1) w.r.t. corpus size) with
deterministic full-batch gradient descent from zero init, and only the
scoring runs distributed — a map-only pass of pure Column expressions
(regexp counts + arithmetic, whole-stage codegen, zero shuffle).

Cross-engine honesty: the score emitted is the LOGIT, not the sigmoid
— a monotone-equivalent ranking whose value is pure +/*/÷ arithmetic
over integer regex counts, so it reproduces bit-for-bit in DuckDB
(libm ``exp`` may differ by ulps between engines; the logit cannot).
The Python feature twins below compute EXACTLY the values the Column/
SQL expressions produce (integer counts, double divisions in the same
order), which is what lets the oracle re-derive identical weights from
the same parquet sample.
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the Gopher-style feature set shared by the rule filter
#: (workload_ext.gopher_quality_filter), this model, and both oracles
_WORD_RE = r"[A-Za-z0-9_]+"
_LETTER_RE = r"[A-Za-z0-9_]"
_PUNCT_RE = r"[^\sA-Za-z0-9_]"
_STOP_RE = r"(?i)\b(the|and|of|to|a|in|is|that)\b"

N_FEATURES = 5  # words, mean word len, symbol ratio, stopwords, repetition


def feature_columns(t: Column) -> list[Column]:
    """The five features as Column expressions (doubles), in model
    order. Shapes mirror gopher_quality_filter exactly; zero-word /
    empty-text edges resolve to 0.0 so the arithmetic is total."""
    words = F.regexp_count(t, F.lit(_WORD_RE))
    letters = F.regexp_count(t, F.lit(_LETTER_RE))
    # identity form: length - word chars - whitespace. Negated
    # classes are ~10-20x slower in Spark's regex path (see
    # functions/text.punct_count); _PUNCT_RE stays the documented
    # semantic and the Python/SQL twins' literal form.
    punct = (
        F.length(t)
        - letters
        - F.regexp_count(t, F.lit(r"\s"))
    )
    stops = F.regexp_count(t, F.lit(_STOP_RE))
    n = F.length(t)
    mwl = F.when(words > 0, letters / words).otherwise(F.lit(0.0))
    sym = F.when(n > 0, punct / n).otherwise(F.lit(0.0))
    from bazof_spark.functions.repetition import word_repetition_ratio

    return [
        words.cast("double"),
        mwl,
        sym,
        stops.cast("double"),
        word_repetition_ratio(t),
    ]


def features_py(text: str) -> np.ndarray:
    """Python twin of :func:`feature_columns` — must produce the exact
    same doubles (integer counts; double divisions in the same order;
    repetition = 1 − distinct/total over the whitespace split of the
    trimmed text, the word_repetition_ratio formula)."""
    words = len(re.findall(_WORD_RE, text))
    letters = len(re.findall(_LETTER_RE, text))
    punct = len(re.findall(_PUNCT_RE, text))
    stops = len(re.findall(r"\b(?:the|and|of|to|a|in|is|that)\b", text,
                           re.IGNORECASE))
    n = len(text)
    mwl = letters / words if words > 0 else 0.0
    sym = punct / n if n > 0 else 0.0
    toks = re.split(r"\s+", text.strip()) if text.strip() else []
    rep = 1.0 - len(set(toks)) / len(toks) if toks else 0.0
    return np.array([float(words), mwl, sym, float(stops), rep])


def gopher_label_py(f: np.ndarray) -> int:
    """The rule filter's keep decision from the feature vector — the
    weak label the model distills (thresholds = gopher_quality_filter)."""
    words, mwl, sym, stops, rep = f
    return int(
        20 <= words <= 1000
        and words > 0
        and 3.0 <= mwl <= 10.0
        and sym <= 0.2
        and stops >= 2
        and rep <= 0.4
    )


def train_quality_lr(
    texts: list[str], iters: int = 300, lr: float = 0.5
) -> dict:
    """Deterministic logistic regression on standardized features
    against the Gopher labels: zero init, full-batch gradient descent,
    fixed iteration count — same (texts) → same model, always. Returns
    {w (N_FEATURES,), b, mu, sd} as plain floats."""
    x = np.stack([features_py(t) for t in texts])
    y = np.array([gopher_label_py(f) for f in x], dtype=np.float64)
    mu = x.mean(axis=0)
    sd = np.maximum(x.std(axis=0), 1e-12)
    xs = (x - mu) / sd
    w = np.zeros(x.shape[1])
    b = 0.0
    for _ in range(iters):
        z = xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (xs.T @ g) / len(y)
        b -= lr * float(g.mean())
    return {
        "w": [float(v) for v in w],
        "b": float(b),
        "mu": [float(v) for v in mu],
        "sd": [float(v) for v in sd],
    }


def distill_quality_lr(
    docs: DataFrame,
    sample_rows: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Train on the ``sample_rows`` lowest-id documents (bounded,
    deterministic — the same sampling contract as every trained model
    in this repo)."""
    texts = [
        r[0]
        for r in docs.select(id_col, text_col)
        .orderBy(id_col)
        .select(text_col)
        .limit(sample_rows)
        .collect()
    ]
    return train_quality_lr(texts)


def quality_lr_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Map-only scoring: (id, quality_logit, predicted_keep). The logit
    is the left-to-right chain w₀·g₀ + … + w₄·g₄ + b over standardized
    features gᵢ = (fᵢ − muᵢ)/sdᵢ — the identical association the SQL
    oracle writes, so values match exactly before the 6-dp rounding.
    predicted_keep = logit ≥ 0 (sigmoid ≥ 0.5 without computing it)."""
    feats = feature_columns(F.col(text_col))
    z: Column = F.lit(0.0)
    for i, f in enumerate(feats):
        g = (f - F.lit(model["mu"][i])) / F.lit(model["sd"][i])
        z = z + F.lit(model["w"][i]) * g
    z = z + F.lit(model["b"])
    return docs.select(
        F.col(id_col),
        F.round(z, 6).alias("quality_logit"),
        (z >= 0).alias("predicted_keep"),
    )
