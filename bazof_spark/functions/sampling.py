"""Deterministic dataset splitting & sampling for training pipelines.

At 100 TB you cannot re-randomize: the train/val/test assignment of a
document must be a pure function of its identity so every pipeline run,
every engine, and every incremental re-processing agrees. Standard
practice is hash-bucketing: bucket = md5(id) mod N; splits are bucket
ranges. All JVM-side expressions (no UDF, no RNG, no shuffle — a split
assignment is a map-only projection), reproducible bit-for-bit in any
engine with md5 (the DuckDB oracles recompute it).

``Sampling`` by rate is the same mechanism with a finer modulus: keep a
row iff its bucket over 1e6 falls below rate*1e6 — stable under data
growth (a kept row stays kept), unlike ``df.sample`` whose output
depends on partitioning and seed plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars of md5 → 60-bit uint, same cross-engine idiom as the
# simhash/minhash operators (DuckDB: CAST('0x' || substr(md5(x),1,15)
# AS BIGINT))
_MOD_FINE = 1_000_000


def hash_bucket(id_col: Column, n_buckets: int, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets) from the row identity. ``salt``
    derives independent bucketings (e.g. one for split, one for
    sampling) from the same ids."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % n_buckets


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (language rebalancing, domain
    mixing): keep a row iff its identity bucket over 1e6 falls below
    its stratum's rate — a map-only projection, stable under appends
    and engine-portable like the rest of this module. Strata absent
    from ``fractions`` keep ``default`` (0 = drop).

    Cutoffs are integerized DRIVER-side (round(rate*1e6)): an in-plan
    `rate * 1e6` cast differs between engines for rates whose product
    lands just below an integer in float64 (Spark's cast truncates,
    DuckDB's rounds — e.g. 0.35 → 349999.99999999994), so the integer
    grid is fixed once here and both engines compare against the same
    literals."""
    bucket = hash_bucket(F.col(id_col), _MOD_FINE, salt)
    mapping = F.create_map(
        *[
            lit
            for s, rate in fractions.items()
            for lit in (F.lit(s), F.lit(int(round(rate * _MOD_FINE))))
        ]
    )
    cutoff = F.coalesce(
        mapping[F.col(strata_col)],
        F.lit(int(round(float(default) * _MOD_FINE))),
    )
    return df.filter(bucket < cutoff)


def assign_split(
    id_col: Column,
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "",
) -> Column:
    """'train' | 'val' | 'test' with the given fractions (test gets the
    remainder). Fractions are applied on a 1e6-bucket grid, so
    train=0.8 means exactly buckets [0, 800000)."""
    if not 0 < train < 1 or val < 0 or train + val > 1:
        raise ValueError("need 0 < train < 1, val >= 0, train + val <= 1")
    b = hash_bucket(id_col, _MOD_FINE, salt)
    t_hi = int(train * _MOD_FINE)
    v_hi = t_hi + int(val * _MOD_FINE)
    return (
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    pct: dict[str, int],
    budget_num: int = 2,
    budget_den: int = 5,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic dataset-mixture resampling: draw a corpus-wide
    budget of ``floor(N * budget_num / budget_den)`` rows whose stratum
    proportions match ``pct`` (integer percentages, e.g. ``{"en": 30,
    "de": 20, ...}``) — the data-mixing step that turns a crawl's
    natural language/source skew into a training mixture. Output: the
    selected rows as (id, stratum, mix_rank) with ``mix_rank`` the
    1-based selection rank within the stratum.

    Every quantity is integer arithmetic on exact counts (no float
    rates), so Spark and the DuckDB oracle agree bit-for-bit:
    ``target_s = (N * budget_num // budget_den) * pct[s] // 100``.

    Scale shape — oversample-then-trim, so no window ever sees a whole
    stratum: (1) one map-side-combined count per stratum (tiny result,
    collected); (2) a map-only hash prefilter keeps rows whose identity
    bucket falls below ``target_s/count_s`` with a 2× + 5% margin —
    expected survivors are O(target), not O(corpus); (3) an exact
    (hash, id) rank inside the survivors picks the first ``target_s``.
    The margin makes a short stratum (fewer than ``target_s``
    survivors) a < e^-target/4 probability event — and even then the
    output is deterministic, merely short. A stratum absent from
    ``pct`` is dropped.
    """
    if sum(pct.values()) > 100:
        raise ValueError("pct must sum to <= 100")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    }
    total = sum(counts.values())
    budget = total * budget_num // budget_den
    targets = {
        s: min(budget * p // 100, counts.get(s, 0)) for s, p in pct.items()
    }
    cutoffs = {
        s: min(_MOD_FINE, (t * 2 * _MOD_FINE) // counts[s] + 50_000)
        for s, t in targets.items()
        if counts.get(s)
    }
    if not cutoffs:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, {stratum_col} string, mix_rank long"
        )
    bucket = hash_bucket(F.col(id_col), _MOD_FINE, salt)
    cutoff_map = F.create_map(
        *[lit for s, c in cutoffs.items() for lit in (F.lit(s), F.lit(c))]
    )
    target_map = F.create_map(
        *[lit for s, t in targets.items() for lit in (F.lit(s), F.lit(t))]
    )
    from pyspark.sql.window import Window

    pre = (
        df.select(F.col(id_col), F.col(stratum_col), bucket.alias("_h"))
        .filter(F.col("_h") < F.coalesce(cutoff_map[F.col(stratum_col)], F.lit(0)))
    )
    w = Window.partitionBy(stratum_col).orderBy("_h", id_col)
    return (
        pre.withColumn("mix_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("mix_rank") <= target_map[F.col(stratum_col)])
        .select(id_col, stratum_col, "mix_rank")
    )


def deterministic_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen purely by identity hash: stable
    across runs, engines, and incremental appends (a row's fate never
    changes). Map-only — the filter pushes into the scan's projection
    pipeline; no shuffle, no RNG state."""
    if not 0 < rate <= 1:
        raise ValueError("rate must be in (0, 1]")
    keep = int(rate * _MOD_FINE)
    return df.filter(hash_bucket(F.col(id_col), _MOD_FINE, salt) < keep)


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    k: int,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group — the
    Efraimidis–Spirakis exponential-key scheme made deterministic:
    each row draws u = (h+1)/(H+1) from its identity hash (never 0/1),
    gets key = -ln(u)/w ~ Exp(w), and the k SMALLEST keys per group win
    — inclusion probability proportional to weight, stable across
    runs/engines/appends like every sampler in this module (a kept row
    can only be displaced by a new heavier/luckier row, never by
    re-randomization).

    Plan: the key is a map-only projection (one md5, one ln); selection
    is one rank window per group — a single hash shuffle whose rows
    carry (group, key, id). Rows with NULL or non-positive weight are
    excluded (they have no sampling mass). Output: input columns +
    ``sample_rank`` (1..k by ascending key).

    100 TB note: for group counts ≫ k use the two-pass variant — a
    per-partition top-k partial (Algorithm A-ES is mergeable: keep the
    k smallest keys of any union) before the global window — same
    contract as the KMV sketch's bounded partials; this one-window form
    is the readable reference implementation and is already map-side
    bounded by Spark's WindowGroupLimit pushdown for rank <= k.
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1.0)) / F.lit(float((1 << 60) + 1))
    key = -F.log(u) / F.col(weight_col)
    w = Window.partitionBy(*group_cols).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def temperature_weights(
    df,
    group_col: str = "lang",
    alpha: float = 0.3,
    budget: int = 10000,
):
    """Multilingual temperature resampling — the published recipe for
    balancing language mixes in pretraining data (XLM-R / mT5 style:
    sample language l with probability proportional to
    (n_l / N) ** alpha, alpha≈0.3, which up-weights tail languages
    without flattening the mix entirely).

    Returns one row per group: document count, the raw share, the
    tempered share, the boost factor (tempered / raw — >1 means the
    language is up-sampled, i.e. seen for more epochs), and the
    expected document budget at ``budget`` total samples.

    Plan: one map-side-combined count per group, then the tempered
    normalization over the (tiny, ≤ distinct-group-count) aggregate —
    a broadcast-sized relation at any corpus scale; the corpus itself
    is scanned exactly once. The count relation is MATERIALIZED
    (eager localCheckpoint) before the two-level normalization: it is
    referenced four times through totals/pows/z and Spark shares no
    subplans across DataFrame references, so the unmaterialized shape
    re-ran the corpus count per reference (opt round 1, guide §2.4 —
    measured 4 corpus scans in the plan). The relation is ≤
    distinct-group-count rows, so the checkpoint is O(groups) however
    large the corpus; interleaved A/B picked it over persist() (0.43 s
    vs 0.55 s vs 0.52 s unmaterialized at sf0.1). Same rows, same
    aggregation order, identical output."""
    from pyspark.sql import functions as F

    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(
        F.sum("n_docs").alias("_total"),
    )
    pows = counts.crossJoin(F.broadcast(totals)).select(
        group_col,
        "n_docs",
        (F.col("n_docs") / F.col("_total")).alias("_p_raw"),
        F.pow(F.col("n_docs") / F.col("_total"), F.lit(alpha)).alias("_pw"),
    )
    z = pows.agg(F.sum("_pw").alias("_z"))
    return (
        pows.crossJoin(F.broadcast(z))
        .select(
            group_col,
            "n_docs",
            F.round("_p_raw", 6).alias("p_raw"),
            F.round(F.col("_pw") / F.col("_z"), 6).alias("p_tempered"),
            F.round((F.col("_pw") / F.col("_z")) / F.col("_p_raw"), 6)
            .alias("boost"),
            F.round(F.col("_pw") / F.col("_z") * budget, 2)
            .alias("expected_docs"),
        )
    )
