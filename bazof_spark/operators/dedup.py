"""Deduplication family for training-data pipelines.

Five strategies, each a DataFrame→DataFrame operator over a document
table, all shuffle-disciplined for 100 TB:

- exact:         one hash-groupBy on a digest — single shuffle of
                 (digest, id) pairs, map-side combined.
- minhash LSH:   shingle → minhash signature → band buckets →
                 self-join within buckets. The only join is on band
                 hash values (tiny keys); candidate verification is
                 per-pair arithmetic. No all-pairs comparison ever.
- simhash:       64-bit weighted-projection fingerprint; near-dup =
                 same fingerprint band bucket + Hamming ≤ r check.
- n-gram Jaccard: exact Jaccard over word shingles with a shared-
                 shingle join as the candidate generator (an inverted
                 index, not a cross join); frequency-capped to bound
                 skew from ultra-common shingles.
- embedding cosine: delegated to operators/similarity.py.

MinHash here is built from first principles with md5-based double
hashing (no external hash libs): one md5 per shingle provides two
independent 60/56-bit halves (h1, h2); permutation i's hash is
h1 + i*h2 (Kirsch–Mitzenmacher); signature = elementwise min over
shingles. Fully deterministic across runs and engines — the DuckDB
oracle recomputes the identical integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bazof_spark.exprcache import cached_column
from bazof_spark.functions.text import shingles


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id representative per exact text digest.
    Output: (digest, keep_id, n_copies). One shuffle, map-side combined."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup_source_priority(
    df: DataFrame,
    priority: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Exact dedup where the surviving copy is chosen by SOURCE
    priority — the production rule when duplicates span provenance
    tiers (a page present in a curated corpus AND a web crawl keeps the
    curated copy, whatever its id). ``priority`` lists sources best
    first; unlisted sources rank after every listed one, ties (same
    tier) break to the lowest id, so the choice is total and
    deterministic.

    Output: (digest, keep_id, keep_source, n_copies).

    Scale shape: identical to :func:`exact_dedup` — ONE map-side-
    combined groupBy on 16-byte digests; the winner is a min over a
    (rank, id) struct, so no window/second shuffle, and the priority
    list rides as a literal map expression (bytes, not a join)."""
    rank = F.create_map(
        *[
            x
            for i, s in enumerate(priority)
            for x in (F.lit(s), F.lit(i))
        ]
    )
    pr = F.coalesce(
        rank.getItem(F.col(source_col)), F.lit(len(priority))
    ).cast("int")
    return (
        df.select(
            F.md5(F.col(text_col)).alias("digest"),
            F.struct(
                pr.alias("pr"),
                F.col(id_col).cast("long").alias("id"),
                F.col(source_col).alias("src"),
            ).alias("_cand"),
        )
        .groupBy("digest")
        .agg(
            F.min("_cand").alias("_w"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(
            "digest",
            F.col("_w.id").alias("keep_id"),
            F.col("_w.src").alias("keep_source"),
            "n_copies",
        )
    )


def exact_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate group membership: (doc_id, rep_id) where rep_id
    is the minimum id sharing this row's text digest. Re-attach near-dup
    cluster labels computed on representatives to every copy with one
    broadcast/shuffle join on rep_id. Shuffle carries (digest, id) pairs
    only — never text."""
    return (
        df.select(F.md5(F.col(text_col)).alias("_digest"), F.col(id_col))
        .withColumn("rep_id", F.min(id_col).over(Window.partitionBy("_digest")))
        .select(F.col(id_col).alias("doc_id"), "rep_id")
    )


def _collapse_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One representative row (minimum id) per distinct text.

    This is the guard that makes LSH banding safe on real web corpora:
    1M byte-identical copies of one boilerplate page would land in the
    same (band, bhash) bucket and the self-join would emit ~n²/2 pairs
    BEFORE any similarity filter could run. Collapsing first makes exact
    copies cost one aggregate row; near-dup detection then runs over
    distinct texts only, and `exact_groups` re-expands cluster labels to
    the copies afterwards (linear, never pairwise).

    Shuffle shape: groupBy(digest) with first(text) is map-side
    combined, so at most one text per digest crosses the wire per input
    partition — on a heavily duplicated corpus this shuffles far LESS
    than the raw data."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("_digest"))
        .agg(
            F.min(id_col).alias(id_col),
            F.first(text_col).alias(text_col),
        )
        .drop("_digest")
    )


def _cap_buckets(df: DataFrame, keys: list[str], max_bucket_size: int) -> DataFrame:
    """Drop candidate buckets larger than `max_bucket_size` rows — the
    same skew guard as `max_shingle_freq` in :func:`ngram_jaccard_pairs`:
    a bucket of b rows feeds ~b²/2 pairs into the self-join, so one
    degenerate bucket (near-identical boilerplate that survives the
    exact-dup collapse) can dominate the whole job. Dropping it trades
    bounded recall loss for a hard quadratic ceiling.

    Implemented as a count window over the bucket keys: the window's
    exchange partitions by exactly the downstream join key, so the
    self-join reuses the partitioning instead of adding a shuffle."""
    return (
        df.withColumn(
            "_bc", F.count(F.lit(1)).over(Window.partitionBy(*keys))
        )
        .filter(F.col("_bc") <= max_bucket_size)
        .drop("_bc")
    )


# sentinel above any reachable hash value (h1 + i*h2 < 2^60 + 31*2^56 < 2^62)
_MINHASH_SENTINEL = 1 << 62


def minhash_signature(
    text: Column, num_hashes: int = 32, k: int = 3
) -> Column:
    """array<long> of `num_hashes` minhash values via double hashing
    (the Kirsch–Mitzenmacher construction): per shingle ONE md5 yields
    h1 = first 60 bits (15 hex chars) and h2 = next 56 bits (14 hex
    chars); permutation i's hash is ``h1 + i*h2`` and the signature is
    the elementwise min over shingles. One md5 per shingle instead of
    `num_hashes` — the hash dominates signature cost, so this is ~32×
    less digest work per document — while staying bit-reproducible in
    any engine with md5 + 64-bit integers (the DuckDB oracle recomputes
    it exactly; no overflow: h1 + 31*h2 < 2^62 fits a signed BIGINT).

    Built as ONE fold over the shingle array carrying all `num_hashes`
    running minima. The naive form (`array(array_min(transform(sh,...))
    × num_hashes)`) duplicates the shingle-construction subexpression
    per hash — after Catalyst's projection collapse that's num_hashes ×
    bands × join-sides copies, which blows up codegen (measured 160 s →
    <5 s for 500 docs on this rewrite)."""
    if num_hashes > 49:
        raise ValueError(
            f"num_hashes={num_hashes} > 49: h1 + i*h2 can pass the "
            "2^62 sentinel (saturating high-index slots and inflating "
            "est_jaccard) and overflows int64 near i=114 — use more "
            "bands/rows within 49 hashes instead"
        )
    # the tree depends only on (text expr, num_hashes, k) — build once
    # per process (opt round 1: ~0.25 s of py4j chatter per construction)
    return cached_column(
        ("minhash_signature", str(text), num_hashes, k),
        lambda: _minhash_signature_build(text, num_hashes, k),
    )


def _minhash_signature_build(text: Column, num_hashes: int, k: int) -> Column:
    sh = shingles(text, k)
    # nested transform so md5 runs once per shingle (HOF lambdas don't
    # get codegen subexpression elimination)
    hash_pairs = F.transform(
        F.transform(sh, lambda s: F.md5(s)),
        lambda m: F.struct(
            F.conv(F.substring(m, 1, 15), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(m, 16, 14), 16, 10).cast("long").alias("h2"),
        ),
    )
    seeds = F.sequence(F.lit(0).cast("long"), F.lit(num_hashes - 1).cast("long"))
    init = F.array_repeat(F.lit(_MINHASH_SENTINEL), num_hashes)
    return F.aggregate(
        hash_pairs,
        init,
        lambda acc, p: F.zip_with(
            acc,
            F.transform(seeds, lambda i: p["h1"] + i * p["h2"]),
            lambda a, h: F.least(a, h),
        ),
    )


def _banded_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    k: int,
) -> DataFrame:
    """(_id, _sig, band, bhash) — one row per (doc, band). Join key is
    (band, bhash): documents only meet if one full band matches, so
    downstream shuffles carry band keys + signatures, never text."""
    if bands <= 0 or bands > num_hashes or num_hashes % bands != 0:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} "
            "(bands > num_hashes would hash EMPTY bands — every doc "
            "colliding; a non-divisor silently ignores trailing "
            "signature slots)"
        )
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(F.col(text_col), num_hashes, k).alias("_sig"),
    )
    # the band array references only the fixed "_sig" name and literals
    # — cache the tree (opt round 1: the bands × rows listcomp alone was
    # ~0.33 s of py4j chatter per construction, twice per cross-table
    # query)
    band_expr = cached_column(
        ("banded_sig_bands", num_hashes, bands),
        lambda: F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at(
                                        F.col("_sig"), b * rows_per_band + r + 1
                                    ).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ),
    )
    return sig.select("_id", "_sig", band_expr.alias("_band")).select(
        "_id", "_sig", "_band.band", "_band.bhash"
    )


def _estimated_jaccard(num_hashes: int) -> Column:
    return F.size(
        F.filter(
            F.zip_with(F.col("l._sig"), F.col("r._sig"), lambda a, b: a == b),
            lambda x: x,
        )
    ) / F.lit(float(num_hashes))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.5,
    collapse_exact: bool = True,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH, verified by the
    signature-estimated Jaccard. Output: (id_a, id_b, est_jaccard) with
    id_a < id_b, est_jaccard >= threshold.

    Scale guards (both default-on):
    - `collapse_exact`: byte-identical copies collapse to one
      representative (minimum id) BEFORE banding, so a corpus with 1M
      copies of one page costs one aggregate row instead of ~n²/2
      self-join pairs. Exact-duplicate pairs therefore do NOT appear in
      the output — they are `exact_dedup`'s job (linear); use
      :func:`exact_groups` to re-attach copies to their
      representative's near-dup cluster.
    - `max_bucket_size`: (band, bhash) buckets larger than this are
      dropped (see :func:`_cap_buckets`) — distinct-but-near-identical
      boilerplate can still pile into one bucket after the collapse.
    """
    if collapse_exact:
        df = _collapse_exact(df, text_col, id_col)
    banded = _banded_signatures(df, text_col, id_col, num_hashes, bands, k)
    if max_bucket_size is not None:
        banded = _cap_buckets(banded, ["band", "bhash"], max_bucket_size)
    banded = banded.persist()  # both sides of the self-join read it: sigs computed once

    # estimate + threshold BEFORE the dedup shuffle: a pair matching in
    # k bands would otherwise cross the wire k times carrying both
    # signatures (~0.5 KB/row); this way only qualifying (id_a, id_b,
    # est) triples ever shuffle
    return (
        banded.alias("l")
        .join(
            banded.alias("r"),
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bhash") == F.col("r.bhash"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            _estimated_jaccard(num_hashes).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_lsh_pairs_between(
    probe: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    threshold: float = 0.5,
    collapse_exact: bool = False,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Cross-TABLE near-match detection — the decontamination primitive:
    find corpus documents near-duplicating any probe (eval-set) document.
    Output: (probe_id, corpus_id, est_jaccard), est >= threshold.

    Scale shape: the probe side is usually tiny (an eval set), so its
    banded signatures broadcast and the corpus never shuffles — the scan
    + signature fold is the whole corpus-side cost. Identical signature/
    banding math to :func:`minhash_lsh_pairs`, so thresholds calibrate
    once and transfer.

    Unlike the SELF-join operators, the degenerate-corpus guards default
    OFF here: there is no quadratic path to guard — every corpus row
    meets at most the (broadcast, eval-set-sized) probe band table, so
    cost and output are linear in the corpus even when 1M byte-identical
    copies all match a probe, and the default plan keeps the corpus
    entirely shuffle-free (measured 5× cheaper than the collapsing
    variant on a dup-free corpus). Opt into `collapse_exact` when the
    corpus is heavily duplicated and signature CPU dominates:
    byte-identical copies then band ONCE via their representative and
    matched representatives re-expand to every copy through an
    :func:`exact_groups` join, preserving the exact output contract.
    `max_bucket_size` likewise optionally caps corpus-side (band, bhash)
    buckets — a recall/robustness knob, not a scale-safety requirement.
    """
    if collapse_exact:
        corpus_banded_src = _collapse_exact(corpus, text_col, id_col)
    else:
        corpus_banded_src = corpus
    pb = _banded_signatures(probe, text_col, id_col, num_hashes, bands, k)
    cb = _banded_signatures(
        corpus_banded_src, text_col, id_col, num_hashes, bands, k
    )
    if max_bucket_size is not None:
        cb = _cap_buckets(cb, ["band", "bhash"], max_bucket_size)
    matches = (
        cb.alias("l")
        .join(
            F.broadcast(pb.alias("r")),
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bhash") == F.col("r.bhash"),
            ],
        )
        .select(
            F.col("r._id").alias("probe_id"),
            F.col("l._id").alias("corpus_id"),
            _estimated_jaccard(num_hashes).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["probe_id", "corpus_id"])
    )
    if not collapse_exact:
        return matches
    # re-expand representative matches to every exact copy: identical
    # text ⇒ identical signature ⇒ identical est_jaccard, so the copy
    # inherits its representative's score. Broadcast the (small) match
    # set; the groups side is one (digest, id) shuffle, never text.
    groups = exact_groups(corpus, text_col, id_col)
    return groups.join(
        F.broadcast(matches), groups["rep_id"] == matches["corpus_id"]
    ).select("probe_id", groups["doc_id"].alias("corpus_id"), "est_jaccard")


def ngram_decontaminate(
    corpus: DataFrame,
    probe: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_matches: int = 1,
) -> DataFrame:
    """Verbatim n-gram containment decontamination (the GPT-3 appendix-C
    / PaLM recipe, typically with 8-13-gram windows): flag corpus
    documents whose text contains at least ``min_matches`` occurrences
    of n-grams drawn from the POOLED probe (eval-set) gram set — the
    matches may come from different probe documents (argument order is
    (corpus, probe); both sides share a schema, so double-check call
    sites against this signature). Complementary to whole-document
    MinHash (:func:`minhash_lsh_pairs_between`): containment catches a
    corpus page that EMBEDS an eval item inside otherwise-unrelated
    text, which document-level similarity dilutes below threshold.
    Output: (corpus_id, n_matched, n_distinct_grams).

    Scale shape: the probe side collapses to a DISTINCT set of 8-byte
    xxhash64 gram keys (eval-set-sized — thousands of rows) and
    broadcasts; the corpus-side explode is map-only and the broadcast
    join filters it in place, so the only shuffle carries (corpus_id)
    pairs for MATCHED occurrences — on a clean corpus, almost nothing.
    Joining on 64-bit gram hashes instead of strings is the same
    accepted-collision trade as :func:`ngram_jaccard_pairs` (the oracle
    joins raw strings; ~n²/2⁶⁵ collision odds)."""
    probe_g = (
        probe.select(F.explode(shingles(F.col(text_col), n)).alias("_g"))
        .select(F.xxhash64("_g").alias("_gh"))
        .distinct()
    )
    corp_g = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.explode(shingles(F.col(text_col), n)).alias("_g"),
    ).select("corpus_id", F.xxhash64("_g").alias("_gh"))
    return (
        corp_g.join(F.broadcast(probe_g), "_gh")
        .groupBy("corpus_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.count_distinct("_gh").alias("n_distinct_grams"),
        )
        .filter(F.col("n_matched") >= min_matches)
    )


SIMHASH_BITS = 60


def simhash64(text_col: str, k: int = 3) -> Column:
    """SimHash over word k-gram shingles: per bit position, sum +1/-1
    votes across shingle hashes; fingerprint bit = sign of the sum.

    The per-shingle hash is the first 60 bits of md5 (15 hex chars →
    ``conv(..., 16, 10)``) — md5 is the one 64-bit-capable hash Spark and
    DuckDB compute identically, which makes the whole operator
    oracle-checkable cross-engine (DuckDB: ``CAST('0x' || substr(md5(s),
    1, 15) AS BIGINT)``). 60 bits (not 64) so the value always fits a
    signed BIGINT in both engines; Hamming semantics are unchanged.

    Built as one SQL higher-order-function expression: a single fold over
    the shingle hashes carrying an array of vote counters — O(S·60)
    arithmetic per doc with no Python round trip and a compact plan.
    Takes the column NAME (it is spliced into a SQL expr)."""
    b = SIMHASH_BITS
    words = f"split(trim({text_col}), '\\\\s+')"
    sh = (
        f"CASE WHEN size({words}) >= {k} THEN "
        f"transform(sequence(0, size({words}) - {k}), "
        f"i -> array_join(slice({words}, i + 1, {k}), ' ')) "
        f"ELSE array(array_join({words}, ' ')) END"
    )
    hashes = (
        f"transform({sh}, s -> "
        f"cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint))"
    )
    # Per-BIT scalar counting instead of a per-SHINGLE vote-array fold
    # (opt round 1, guide §1.2 "per-task work"): the old shape allocated
    # two fresh 64-element arrays per shingle (the transform + the
    # zip_with accumulator); this shape allocates nothing inside the
    # hot loop — bit b is set iff 2·(count of shingle hashes with bit
    # b) > |shingles|, which equals the old sign-of-votes rule exactly
    # (votes = 2·cnt − S > 0), so fingerprints are integer-identical
    # (verified: 0 differing rows over the sf0.1 corpus; measured ~40%
    # faster). `hashes` is LET-BOUND via the 1-element transform trick
    # (see shingles()) so the md5 pass still runs once per doc, not 64×.
    fingerprint = (
        f"element_at(transform(array({hashes}), hs -> "
        f"aggregate(transform(sequence(0, {b - 1}), bb -> "
        f"CASE WHEN 2 * aggregate(hs, 0, (c, x) -> c + "
        f"CASE WHEN (x & shiftleft(1L, bb)) != 0L THEN 1 ELSE 0 END) "
        f"> size(hs) THEN shiftleft(1L, bb) ELSE 0L END), "
        f"0L, (a, x) -> a | x)), 1)"
    )
    return F.expr(fingerprint)


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    k: int = 3,
    bands: int = 4,
    collapse_exact: bool = True,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming. Candidate
    generation: split the 64-bit fingerprint into `bands` 16-bit chunks —
    by pigeonhole any pair within Hamming r < bands shares ≥1 exact chunk
    — join on (chunk_index, chunk_value), then verify Hamming exactly.
    Output: (id_a, id_b, hamming).

    Scale guards mirror :func:`minhash_lsh_pairs`: `collapse_exact`
    folds byte-identical copies to one representative before chunking
    (exact pairs are `exact_dedup`'s job; re-attach via
    :func:`exact_groups`), and `max_bucket_size` drops (chunk, cval)
    buckets that would feed a quadratic self-join. With buckets dropped
    the pigeonhole recall guarantee holds for all surviving buckets.
    """
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands > max_hamming "
            f"(got {bands}): the pigeonhole guarantee — some band "
            "unchanged for every pair within the Hamming budget — "
            "requires more bands than differing bits"
        )
    if collapse_exact:
        df = _collapse_exact(df, text_col, id_col)
    fp = df.select(
        F.col(id_col).alias("_id"), simhash64(text_col, k).alias("_fp")
    )
    chunk_bits = 64 // bands
    mask = (1 << chunk_bits) - 1
    chunked = fp.select(
        "_id",
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("_fp"), i * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("cval"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("_c"),
    ).select("_id", "_fp", "_c.chunk", "_c.cval")
    if max_bucket_size is not None:
        chunked = _cap_buckets(chunked, ["chunk", "cval"], max_bucket_size)
    chunked = chunked.persist()  # read by both sides of the self-join
    l, r = chunked.alias("l"), chunked.alias("r")
    # verify Hamming BEFORE the dedup shuffle (see minhash_lsh_pairs):
    # only qualifying triples cross the wire
    hamming = F.bit_count(F.col("l._fp").bitwiseXOR(F.col("r._fp")))
    return (
        l.join(
            r,
            on=[
                F.col("l.chunk") == F.col("r.chunk"),
                F.col("l.cval") == F.col("r.cval"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Collapse near-dup PAIRS into CLUSTERS — the step a training
    pipeline runs after any pair generator here (minhash/simhash/
    jaccard/embedding): connected components, one representative (the
    minimum id) per component. Output: (doc_id, cluster_rep,
    cluster_size) for every document that appears in at least one pair;
    keep `doc_id == cluster_rep` (plus all unpaired documents) to dedup
    a corpus.

    Algorithm: Pregel-style iterative min-label propagation — each
    round every node takes the min label among itself and its
    neighbors; fixpoint = components. Rounds needed = graph diameter
    (near-dup clusters are small and dense, so a handful); each round
    is one join + one aggregate on the EDGE list, i.e. O(E) shuffle per
    round, never materializing anything quadratic. The driver-side loop
    with a convergence count is the standard Spark shape for iterative
    graph algorithms (GraphX/Pregel does the same under the hood);
    ``localCheckpoint`` truncates lineage so plans stay O(1) per round.

    Deterministic fixpoint → exactly reproducible by the DuckDB
    oracle's recursive-CTE transitive closure.

    Hybrid execution (same results either way): when the pair list is
    below ``driver_threshold`` edges, components are solved with one
    driver-side union-find over the collected pairs — near-dup edge
    sets are usually a sliver of the corpus, and one collect beats
    paying several join rounds of job latency. Above the threshold the
    distributed propagation loop runs; nothing quadratic ever
    materializes in either path. (Same size-dependent discipline as
    broadcast-vs-shuffle join selection.)
    """
    _INTEGRAL = ("tinyint", "smallint", "int", "bigint")
    dts = dict(pairs.dtypes)
    for c in (id_a, id_b):
        if dts.get(c) not in _INTEGRAL:
            # a silent cast would turn string/UUID ids into NULLs and
            # collapse every edge into one garbage null component
            raise ValueError(
                f"dedup_clusters needs integral ids; {c!r} is "
                f"{dts.get(c)} — hash non-numeric ids first "
                "(e.g. F.xxhash64(id))"
            )
    edges = pairs.select(
        F.col(id_a).cast("long").alias("src"),
        F.col(id_b).cast("long").alias("dst"),
    ).persist()  # the size probe and the solve both read the edge list;
    # without this the upstream pair GENERATOR (an LSH join pipeline)
    # would execute twice
    # ONE bounded job decides the path AND delivers the driver-side
    # edge list (opt round 1): the old shape ran a limit+count probe
    # and then a separate collect — same bound, two jobs. Union-find
    # by min-id is edge-order independent, so collecting via limit
    # changes nothing below the threshold; above it the head is
    # discarded and the distributed loop runs as before.
    head = edges.limit(driver_threshold + 1).collect()
    if len(head) <= driver_threshold:
        spark = pairs.sparkSession
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in head:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:  # union by MIN id so rep == component min
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        comp = [(x, find(x)) for x in parent]
        sizes: dict[int, int] = {}
        for _, rep in comp:
            sizes[rep] = sizes.get(rep, 0) + 1
        edges.unpersist()  # fully materialized driver-side; drop the cache
        return spark.createDataFrame(
            [(x, rep, sizes[rep]) for x, rep in comp],
            "doc_id long, cluster_rep long, cluster_size long",
        )

    directed = edges
    edges = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                labels["id"],
                F.least(
                    labels["lbl"], F.coalesce(F.col("nlbl"), labels["lbl"])
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise BazofError(
            f"dedup_clusters did not converge in {max_iters} rounds "
            f"({changed} labels still changing) — the component "
            "diameter exceeds max_iters; raise it (rounds are O(E) "
            "each) rather than accept mid-propagation labels"
        )
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("cluster_size"))
    # labels is checkpointed: the result no longer references the edges
    directed.unpersist()
    edges.unpersist()
    return (
        labels.join(sizes, "lbl")
        .select(
            F.col("id").alias("doc_id"),
            F.col("lbl").alias("cluster_rep"),
            "cluster_size",
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """EXACT Jaccard similarity over distinct word k-gram shingles for
    every pair sharing at least one shingle. Output:
    (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.

    Inverted-index join: explode distinct shingles, drop shingles that
    occur in more than `max_shingle_freq` docs (skew guard — an
    ultra-common shingle would otherwise create a quadratic bucket),
    self-join on shingle, count shared, then |A∪B| = |A|+|B|-shared.

    Shingle strings never reach the output, so the join/groupBy keys are
    their xxhash64 (8-byte fixed keys instead of dozens-of-bytes strings
    — materially less shuffle volume at corpus scale). A 64-bit
    collision merging two distinct shingles within one pair's shingle
    sets is the standard accepted risk (~n²/2⁶⁵ per doc pair).
    """
    # distinct-shingle set size is computed BEFORE the explode and
    # carried through it (8 bytes/row) — no separate sizes aggregate,
    # no join-back, and it enables the size bound below
    exploded = (
        df.select(
            F.col(id_col).alias("_id"),
            F.array_distinct(shingles(F.col(text_col), k)).alias("_arr"),
        )
        .select(
            "_id",
            F.size("_arr").alias("_n"),
            F.explode("_arr").alias("_s"),
        )
        .select("_id", "_n", F.xxhash64("_s").alias("sh"))
    )
    # frequency cap as a count window over sh — the same discipline as
    # _cap_buckets: the window's exchange partitions by exactly the
    # self-join key, so the join reuses the partitioning. The previous
    # aggregate-then-join shape paid a separate groupBy(sh) exchange
    # PLUS a join against it (measured 2.3 s -> 1.7 s at sf0.1 on this
    # rewrite; row-for-row identical output). Persisting AFTER the
    # window keeps the cache hash-partitioned by sh for both sides.
    pruned = (
        exploded.withColumn(
            "_f", F.count(F.lit(1)).over(Window.partitionBy("sh"))
        )
        .filter(F.col("_f") <= max_shingle_freq)
        .drop("_f")
        .persist()
    )
    l, r = pruned.alias("l"), pruned.alias("r")
    # size bound (set-similarity join positional/length filter):
    # jaccard(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs whose set
    # sizes differ by more than the threshold ratio are pruned AT the
    # join — they never reach the per-pair aggregate
    size_ok = F.least(F.col("l._n"), F.col("r._n")) >= F.lit(
        threshold
    ) * F.greatest(F.col("l._n"), F.col("r._n"))
    shared = (
        l.join(
            r,
            on=[
                F.col("l.sh") == F.col("r.sh"),
                F.col("l._id") < F.col("r._id"),
                size_ok,
            ],
        )
        .groupBy(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("_shared"),
            F.first(F.col("l._n")).alias("_na"),
            F.first(F.col("r._n")).alias("_nb"),
        )
    )
    jac = F.col("_shared") / (F.col("_na") + F.col("_nb") - F.col("_shared"))
    return (
        shared.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def edit_distance_pairs(
    df: DataFrame,
    max_dist: int = 16,
    prefix_len: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    collapse_exact: bool = True,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Bounded edit-distance near-duplicate pairs — the fuzzy-match
    complement to the token-set families (MinHash/Jaccard measure
    shared vocabulary; Levenshtein catches character-level edits like
    OCR noise and template fills that keep length but shift tokens).

    Scale shape:
    - candidates come from an equi-join on the first ``prefix_len``
      characters — standard blocking; docs edited in the head are
      missed by one pass (run a second pass keyed on a suffix or
      sorted-neighborhood window to close it);
    - the length-difference bound sits INSIDE the join condition
      (``|len(a)-len(b)| > d ⇒ dist > d``), pruning before any
      distance work;
    - verification is Spark's thresholded Levenshtein kernel
      (JVM-side, O(d·min(n,m)) banded, returns -1 over budget) — never
      the full O(n·m) matrix;
    - ``collapse_exact`` (default on, like the LSH families) keeps one
      representative per byte-identical text BEFORE blocking — exact
      copies under the bucket cap would otherwise emit quadratic
      zero-distance pairs; exact duplication is `exact_dedup`'s job;
    - ``max_bucket_size`` drops degenerate blocking buckets, the same
      guard as the LSH families.

    Output: (id_a, id_b, edit_dist) with id_a < id_b, dist ≤ max_dist.
    """
    if collapse_exact:
        df = _collapse_exact(df, text_col, id_col)
    base = df.select(
        F.col(id_col),
        F.col(text_col),
        F.substring(F.col(text_col), 1, prefix_len).alias("_p"),
        F.length(F.col(text_col)).alias("_ln"),
    )
    if max_bucket_size is not None:
        base = _cap_buckets(base, ["_p"], max_bucket_size)
    base = base.persist()  # both join sides read it: without this the
    # cap window's full-text shuffle (and the scan) runs twice
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("_ta"),
        F.col("_p"),
        F.col("_ln").alias("_la"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("_tb"),
        F.col("_p"),
        F.col("_ln").alias("_lb"),
    )
    pairs = a.join(
        b,
        on=[
            a["_p"] == b["_p"],
            F.col("id_a") < F.col("id_b"),
            F.abs(F.col("_la") - F.col("_lb")) <= max_dist,
        ],
    )
    return (
        pairs.withColumn(
            "edit_dist", F.levenshtein(F.col("_ta"), F.col("_tb"), max_dist)
        )
        .filter(F.col("edit_dist") >= 0)
        .select("id_a", "id_b", "edit_dist")
    )


def span_dedup_stats(
    docs: DataFrame,
    chunk_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide duplicated-SPAN detection: split every document into
    non-overlapping ``chunk_tokens``-word chunks, mark each chunk whose
    exact text already occurred earlier in the corpus (first occurrence
    = lowest (doc_id, chunk_id)), and report per-document duplication
    stats — the chunk-granularity approximation of exact substring
    dedup (RefinedWeb / "Deduplicating Training Data Makes Language
    Models Better" run suffix-array substring dedup; at 100 TB the
    chunk rasterization is the standard first cut because it stays
    map + one hash shuffle).

    Output: (doc_id, n_chunks, n_dup_chunks, dup_frac) — one row per
    document; ``dup_frac`` is the fraction of the document's chunks
    that are repeats of earlier corpus text (candidates for removal).

    Scale shape: chunking is map-only (operators/chunking.py — split/
    slice expressions, no UDF); first-occurrence is ONE exchange keyed
    on the chunk md5 (uniformly distributed — no skew beyond true
    duplicate mass, and group work is linear in group size: no pair
    generation anywhere); the per-doc rollup is a second map-side-
    combined shuffle on doc_id. Nothing is quadratic in corpus size or
    in the size of a duplicate cluster."""
    from bazof_spark.operators.chunking import chunk_documents

    chunks = chunk_documents(
        docs, chunk_tokens=chunk_tokens, overlap=0,
        id_col=id_col, text_col=text_col,
    ).select(id_col, "chunk_id", F.md5("chunk_text").alias("_h"))
    first = F.min(F.struct(id_col, "chunk_id")).over(
        Window.partitionBy("_h")
    )
    marked = chunks.withColumn(
        "_dup",
        (F.struct(id_col, "chunk_id") != first).cast("int"),
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("_dup").alias("n_dup_chunks"),
        F.round(F.sum("_dup") / F.count(F.lit(1)), 6).alias("dup_frac"),
    )
