"""Iterative graph algorithms, Spark-first.

Beyond-reference operators (the reference is a table format + SQL
engine with no iterative surface). PageRank here is the canonical
"iterative algorithm on a relational engine" shape that also powers
web-corpus curation (rank-weighted sampling of crawl graphs, harmonic
centrality filters à la Common Crawl):

- The graph is two DataFrames ((src, dst) edges, derived degrees) — no
  driver-side adjacency, no RDD API.
- One iteration = join ranks⋈edges on ``src`` (co-partitioned after the
  first shuffle), then ``groupBy(dst).sum`` — a single map-side-combined
  shuffle per iteration, the textbook Pregel superstep expressed
  relationally so Catalyst/AQE plan it (skew-join splitting applies to
  hub nodes for free).
- A fixed iteration count keeps lineage bounded; for long runs callers
  should ``localCheckpoint`` the rank relation every few supersteps
  (same discipline as operators/dedup's label propagation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 8,
    every_node_receives: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list, ``iterations`` synchronous
    supersteps from a uniform start. Output: (node, pr).

    Node set = every distinct endpoint. Dangling nodes (no out-edges)
    keep their teleport share but their rank mass is not redistributed —
    callers wanting the stochastic-matrix behavior should symmetrize the
    edge list (add reverse edges) or append sink self-loops first; the
    driver query does the former, which also guarantees every node
    receives contributions each step.

    ``every_node_receives=True`` asserts that guarantee (true for any
    symmetrized edge list: every node has an in-edge): the per-superstep
    left join against the node relation — whose only job is keeping
    contribution-less nodes at pure teleport — is then provably a no-op
    and is skipped, saving one join per superstep. Results are
    identical when the guarantee holds; leave it False for arbitrary
    directed graphs.

    All constants (N, per-node out-degree) are relations, not collected
    scalars: N is a 1-row aggregate cross-joined in (broadcast) ONCE —
    the teleport term rides on the node relation, built before the
    loop — and degrees join co-partitioned with the contribution
    shuffle.
    """
    from pyspark import StorageLevel

    # Iteration-invariant relations are built ONCE, persisted, and
    # shaped so each superstep moves as little data as possible:
    # - `w` folds the out-degree into a per-edge weight (1/outd) and is
    #   hash-partitioned by src BEFORE persisting — the per-superstep
    #   join reuses that partitioning, so only the small one-row-per-node
    #   rank relation shuffles to meet it (AQE turns it into a broadcast
    #   when it fits).
    # - the contribution reduce is a map-side-combined groupBy(dst):
    #   what crosses the wire is bounded by distinct dst per partition,
    #   not by edge count.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # the node set is computed ONCE and cached: N and the per-node
    # teleport/init terms both derive from the cache, so the edge-sized
    # distinct runs a single time (an uncached n1 would re-run it —
    # Spark does not share subplans across DataFrames). When every node
    # receives contributions, node set = dst set: half the distinct's
    # input and no union.
    if every_node_receives:
        node_base = e.select(F.col("dst").alias("node")).distinct()
    else:
        node_base = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    node_base = node_base.persist(StorageLevel.MEMORY_AND_DISK)
    n1 = node_base.agg(F.count(F.lit(1)).alias("_n"))
    # teleport term folded onto the node relation ONCE — supersteps
    # reuse it instead of re-broadcasting the 1-row count every round
    nodes = node_base.crossJoin(F.broadcast(n1)).select(
        "node",
        (F.lit(1.0) / F.col("_n")).alias("_pr0"),
        (F.lit(1.0 - damping) / F.col("_n")).alias("_tele"),
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_outd"))
    w = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("_outd")).alias("_w"))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ranks = nodes.select("node", F.col("_pr0").alias("pr"), "_tele")
    for i in range(iterations):
        contrib = w.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            "dst",
            (F.col("pr") * F.col("_w")).alias("_c"),
            F.col("_tele").alias("_t_src"),
        )
        if every_node_receives:
            # every node is some edge's dst ⇒ the inbound aggregate IS
            # the node set; fold teleport inside the same aggregate
            # (first() of the constant rides along for free) — no join
            ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
                (
                    F.first("_t_src")
                    + F.lit(damping) * F.sum("_c")
                ).alias("pr"),
                F.first("_t_src").alias("_tele"),
            )
        else:
            inbound = contrib.groupBy(F.col("dst").alias("node")).agg(
                F.sum("_c").alias("_in")
            )
            # left join keeps sources-only/dangling nodes at pure teleport
            ranks = nodes.join(inbound, "node", "left").select(
                "node",
                (
                    F.col("_tele")
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("pr"),
                "_tele",
            )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            # truncate lineage so plan size stays O(1) per superstep
            ranks = ranks.localCheckpoint(eager=True)
    # materialize the final (node-sized) result, then release the
    # edge-sized helper caches — without this every pagerank() call
    # leaks three persisted relations for the session's lifetime
    ranks = ranks.select("node", "pr").localCheckpoint(eager=True)
    for cached in (w, node_base, e):
        cached.unpersist()
    return ranks
