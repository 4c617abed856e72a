"""Graph analytics over edge lists: random-walk centrality (PageRank).

Companion to the label-propagation connected components in
``operators.dedup`` — together they cover the two iterative graph shapes a
curation pipeline needs: "which docs belong to the same near-dup group"
(components) and "which nodes are most central" (PageRank — e.g. ranking
canonical pages in a crawl graph, or hub documents in a citation/link
graph, before sampling training data).

Scale shape per iteration: one join (edges ⋈ ranks, equi on src) + one
groupBy-sum shuffle on dst — the standard edge-partitioned power
iteration; the graph never leaves the executors and lineage is truncated
per round exactly like ``dedup_clusters`` (reliable ``checkpoint()`` when
a checkpoint dir exists, else ``localCheckpoint``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 5,
) -> DataFrame:
    """Bounded power-iteration PageRank over a directed edge list.

    Variant implemented (stated precisely so the exactness test can mirror
    it): ranks initialize to 1.0 per node; each iteration sets
    ``rank(v) = (1 - d) + d * Σ_{(u,v)∈E} rank(u) / out_degree(u)``;
    dangling nodes (no out-edges) keep receiving but do not redistribute
    (their mass leaks — the simple variant, fine for relative ranking).
    Ranks are rounded to 9 dp each iteration so float combine-order noise
    cannot compound across rounds (the ``kmeans_assign`` determinism
    trick); node set = every endpoint of any edge.

    Local mode returns ranks with the final 1-2 rounds' lineage attached
    (sized for ONE downstream action); callers running several actions on
    the result should persist/checkpoint it themselves. Reliable mode
    (a checkpoint dir set) always returns durably checkpointed ranks.
    """
    sc = edges.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None
    # Materialize the edge list ONCE before anything fans out from it: the
    # caller's edge derivation is often the expensive part (e.g. the
    # inverted-index near-dup join in x98), and nodes/out_deg/weighted
    # would each recompute it — a lazy cache() still computes it twice
    # inside the first multi-branch job (no cross-branch reuse before the
    # cache is populated).
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.checkpoint(eager=True) if reliable else e.localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # pre-divide: each edge carries its 1/deg weight once, not per iteration
    weighted = e.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    ).cache()
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))

    try:
        for it in range(iters):
            contribs = (
                weighted.join(ranks, weighted.src == ranks.node, "inner")
                .select(F.col("dst").alias("node"), (F.col("rank") * F.col("w")).alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("in_mass"))
            )
            ranks = (
                ranks.select("node")
                .join(contribs, "node", "left")
                .select(
                    "node",
                    F.round(
                        F.lit(1.0 - damping)
                        + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0)),
                        9,
                    ).alias("rank"),
                )
            )
            # truncate lineage every other round: one materialization job
            # per checkpoint is the dominant per-iteration cost for small
            # rank tables and two rounds of join+agg lineage are well
            # inside what the analyzer/scheduler handle. LOCAL mode skips
            # the trailing checkpoint (r14): the single downstream action
            # executes the final rounds' lineage in its own job — callers
            # running MULTIPLE actions on the returned ranks re-execute
            # those 1-2 rounds per action (cache()/checkpoint the result
            # yourself in that pattern). RELIABLE mode keeps the trailing
            # eager checkpoint (ADVICE r14): durable final state is part
            # of that mode's contract — recovery must not replay lineage.
            if it % 2 == 1 and it != iters - 1:
                ranks = (
                    ranks.checkpoint(eager=True)
                    if reliable
                    else ranks.localCheckpoint(eager=True)
                )
            elif reliable and it == iters - 1:
                ranks = ranks.checkpoint(eager=True)
    finally:
        # a failed checkpoint mid-loop must not leak the cached edge list
        weighted.unpersist()
    return ranks


def triangle_count(edges: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Exact triangle count of an undirected graph, one row:
    (n_nodes, n_edges, n_triangles).

    Input: one row per undirected edge with ``a < b`` (the caller
    canonicalizes; dedup upstream). The classic distributed shape
    (Suri & Vassilvitskii's MR triangle counting): because every edge is
    stored ONCE in ascending-endpoint order, each triangle a<b<c is
    found exactly once as e(a,b) ⋈ e(b,c) ⋈ e(a,c) — two equi-joins, no
    orientation dedup pass, no counting each triangle 6 times. At scale
    the first join shuffles on the shared endpoint and the closing join
    on the (a, c) pair; degree-skewed graphs lean on AQE skew handling
    (the a<b ordering already routes high-degree "hub" work to the
    lower-id side, the standard mitigation).
    """
    # The edge list is referenced FIVE times (three join legs, the node
    # set, the edge count); without materialization each reference
    # re-executes the caller's derivation lineage — for a co-occurrence
    # graph that is five full fact-table self-joins (measured 40s vs 1.9s
    # at sf0.1). Cache the canonical list (it is the graph itself: |E|
    # rows of two ids — what a triangle counter holds by definition),
    # compute the three bounded tallies EAGERLY, and unpersist before
    # returning — the cache must not outlive the call (repeated calls in
    # a long session would otherwise accumulate pinned storage; an
    # explicit parquet materialization is the spill-safe variant at
    # extreme |E|).
    spark = edges.sparkSession
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).cache()
    try:
        e1 = e.alias("e1")
        e2 = e.alias("e2")
        e3 = e.alias("e3")
        wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a")).select(
            F.col("e1.a").alias("wa"), F.col("e2.b").alias("wc")
        )
        tris = wedges.join(
            e3, (F.col("wa") == F.col("e3.a")) & (F.col("wc") == F.col("e3.b"))
        )
        nodes = (
            e.select(F.col("a").alias("v")).union(e.select(F.col("b").alias("v"))).distinct()
        )
        row = (
            tris.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
            .join(e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
            .join(nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))
            .select("n_nodes", "n_edges", "n_triangles")
            .first()
        )
    finally:
        e.unpersist()
    return spark.createDataFrame(
        [row], "n_nodes long, n_edges long, n_triangles long"
    )


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping_milli: int = 850,
    iters: int = 5,
) -> DataFrame:
    """Power-iteration PageRank in EXACT integer micro-units — the
    SQL-replayable certificate form (the x60 integer-geometry discipline
    applied to the graph iteration; x98 was rows-only through r10).

    Ranks live in micro-units (init 1_000_000 per node); each iteration:

        contrib(u→v) = rank_micro(u) div out_degree(u)      -- int floor
        rank_micro(v) = (1000 - d)·1000
                        + (d · Σ contrib) div 1000           -- d in milli

    Every quantity is a non-negative int64 (rank mass only shrinks from
    the leaks: dangling nodes and the two floor divisions), so float
    summation order cannot perturb a single rank and an unrolled SQL
    twin replays the run digit-for-digit. Same relative-ranking use as
    :func:`pagerank`; the float form keeps the textbook mass semantics.
    Output: (node, rank_micro long).
    """
    sc = edges.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.checkpoint(eager=True) if reliable else e.localCheckpoint(eager=True)
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    out_deg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    weighted = e.join(out_deg, "src").cache()
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("rank_micro"))
    base = int((1000 - damping_milli) * 1000)

    try:
        for it in range(iters):
            contribs = (
                weighted.join(ranks, weighted.src == ranks.node, "inner")
                .select(
                    F.col("dst").alias("node"),
                    F.expr("rank_micro div deg").cast("long").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").cast("long").alias("in_mass"))
            )
            ranks = (
                ranks.select("node")
                .join(contribs, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.expr(
                            f"({damping_milli} * coalesce(in_mass, 0)) div 1000"
                        )
                    )
                    .cast("long")
                    .alias("rank_micro"),
                )
            )
            # every other round; trailing checkpoint only in reliable mode
            # (see pagerank: local callers with multiple downstream actions
            # persist the result themselves — ADVICE r14)
            if it % 2 == 1 and it != iters - 1:
                ranks = (
                    ranks.checkpoint(eager=True)
                    if reliable
                    else ranks.localCheckpoint(eager=True)
                )
            elif reliable and it == iters - 1:
                ranks = ranks.checkpoint(eager=True)
    finally:
        weighted.unpersist()
    return ranks
