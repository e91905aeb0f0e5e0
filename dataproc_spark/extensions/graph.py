"""Iterative graph algorithms on edge lists.

Web/link-graph analytics for corpus curation: PageRank-style centrality
scores feed crawl prioritization and document quality weighting (a page's
rank is a standard quality prior in web-corpus filtering). The dedup
family's connected components lives in ``extensions.dedup``; this module
holds the *weighted propagation* algorithms.

Scale design
------------
PageRank here is synchronous power iteration on a DataFrame edge list:
each round is one equi-join (ranks onto edge sources) plus one hash
aggregate (contributions summed per destination) — two shuffles, both on
node ids, exactly a join+groupBy cost profile per iteration.
``localCheckpoint`` truncates lineage each round so iteration N does not
replay rounds 1..N-1. Hot destinations (high in-degree hubs) are the skew
case — partial aggregation combines contributions map-side, and AQE skew
splitting handles the residue.

Determinism: all arithmetic is exact integer (micro-units, floor
division, rational damping factor) — no floats anywhere, so results are
bit-identical across engines, partitionings, and reruns; the oracle
replays the same iteration in DuckDB as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Exact-integer PageRank over a directed edge list.

    Returns ``(node, rank)`` after ``n_iter`` synchronous rounds. Ranks
    are integers in units of ``scale`` (initial rank = ``scale`` per
    node); each round every node distributes ``rank div out_degree`` along
    its out-edges and collects::

        rank' = (1-d)·scale + d·Σ contributions     (all floor arithmetic)

    with damping ``d = damping_num/damping_den`` applied as integer
    multiply-then-floor-divide. The simplified variant: dangling-node
    mass (nodes with no out-edges) is dropped rather than redistributed —
    ranks are a *relative* centrality signal; document if you need the
    stochastic-matrix invariant.

    Duplicate edges count once (the edge list is distinct-ed first);
    self-loops participate normally.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if scale < 1 or damping_den < 1 or not 0 <= damping_num <= damping_den:
        # damping_den=0 would be a bare ZeroDivisionError below;
        # damping_num > damping_den makes base negative, where Spark's
        # truncating `div` and DuckDB's flooring `//` disagree —
        # silently breaking the bit-identical cross-engine contract
        raise ValueError(
            f"need scale >= 1, damping_den >= 1, and "
            f"0 <= damping_num <= damping_den; got scale={scale}, "
            f"damping={damping_num}/{damping_den}"
        )
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # materialized once: each iteration is its own eager action, so an
    # unpersisted outdeg would re-aggregate the edge list every round
    outdeg = (
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    )
    base = (scale * (damping_den - damping_num)) // damping_den
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    try:
        return _pagerank_rounds(
            e, nodes, outdeg, ranks, n_iter, base, damping_num, damping_den
        )
    finally:
        # unpersist on the failure path too (mid-iteration job errors
        # previously pinned the edge list for the session)
        e.unpersist()


def _pagerank_rounds(
    e, nodes, outdeg, ranks, n_iter, base, damping_num, damping_den
) -> DataFrame:
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"), F.expr("rank div deg").alias("c"))
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                # integer `div`, never `/` — float division would be
                # inexact above 2^53 and break cross-engine determinism
                F.expr(
                    f"{base}L + (coalesce(s, 0L) * {damping_num}) "
                    f"div {damping_den}"
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected edge list — the graph
    cohesion metric behind community density and dedup-cluster quality
    checks. Nodes in NO triangle have no output row (join the counts
    back with a left join + coalesce(0) for a per-node-complete frame).

    Canonical two-join formulation on ORIENTED edges (a < b): wedges
    (a→b→c with a<b<c) joined against the closing edge (a,c). Orienting
    by id bounds the join fan-out by the max out-degree of the
    low-to-high orientation (≪ raw degree for heavy hubs — the standard
    trick that makes triangle listing feasible at scale); both joins are
    hash equi-joins, no cartesian anywhere. Each triangle is found
    exactly once and credited to all three corners.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tris = wedges.join(closing, ["x", "z"])
    per_node = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node
