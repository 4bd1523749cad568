"""Fixed-iteration PageRank as pure DataFrame algebra.

The iterative companion to connected components (functions/graph.py):
where CC contracts an edge set to a fixed point, PageRank re-weights a
FIXED edge set k times — so the loop needs no convergence certificate,
no collect, and the whole k-sweep computation stays ONE lazy plan
(k unrolled join+agg stages) that Catalyst/AQE schedules end-to-end.

Per sweep: rank/outdeg is joined onto the edge list (shuffle keyed on
src), contributions aggregate per dst (shuffle keyed on dst), and the
damping term re-seeds mass. Both shuffles are keyed on node ids —
hash-uniform unless the graph itself is skewed, in which case AQE's
skew-join split applies. Lineage doubles per sweep, so sweeps beyond
~8 should localCheckpoint; the registered query uses 3 (enough to
separate hubs) precisely so the plan stays checkpoint-free and the
oracle can unroll the identical three steps in SQL.

Dangling nodes (outdeg 0) are impossible for callers that build the
edge set symmetrically (every node that appears has both directions),
which is the registered usage; the helper asserts nothing about them
and documents the contract instead of silently redistributing mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame, *, iterations: int = 3, damping: float = 0.85
) -> DataFrame:
    """Rank nodes of a directed graph given as (src, dst) rows.

    Returns (node, rank) for every node with at least one out-edge,
    after ``iterations`` synchronous sweeps from the uniform start.
    Rank mass sums to 1 when the graph has no dangling nodes (see
    module docstring). The edge set is evaluated lazily and appears
    ``iterations`` times in the plan; callers with large k should
    persist it first.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    # uniform start over the node set (= src set: symmetric callers)
    ranks = deg.crossJoin(F.broadcast(n)).select(
        F.col("src").alias("node"), (F.lit(1.0) / F.col("n_nodes")).alias("r")
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(F.col("dst").alias("node"), (F.col("r") / F.col("outdeg")).alias("c"))
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.col("in_mass")
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank"))
