"""Graph analytics over the star schema — registry entries for the
iterative algorithms in functions/ (connected components backs the
dedup family in operators/dedup.py; PageRank registers here).

The graph is derived from data the engine already has: the bipartite
supplier↔part incidence in lineitem (distinct pairs, both directions),
the same construction a web-scale pipeline uses for host↔document or
user↔item graphs. Everything stays an edge DataFrame — no vertex
objects, no driver-side adjacency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dataextractor_spark.catalog import load_table
from dataextractor_spark.functions.pagerank import pagerank
from dataextractor_spark.registry import query

_PR_ITER_SQL = """
        SELECT e.dst AS node,
               0.15 / (SELECT n_nodes FROM n)
                 + 0.85 * sum(p.r / d.outdeg) AS r
        FROM edges e
        JOIN {prev} p ON p.node = e.src
        JOIN deg d    ON d.src  = e.src
        GROUP BY e.dst
"""

_PAGERANK_ORACLE = f"""
WITH pairs AS (
    SELECT DISTINCT l_suppkey, l_partkey FROM lineitem
),
edges AS (
    SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst FROM pairs
    UNION ALL
    SELECT 'p' || l_partkey, 's' || l_suppkey FROM pairs
),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
n AS (SELECT count(*) AS n_nodes FROM deg),
r0 AS (
    SELECT src AS node, 1.0 / (SELECT n_nodes FROM n) AS r FROM deg
),
r1 AS ({_PR_ITER_SQL.format(prev="r0")}),
r2 AS ({_PR_ITER_SQL.format(prev="r1")}),
r3 AS ({_PR_ITER_SQL.format(prev="r2")})
SELECT CASE WHEN node LIKE 's%' THEN 'supplier' ELSE 'part' END
           AS node_type,
       count(*)             AS n_nodes,
       round(sum(r), 6)     AS rank_mass,
       round(max(r), 6)     AS max_rank,
       round(min(r), 6)     AS min_rank,
       round(avg(r), 6)     AS avg_rank
FROM r3
GROUP BY 1
ORDER BY 1
"""


@query("graph_pagerank", oracle=_PAGERANK_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 damped sweeps, d=0.85) on the supplier↔part
    incidence graph — the iterative-algorithm companion to the
    large-star/small-star components behind dedup_components: a fixed
    edge set re-weighted per sweep, entirely as join+agg algebra
    (functions/pagerank.py), no collect anywhere in the loop.

    The oracle unrolls the identical three sweeps as SQL CTEs, so the
    hash match pins every intermediate semantics (uniform start,
    out-degree normalization, damping re-seed). Output is the
    per-node-type rank summary: rank_mass(supplier)+rank_mass(part)≈1
    is the conservation invariant (no dangling nodes by construction
    — both edge directions exist for every node), and the supplier
    side concentrating ~half the mass on 50× fewer nodes is the
    hub effect the algorithm exists to measure. Per-node float sums
    accumulate in different orders across engines; 6-dp rounding is
    ~10 orders of magnitude above the drift.

    At 100 TB: distinct-pair extraction is one shuffle on the pair,
    each sweep shuffles edges on src then dst (hash-uniform node
    keys; AQE splits genuine skew), and the per-sweep state is one
    (node, rank) row per node — never adjacency on the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_suppkey", "l_partkey").distinct()
    fwd = pairs.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, iterations=3, damping=0.85)
    return (
        ranks.select(
            F.when(F.col("node").startswith("s"), F.lit("supplier"))
            .otherwise(F.lit("part"))
            .alias("node_type"),
            "rank",
        )
        .groupBy("node_type")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.round(F.sum("rank"), 6).alias("rank_mass"),
            F.round(F.max("rank"), 6).alias("max_rank"),
            F.round(F.min("rank"), 6).alias("min_rank"),
            F.round(F.avg("rank"), 6).alias("avg_rank"),
        )
        .orderBy("node_type")
    )
