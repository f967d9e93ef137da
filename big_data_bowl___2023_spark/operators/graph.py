"""Iterative graph algorithms over DataFrame edge lists.

Connected components (dedup/clusters.py) resolves duplicate clusters;
PageRank here covers the other standard corpus-graph need: importance
scoring over a link/citation/reference graph (domain ranking for web
corpora — the quality prior used by curation pipelines).

Execution shape per power iteration: one join (ranks ⋈ out-links,
key-partitioned on the source) and one grouped sum (shuffle on the
destination) — the textbook two-shuffle PageRank step. Lineage is
truncated with localCheckpoint every few iterations, or the plan
doubles per round (the same iterative-DAG guard the NFL pipeline
uses). Dangling-node mass is redistributed uniformly each round; the
only driver-side value per iteration is that one scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import pin


def pagerank(edges: DataFrame, damping: float = 0.85,
             n_iters: int = 15, src_col: str = "src",
             dst_col: str = "dst",
             checkpoint_every: int = 5) -> DataFrame:
    """(node, rank) — ranks sum to 1 over all nodes.

    Standard damped PageRank with uniform teleport and uniform
    dangling redistribution: rank' = (1-d)/N + d·(dangling/N +
    Σ rank(src)/deg(src) over in-links)."""
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct().cache())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().cache())
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    links = e.join(deg, "src").cache()

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(n_iters):
        dangling = (ranks.join(deg.select(F.col("src").alias("node")),
                               "node", "left_anti")
                    .agg(F.sum("rank")).collect()[0][0]) or 0.0
        base = (1.0 - damping) / n + damping * dangling / n
        contribs = (links.join(ranks,
                               links.src == F.col("node"))
                    .select(F.col("dst").alias("node"),
                            (F.col("rank") / F.col("deg")).alias("c")))
        summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(summed, "node", "left")
                 .select("node",
                         (F.lit(base) + F.lit(damping)
                          * F.coalesce(F.col("s"), F.lit(0.0)))
                         .alias("rank")))
        if (i + 1) % checkpoint_every == 0:
            ranks = pin(ranks, truncate=True)
    return ranks
