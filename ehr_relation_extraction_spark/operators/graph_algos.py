"""Iterative graph algorithms over the materialized nodes/edges tables.

PageRank as iterative DataFrame joins (the GraphFrames-free form):
deterministic fixed-iteration power method with localCheckpoint per
round (same lineage-cutting discipline as connected components).

This is the designated "genuinely non-SQL-expressible" operator class
(iterative fixpoint) — exposed to the driver as a rows-only-checked
query, in contrast to connected components which carries a full
recursive-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bfs_distances(edges: DataFrame, source: str,
                  max_iter: int = 50) -> DataFrame:
    """Unweighted shortest-hop distances from ``source`` over the
    UNDIRECTED edge set — frontier-expansion BFS as iterative joins
    (the GraphFrames-free form), ``localCheckpoint`` per level.

    Unlike PageRank this iterative algorithm IS exactly
    SQL-expressible (bounded recursive CTE), so the driver checks it
    against a DuckDB oracle value-for-value — the stronger check for
    an iterative operator.

    Returns (node, dist) for REACHABLE nodes only (dist 0 = source).
    Each level is one join + anti-join against the settled set; at
    scale the frontier is partitioned on node and the settled set
    stays partitioned alike, so levels are single-shuffle.
    """
    spark = edges.sparkSession
    sym = (edges.select("src", "dst")
           .union(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
           .where(F.col("src") != F.col("dst"))
           .dropDuplicates().localCheckpoint())
    dist = spark.createDataFrame([(source, 0)], "node string, dist int")
    frontier = dist
    for level in range(1, max_iter + 1):
        nxt = (frontier.join(sym, frontier["node"] == sym["src"])
               .select(F.col("dst").alias("node"))
               .dropDuplicates()
               .join(dist, "node", "left_anti")
               .withColumn("dist", F.lit(level).cast("int"))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        dist = dist.union(nxt).localCheckpoint()
        frontier = nxt
    return dist


def pagerank(edges: DataFrame, damping: float = 0.85,
             n_iter: int = 10) -> DataFrame:
    """edges (src, dst[, weight]) directed -> (node, rank_micro6, rank).

    Weighted out-degree normalization; dangling mass redistributed
    uniformly each round (standard formulation).  Fixed iteration count
    keeps the computation deterministic and resume-friendly.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst",
                     (F.col("weight") if "weight" in edges.columns
                      else F.lit(1)).cast("double").alias("w"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .dropDuplicates()).localCheckpoint()
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame(
            [], "node string, rank_micro6 long, rank double")

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    e_norm = e.join(out_w, "src").withColumn(
        "share", F.col("w") / F.col("out_w")).select("src", "dst", "share")
    e_norm = e_norm.localCheckpoint()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contribs = (e_norm.join(ranks.withColumnRenamed("node", "src"), "src")
                    .select("dst", (F.col("rank") * F.col("share")).alias("c"))
                    .groupBy("dst").agg(F.sum("c").alias("in_rank")))
        # dangling nodes (no out-edges) leak rank; redistribute uniformly
        dangling = (ranks.join(out_w.withColumnRenamed("src", "node"),
                               "node", "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
                    .first()["d"])
        ranks = (nodes.join(contribs.withColumnRenamed("dst", "node"),
                            "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.lit(damping) * (F.coalesce(F.col("in_rank"), F.lit(0.0))
                                              + F.lit(dangling / n))).alias("rank"))
                 ).localCheckpoint()
    return ranks.select(
        "node", F.floor(F.col("rank") * 1000000).cast("long").alias("rank_micro6"),
        "rank")
