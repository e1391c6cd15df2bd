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
