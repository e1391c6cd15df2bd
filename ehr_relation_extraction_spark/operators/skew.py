"""Skew-defeat helpers (north rule: "salt-keyed text shards to defeat
domain/host skew"; SURVEY §4.2.1).

Web corpora are Zipfian by host: a naive ``repartition(host)`` melts
one executor.  Two tools:

- ``salted_repartition``: hash-repartition on ``xxhash64(keys..., salt)``
  so partition load is uniform regardless of key skew.  Used before
  Arrow inference stages when the *input file layout* is host-clustered
  (one crawl file = one host) — otherwise each Python worker would
  tokenize a whole hot host while others idle.
- ``cap_per_key``: deterministic per-key row cap (keep the first N by a
  stable ordering) — the guard against entity-dense pages blowing up
  the pair cross product (the reference implicitly caps via 128-token
  shards, predict.py:31-33; this is the explicit web-scale belt).

AQE skew-join splitting (enabled in session.py) handles residual skew
at join time; these helpers handle it at map time, where AQE can't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def salted_repartition(df: DataFrame, *keys: str, num_partitions: int | None = None,
                       salt: int = 0) -> DataFrame:
    h = F.xxhash64(*[F.col(k) for k in keys], F.lit(salt))
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    return df.repartition(num_partitions, h)


def cap_per_key(df: DataFrame, keys: list[str], order: list[str],
                max_rows: int) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= max_rows).drop("_rk"))


def key_histogram(df: DataFrame, *keys: str, top: int = 20) -> DataFrame:
    """Diagnostic: per-key row counts, heaviest first."""
    return (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc()).limit(top))


def ring_pos_sql(expr: str) -> str:
    """First 8 md5 hex nibbles of ``expr`` as an integer ring
    position in [0, 2^32) — one SQL expression string evaluated
    verbatim by BOTH engines (the kg_embed no-drift device)."""
    terms = " + ".join(
        f"CAST((instr('0123456789abcdef', "
        f"substring(md5({expr}), {i + 1}, 1)) - 1) AS BIGINT)"
        f" * {16 ** (7 - i)}" for i in range(8))
    return f"({terms})"


def hash_ring(docs: DataFrame, vnodes: int = 64,
              node_col: str = "source") -> DataFrame:
    """Consistent-hash ring balance audit — the placement-design
    companion to jain_fairness/shard_rebalance: before routing a
    crawl's fetch/store load by consistent hashing (the Dynamo/
    memcached device that keeps resharding O(1/n) on node changes),
    audit how evenly the ring's arcs actually split the keyspace at
    ``vnodes`` virtual nodes per physical node.  Each vnode sits at
    ring_pos(node + '#' + i); it owns the arc from its position to
    the next vnode clockwise (the LAST arc wraps to the first
    position + 2^32); a node's expected share of keys is the sum of
    its arc lengths over 2^32 — exactly what this emits, so the
    vnode count can be tuned until max_arc and the per-node share
    spread are acceptable.

    Output per node: (node, n_vnodes, arc_sum, max_arc,
    share_micro6 = 1e6 * arc_sum // 2^32, skew_micro6 =
    1e6 * arc_sum * n_nodes // 2^32 — 1e6 means perfectly fair).

    Scale shape: the ring has (bounded node domain) x vnodes
    positions — hundreds of rows; ONE distinct on the corpus
    extracts the node set, everything after runs on the bounded
    ring (one window over it).  md5 positions evaluate from one
    shared SQL string in both engines.
    """
    nodes = (docs.select(F.col(node_col).cast("string").alias("node"))
             .dropDuplicates())
    vn = (nodes.select(
        "node",
        F.explode(F.sequence(F.lit(0), F.lit(vnodes - 1))).alias("i"))
        .withColumn("pos", F.expr(
            ring_pos_sql("concat(node, '#', i)"))))
    w = Window.orderBy("pos", "node", "i")
    ring = (vn.withColumn("_nxt", F.lead("pos").over(w))
            .withColumn("_first", F.first("pos").over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)))
            .withColumn("arc",
                        F.when(F.col("_nxt").isNotNull(),
                               F.col("_nxt") - F.col("pos"))
                        .otherwise(F.col("_first") + F.lit(2**32)
                                   - F.col("pos")).cast("long")))
    per = (ring.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_vnodes"),
        F.sum("arc").cast("long").alias("arc_sum"),
        F.max("arc").cast("long").alias("max_arc")))
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    return (per.withColumn("_n_nodes", F.count(F.lit(1)).over(wall))
            .select("node", "n_vnodes", "arc_sum", "max_arc",
                    F.expr(f"CAST(1000000 * arc_sum div {2**32}"
                           " AS BIGINT)").alias("share_micro6"),
                    F.expr(f"CAST(1000000 * arc_sum * _n_nodes"
                           f" div {2**32} AS BIGINT)")
                    .alias("skew_micro6")))
