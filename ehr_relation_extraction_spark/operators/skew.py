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
