"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k for a bounded query set —
  the correctness baseline.  Dot products/norms are computed JVM-side
  with higher-order functions (``aggregate``/``zip_with``) in double
  precision — whole-stage codegen, no UDF, no Python.
- ``sign_buckets`` + ``ann_topk``: the scale path — an LSH-style
  bucketing on the sign pattern of the leading dimensions (a
  deterministic, data-independent hyperplane family), so candidate
  generation is an equi-join on the bucket id instead of an all-pairs
  product.  At 100 TB the bucket join shuffles O(n) rows; brute force
  would shuffle O(n * queries).

Outputs avoid raw floats: similarities are emitted as
``floor(sim * 1e6)`` ints so cross-engine hashing is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import ANN_SIGN_BITS, TOPK_NEIGHBORS


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _with_norm(df: DataFrame, vec: str) -> DataFrame:
    v = F.transform(F.col(vec), lambda x: x.cast("double"))
    return (df.withColumn("_v", v)
            .withColumn("_norm", F.sqrt(_dot(F.col("_v"), F.col("_v")))))


def brute_force_topk(emb: DataFrame, n_queries: int = 50,
                     k: int = TOPK_NEIGHBORS) -> DataFrame:
    """Exact cosine top-k of each query vector (vec_id < n_queries)
    against the full corpus: (query_id, rank, neighbor_id, sim_micro6).

    The corpus side is broadcast when small; at scale, replace with a
    block-nested join over bucketed candidates (see ann_topk).
    """
    base = _with_norm(emb.select("vec_id", "embedding"), "embedding")
    q = base.select(F.col("vec_id").alias("query_id"),
                    F.col("_v").alias("_qv"), F.col("_norm").alias("_qn")) \
            .where(F.col("query_id") < n_queries)
    c = base.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("_v").alias("_cv"), F.col("_norm").alias("_cn"))
    sims = q.join(c, F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id",
        (_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("_sim"),
    )
    sims = sims.withColumn("sim_micro6", F.floor(F.col("_sim") * 1000000).cast("long"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_micro6").desc(), F.col("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "sim_micro6"))


def sign_buckets(emb: DataFrame, bits: int = ANN_SIGN_BITS) -> DataFrame:
    """(vec_id, bucket, bucket_size): bucket = sign bits of the first
    ``bits`` dimensions."""
    e = emb.select("vec_id", "embedding")
    bucket = None
    for i in range(bits):
        bit = F.when(F.element_at("embedding", i + 1) >= 0, F.lit(1)) \
               .otherwise(F.lit(0)) * F.lit(1 << i)
        bucket = bit if bucket is None else bucket + bit
    b = e.withColumn("bucket", bucket.cast("int"))
    w = Window.partitionBy("bucket")
    return (b.withColumn("bucket_size", F.count(F.lit(1)).over(w).cast("long"))
            .select("vec_id", "bucket", "bucket_size"))


def ann_topk(emb: DataFrame, bits: int = ANN_SIGN_BITS,
             k: int = 3) -> DataFrame:
    """Approximate top-k within each vector's sign bucket:
    (vec_id, rank, neighbor_id, sim_micro6).  Candidate generation is
    the (bucket) equi-join — the 100 TB-safe plan."""
    b = sign_buckets(emb, bits).select("vec_id", "bucket")
    base = _with_norm(emb.select("vec_id", "embedding"), "embedding") \
        .join(b, "vec_id")
    q = base.select(F.col("vec_id").alias("query_id"), "bucket",
                    F.col("_v").alias("_qv"), F.col("_norm").alias("_qn"))
    c = base.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("bucket").alias("bucket_c"),
                    F.col("_v").alias("_cv"), F.col("_norm").alias("_cn"))
    sims = q.join(c, (F.col("bucket") == F.col("bucket_c"))
                  & (F.col("query_id") != F.col("neighbor_id"))).select(
        "query_id", "neighbor_id",
        (_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("_sim"))
    sims = sims.withColumn("sim_micro6", F.floor(F.col("_sim") * 1000000).cast("long"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_micro6").desc(), F.col("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "sim_micro6"))
