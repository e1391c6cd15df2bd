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

from ..config import ANN_SIGN_BITS, TOPK_NEIGHBORS, srp_planes


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


def embedding_near_dups(emb: DataFrame, bits: int = ANN_SIGN_BITS,
                        threshold_micro6: int = 300000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates from the sign
    buckets (equi-join), verified by exact cosine >= threshold.
    Output: (vec_a, vec_b, sim_micro6) with vec_a < vec_b.

    Same candidate-generation-then-verify shape as minhash-LSH dedup —
    the 100 TB plan never forms the all-pairs product."""
    b = sign_buckets(emb, bits).select("vec_id", "bucket")
    base = _with_norm(emb.select("vec_id", "embedding"), "embedding").join(b, "vec_id")
    a = base.select(F.col("vec_id").alias("vec_a"), "bucket",
                    F.col("_v").alias("_av"), F.col("_norm").alias("_an"))
    c = base.select(F.col("vec_id").alias("vec_b"),
                    F.col("bucket").alias("bucket_b"),
                    F.col("_v").alias("_bv"), F.col("_norm").alias("_bn"))
    pairs = a.join(c, (F.col("bucket") == F.col("bucket_b"))
                   & (F.col("vec_a") < F.col("vec_b"))).select(
        "vec_a", "vec_b",
        F.floor(_dot(F.col("_av"), F.col("_bv")) / (F.col("_an") * F.col("_bn"))
                * 1000000).cast("long").alias("sim_micro6"))
    return pairs.where(F.col("sim_micro6") >= threshold_micro6)


def _codebook_frame(spark, codebook: "list[list[float]]") -> DataFrame:
    """Materialize an explicit codebook (list of centroid vectors) as
    the broadcast (cell, _cv, _cn) dimension the IVF ops consume."""
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(codebook)]
    df = spark.createDataFrame(rows, "cell long, _cv array<double>")
    return df.withColumn("_cn", F.sqrt(_dot(F.col("_cv"), F.col("_cv"))))


def ivf_assign(emb: DataFrame, n_cells: int = 8,
               codebook: "list[list[float]] | None" = None) -> DataFrame:
    """IVF coarse quantization: every vector is assigned to the
    codebook centroid with the highest cosine.  The default codebook
    is the deterministic seed (the first ``n_cells`` vectors, vec_id <
    n_cells — what the exact DuckDB oracle replicates); pass
    ``codebook`` (a list of centroid vectors, e.g. from
    :func:`train_ivf_codebook`) to assign against TRAINED centroids.
    Output: (vec_id, cell, cell_size).  Either way the codebook is
    broadcast — a broadcast join + argmax, no shuffle of the corpus
    side."""
    base = _with_norm(emb.select("vec_id", "embedding"), "embedding")
    if codebook is not None:
        cents = F.broadcast(_codebook_frame(emb.sparkSession, codebook))
    else:
        cents = F.broadcast(
            base.where(F.col("vec_id") < n_cells)
            .select(F.col("vec_id").alias("cell"),
                    F.col("_v").alias("_cv"), F.col("_norm").alias("_cn")))
    sims = base.join(cents).select(
        "vec_id", "cell",
        (_dot(F.col("_v"), F.col("_cv")) / (F.col("_norm") * F.col("_cn"))).alias("_s"))
    sims = sims.withColumn("_s6", F.floor(F.col("_s") * 1000000).cast("long"))
    w = Window.partitionBy("vec_id").orderBy(F.col("_s6").desc(), F.col("cell"))
    assigned = (sims.withColumn("_r", F.row_number().over(w))
                .where(F.col("_r") == 1).select("vec_id", "cell"))
    wc = Window.partitionBy("cell")
    return (assigned.withColumn("cell_size",
                                F.count(F.lit(1)).over(wc).cast("long"))
            .select("vec_id", F.col("cell").cast("int").alias("cell"),
                    "cell_size"))


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


def srp_buckets(emb: DataFrame, bits: int = ANN_SIGN_BITS,
                dim: int = 64) -> DataFrame:
    """SRP-LSH bucketing: bucket bit i = sign of dot(v, plane_i).
    Same output contract as ``sign_buckets`` — (vec_id, bucket,
    bucket_size) — so the ann_topk join pattern composes unchanged;
    SRP spreads mass far better than leading-dim signs when early
    dimensions are correlated."""
    e = emb.select("vec_id",
                   F.transform("embedding",
                               lambda x: x.cast("double")).alias("_v"))
    bucket = None
    for i, plane in enumerate(srp_planes(bits, dim)):
        p = F.array(*[F.lit(float(w)) for w in plane])
        bit = (F.when(_dot(F.col("_v"), p) >= 0, F.lit(1))
               .otherwise(F.lit(0)) * F.lit(1 << i))
        bucket = bit if bucket is None else bucket + bit
    b = e.withColumn("bucket", bucket.cast("int"))
    w = Window.partitionBy("bucket")
    return (b.withColumn("bucket_size",
                         F.count(F.lit(1)).over(w).cast("long"))
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


def ivf_topk(emb: DataFrame, n_cells: int = 8, nprobe: int = 2,
             k: int = 3, n_queries: int = 50,
             codebook: "list[list[float]] | None" = None) -> DataFrame:
    """The IVF SEARCH path (completes ivf_assign/ivf_centroid_update
    into a usable ANN query): assign the corpus to cells, probe each
    query's top-``nprobe`` cells, exact-cosine rerank the candidates.
    Output: (query_id, rank, neighbor_id, sim_micro6) — the same
    contract as :func:`ann_topk` / :func:`brute_force_topk`.

    Deterministic & oracle-exact: probe selection orders by the SAME
    quantized centroid similarity (floor(sim*1e6), ties by cell) the
    assignment uses, and the rerank quantizes before ranking with ties
    by neighbor_id — no float-order dependence anywhere.

    Scale: the codebook is broadcast (n_cells rows), so probe
    selection never shuffles the query side; candidate generation is
    an equi-join on cell — each corpus vector lives in exactly ONE
    cell, so a query meets at most nprobe/n_cells of the corpus and
    each (query, neighbor) pair is produced at most once.  Recall
    improves with nprobe at linearly-bounded cost, the standard IVF
    trade — brute force would shuffle O(n * queries).
    """
    base = _with_norm(emb.select("vec_id", "embedding"), "embedding")
    if codebook is not None:
        cents = F.broadcast(_codebook_frame(emb.sparkSession, codebook))
    else:
        cents = F.broadcast(
            base.where(F.col("vec_id") < n_cells)
            .select(F.col("vec_id").alias("cell"),
                    F.col("_v").alias("_cv"), F.col("_norm").alias("_cn")))
    assigned = ivf_assign(emb, n_cells, codebook=codebook).select(
        F.col("vec_id").alias("neighbor_id"), "cell")

    q = base.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("_v").alias("_qv"), F.col("_norm").alias("_qn"))
    probe_scores = q.join(cents).select(
        "query_id", "cell",
        F.floor(_dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")) * 1000000)
        .cast("long").alias("_s6"))
    wp = Window.partitionBy("query_id").orderBy(
        F.col("_s6").desc(), F.col("cell"))
    probes = (probe_scores.withColumn("_r", F.row_number().over(wp))
              .where(F.col("_r") <= nprobe).select("query_id", "cell"))

    # probes is (n_queries * nprobe) rows; BROADCAST it so the corpus
    # side never shuffles — `cell` has only n_cells distinct values, so
    # a shuffle join here would hash 100 TB onto n_cells reducers
    # (catastrophic skew); broadcast keeps the corpus map-side only
    cand = F.broadcast(probes).join(assigned, "cell") \
        .where(F.col("neighbor_id") != F.col("query_id")) \
        .select("query_id", "neighbor_id")
    qv = base.select(F.col("vec_id").alias("query_id"),
                     F.col("_v").alias("_qv"), F.col("_norm").alias("_qn"))
    cv = base.select(F.col("vec_id").alias("neighbor_id"),
                     F.col("_v").alias("_cv"), F.col("_norm").alias("_cn"))
    sims = (cand.join(qv, "query_id").join(cv, "neighbor_id")
            .select("query_id", "neighbor_id",
                    F.floor(_dot(F.col("_qv"), F.col("_cv"))
                            / (F.col("_qn") * F.col("_cn")) * 1000000)
                    .cast("long").alias("sim_micro6")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_micro6").desc(), F.col("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "sim_micro6"))


def ivf_centroid_update(emb: DataFrame, n_cells: int = 8,
                        codebook: "list[list[float]] | None" = None
                        ) -> DataFrame:
    """One Lloyd (k-means) update step for the IVF codebook — the
    training half of :func:`ivf_assign`: assign every vector to its
    nearest seed centroid, then recompute each cell's mean embedding.

    Floats are quantized to integer micro-units (floor(x * 1e6)) BEFORE
    summing, so the per-cell sums are order-independent — bit-identical
    under any partitioning and exactly reproducible in the SQL oracle
    (float accumulation order would not be).  Output is the flat
    (cell, dim, n_vecs, sum_q6, mean_q6) table; mean_q6 = sum_q6 //
    n_vecs is the quantized centroid coordinate.

    Scale: assignment is a broadcast join + argmax (no corpus
    shuffle); the update is posexplode + ONE hash-aggregate on
    (cell, dim) — partial map-side combine, a single shuffle of
    n_cells x dim x partitions partial rows, independent of corpus
    size.
    """
    assigned = ivf_assign(emb, n_cells, codebook=codebook) \
        .select("vec_id", "cell")
    v = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("_v"))
    q = v.select(
        "vec_id",
        F.posexplode(F.transform(
            "_v", lambda x: F.floor(x * 1000000).cast("long")))
        .alias("dim", "q6"))
    return (assigned.join(q, "vec_id")
            .groupBy("cell", "dim")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 F.sum("q6").cast("long").alias("sum_q6"))
            .withColumn("mean_q6",
                        F.floor(F.col("sum_q6") / F.col("n_vecs"))
                        .cast("long"))
            .select(F.col("cell").cast("int").alias("cell"),
                    F.col("dim").cast("int").alias("dim"),
                    "n_vecs", "sum_q6", "mean_q6"))


def train_ivf_codebook(emb: DataFrame, n_cells: int = 8,
                       rounds: int = 3) -> "list[list[float]]":
    """Train the IVF codebook by repeated Lloyd rounds (the NEXT.md
    round-3 thread): seed with the deterministic first-``n_cells``
    vectors, then iterate assign -> quantized-mean via
    :func:`ivf_centroid_update` -> next codebook.  Each round collects
    only n_cells x dim quantized means to the driver (the codebook IS
    a broadcast-sized dimension — the same bounded-collect contract as
    the learned-weight loops); the corpus never funnels through the
    driver.  Deterministic end-to-end: integer-quantized means are
    summation-order independent, so retraining bit-reproduces the
    codebook under any partitioning.  A cell that loses all members
    keeps its previous centroid (standard empty-cluster handling,
    deterministic)."""
    seed = (emb.where(F.col("vec_id") < n_cells)
            .orderBy("vec_id")
            .select(F.col("embedding").cast("array<double>").alias("v"))
            .collect())
    codebook = [list(r["v"]) for r in seed]
    for _ in range(rounds):
        upd = ivf_centroid_update(emb, n_cells, codebook=codebook) \
            .select("cell", "dim", "mean_q6").collect()
        nxt = [list(c) for c in codebook]  # empty cells keep centroids
        for r in upd:
            nxt[r["cell"]][r["dim"]] = r["mean_q6"] / 1e6
        codebook = nxt
    return codebook


def build_ivf_index(emb: DataFrame, path: str,
                    codebook: "list[list[float]]") -> None:
    """Materialize the IVF index as a ``cell``-partitioned parquet
    table: (vec_id, embedding, norm) under ``path/cell=C/``.  This is
    the Spark-native form of an ANN index — at query time the probed
    cells become PartitionFilters, so a search touches nprobe/n_cells
    of the index FILES at scan-planning time (directory pruning), not
    just of the rows.  The codebook travels beside the data as the
    index metadata (``path/_codebook.json``)."""
    import json
    import os

    assigned = ivf_assign(emb, len(codebook), codebook=codebook) \
        .select("vec_id", "cell")
    base = _with_norm(emb.select("vec_id", "embedding"), "embedding")
    (base.join(assigned, "vec_id")
     .select("vec_id", "cell", F.col("_v").alias("embedding"),
             F.col("_norm").alias("norm"))
     .write.mode("overwrite").partitionBy("cell").parquet(path))
    with open(os.path.join(path, "_codebook.json"), "w") as f:
        json.dump(codebook, f)


def ivf_topk_indexed(spark, path: str, queries: DataFrame,
                     nprobe: int = 2, k: int = 3) -> DataFrame:
    """Search a :func:`build_ivf_index` table: score each query
    against the stored codebook (broadcast literals), prune the index
    SCAN to the probed cells — the cell predicate is a partition
    filter, so unprobed cells' files are never opened (asserted in
    tests/test_round3_fixes.py) — then exact-rerank.  ``queries``:
    (query_id, embedding).  Same output contract as :func:`ivf_topk`.
    """
    import json
    import os

    with open(os.path.join(path, "_codebook.json")) as f:
        codebook = json.load(f)
    cents = F.broadcast(_codebook_frame(spark, codebook))
    q = _with_norm(queries.select(F.col("query_id"), "embedding"),
                   "embedding").select(
        "query_id", F.col("_v").alias("_qv"), F.col("_norm").alias("_qn"))
    probe_scores = q.join(cents).select(
        "query_id", "cell",
        F.floor(_dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")) * 1000000)
        .cast("long").alias("_s6"))
    wp = Window.partitionBy("query_id").orderBy(
        F.col("_s6").desc(), F.col("cell"))
    probes = (probe_scores.withColumn("_r", F.row_number().over(wp))
              .where(F.col("_r") <= nprobe).select("query_id", "cell"))
    cells = sorted({r["cell"] for r in probes.collect()})

    idx = spark.read.parquet(path).where(F.col("cell").isin(cells))
    cand = (F.broadcast(probes)
            .join(idx, "cell")
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "embedding", "norm"))
    sims = (cand.join(F.broadcast(q), "query_id")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id",
                    F.floor(_dot(F.col("_qv"), F.col("embedding"))
                            / (F.col("_qn") * F.col("norm")) * 1000000)
                    .cast("long").alias("sim_micro6")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_micro6").desc(), F.col("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "sim_micro6"))


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """(query_id, n_hit, n_exact): per-query top-k set intersection of
    an approximate ANN result against the exact baseline — the
    accuracy axis of the ANN bench (round-4 verdict item 4: record
    recall, not just runtime).  Pure integer counts (one equi-join +
    two aggregates), so the number is engine-exact and cheap at any
    scale: both inputs are (n_queries * k)-row frames."""
    a = approx.select("query_id", "neighbor_id")
    e = exact.select("query_id", "neighbor_id")
    hits = (e.join(a, ["query_id", "neighbor_id"])
            .groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")))
    tot = e.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return (tot.join(hits, "query_id", "left").fillna({"n_hit": 0})
            .select("query_id", F.col("n_hit").cast("long").alias("n_hit"),
                    F.col("n_exact").cast("long").alias("n_exact")))


def rrf_fusion(rankings: "list[DataFrame]", k: int = 5,
               k_rrf: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of multiple
    (query_id, rank, neighbor_id) rankings — the standard hybrid-
    retrieval combiner (exact + ANN, lexical + dense): per candidate,
    rrf_micro6 = sum over lists of 1e6 DIV (k_rrf + rank), exact
    integer division so the fused ordering is deterministic
    cross-engine; n_lists counts how many rankings surfaced the
    candidate (consensus evidence).  Re-ranked top-``k`` per query,
    ties broken by neighbor_id.

    Plan: a unionAll of the (already tiny, top-k-bounded) ranking
    tables, one (query, neighbor) hash-aggregate, one per-query
    window — nothing here ever touches raw vectors."""
    from pyspark.sql import Window

    parts = [r.select("query_id", "neighbor_id",
                      F.expr(f"CAST(1000000 DIV ({k_rrf} + rank)"
                             " AS BIGINT)").alias("_contrib"))
             for r in rankings]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    agg = (u.groupBy("query_id", "neighbor_id")
           .agg(F.sum("_contrib").cast("long").alias("rrf_micro6"),
                F.count(F.lit(1)).cast("long").alias("n_lists")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro6").desc(), F.col("neighbor_id"))
    return (agg.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id",
                    "rrf_micro6", "n_lists"))


def srp_multiprobe_topk(emb: DataFrame, bits: int = ANN_SIGN_BITS,
                        k: int = 3, dim: int = 64,
                        hamming1: bool = True) -> DataFrame:
    """Multi-probe SRP ANN (Lv et al., VLDB'07 applied to the SRP
    family): each query probes its own SRP bucket PLUS every
    Hamming-1 neighbor bucket (one sign bit flipped) — the standard
    fix for LSH's boundary blindness: a near-identical pair split by
    exactly one hyperplane lands in adjacent buckets, invisible to
    the single-bucket join, recovered here at (bits+1)x probe cost
    with zero extra index structure.

    Output: (query_id, rank, neighbor_id, sim_micro6), exact cosine
    over the probed candidates, same contract as ann_topk.  A
    neighbor sits in exactly one bucket and the probe list is
    duplicate-free, so no candidate pair is scored twice.

    Scale: still a bucket equi-join — the probe explode multiplies
    only the QUERY side by bits+1; the corpus side is scanned once
    and never pairs outside probed buckets.

    ``hamming1=False`` degenerates to the single-bucket SRP search —
    the probe set shrinks to the query's own bucket, so the candidate
    set is a SUBSET of the multi-probe one and recall dominance is
    guaranteed by construction (pinned in tests/test_ann_recall.py)."""
    b = srp_buckets(emb, bits, dim).select("vec_id", "bucket")
    base = _with_norm(emb.select("vec_id", "embedding"),
                      "embedding").join(b, "vec_id")
    probes = F.array(
        F.col("bucket"),
        *([F.expr(f"CAST(bucket ^ {1 << i} AS INT)")
           for i in range(bits)] if hamming1 else []))
    q = base.select(F.col("vec_id").alias("query_id"),
                    F.explode(probes).alias("pbucket"),
                    F.col("_v").alias("_qv"),
                    F.col("_norm").alias("_qn"))
    c = base.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("bucket").alias("bucket_c"),
                    F.col("_v").alias("_cv"),
                    F.col("_norm").alias("_cn"))
    sims = (q.join(c, (F.col("pbucket") == F.col("bucket_c"))
                   & (F.col("query_id") != F.col("neighbor_id")))
            .select("query_id", "neighbor_id",
                    (_dot(F.col("_qv"), F.col("_cv"))
                     / (F.col("_qn") * F.col("_cn"))).alias("_sim"))
            .withColumn("sim_micro6",
                        F.floor(F.col("_sim") * 1000000)
                        .cast("long")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_micro6").desc(), F.col("neighbor_id"))
    return (sims.withColumn("rank",
                            F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "sim_micro6"))


def mmr_rerank(emb: DataFrame, query_id: int = 0,
               n_candidates: int = 50, k: int = 10,
               lam_pct: int = 70) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell-Goldstein '98)
    diversified reranking of a retrieval shortlist: greedily pick k
    results, each round taking the candidate maximizing

        lam * relevance - (100 - lam) * max_sim_to_already_picked

    so near-duplicate hits (syndicated copies, mirror pages) don't
    crowd the result page — the standard diversity pass a web-scale
    retrieval stack runs after ANN + rerank.

    All decisions are integers: relevance and pairwise similarity use
    the engine's established floor(cosine * 1e6) device, the MMR score
    is the exact integer ``lam_pct*rel - (100-lam_pct)*maxsim``, ties
    break on the smaller vec_id — so the greedy is bit-reproducible
    and the DuckDB oracle unrolls the k rounds as chained CTEs.

    Scale: the shortlist is ``n_candidates`` rows by construction
    (top-N by relevance — at 100 TB this arrives from ann_topk /
    pq_rerank, never a corpus scan), so every per-round frame is
    bounded; the selected vector re-enters as a broadcast 1-row
    crossJoin (the engine's sanctioned lazy-scalar device) and the
    running max-similarity column updates incrementally — no
    candidate x candidate matrix is ever materialized.

    Output: (pick_rank, vec_id, rel_micro6, maxsim_micro6, mmr_score)
    in pick order.
    """
    spark = emb.sparkSession
    base = _with_norm(emb.select("vec_id", "embedding"), "embedding")
    q = (base.where(F.col("vec_id") == query_id)
         .select(F.col("_v").alias("_qv"), F.col("_norm").alias("_qn")))
    cand = (base.where(F.col("vec_id") != query_id)
            .crossJoin(F.broadcast(q))  # 1-row scalar: stays lazy
            .select("vec_id", "_v", "_norm",
                    F.floor(_dot(F.col("_v"), F.col("_qv"))
                            / (F.col("_norm") * F.col("_qn"))
                            * 1000000).cast("long").alias("rel_micro6"))
            .orderBy(F.col("rel_micro6").desc(), F.col("vec_id"))
            .limit(n_candidates)  # bounded: the shortlist contract
            # NULL until the first pick lands: cosine can be NEGATIVE,
            # so a 0 init would clamp the diversity penalty upward.
            # greatest() skips NULLs, so the first update replaces it.
            .withColumn("maxsim_micro6", F.lit(None).cast("long"))
            .localCheckpoint())
    out: list[tuple] = []
    for rank in range(1, k + 1):
        penalty = F.coalesce(F.col("maxsim_micro6"), F.lit(0))
        score = (F.lit(lam_pct) * F.col("rel_micro6")
                 - F.lit(100 - lam_pct) * penalty)
        best = (cand.withColumn("_s", score.cast("long"))
                .orderBy(F.col("_s").desc(), F.col("vec_id"))
                .limit(1).collect())  # bounded: 1 row
        if not best:
            break
        b = best[0]
        out.append((rank, int(b["vec_id"]), int(b["rel_micro6"]),
                    int(b["maxsim_micro6"] or 0), int(b["_s"])))
        sel = spark.createDataFrame(
            [([float(x) for x in b["_v"]],)], "_bv array<double>"
        ).withColumn("_bn", F.sqrt(_dot(F.col("_bv"), F.col("_bv"))))
        cand = (cand.where(F.col("vec_id") != int(b["vec_id"]))
                .crossJoin(F.broadcast(sel))  # 1-row scalar
                .withColumn(
                    "maxsim_micro6",
                    F.greatest(
                        F.col("maxsim_micro6"),
                        F.floor(_dot(F.col("_v"), F.col("_bv"))
                                / (F.col("_norm") * F.col("_bn"))
                                * 1000000).cast("long")))
                .drop("_bv", "_bn").localCheckpoint())
    return spark.createDataFrame(
        out, "pick_rank int, vec_id long, rel_micro6 long, "
             "maxsim_micro6 long, mmr_score long")


def embedding_profile(emb: DataFrame, scale: int = 10**6) -> DataFrame:
    """Per-dimension health profile of the embedding column — the
    check an ANN/index owner runs before trusting a vector space:
    dead dimensions (zero variance), scale drift between dimensions,
    and NaN/degenerate values all show up here before they poison
    every distance downstream.

    Each float is quantized ONCE to an integer (floor(x * scale) —
    one IEEE-deterministic multiply + floor, identical cross-engine),
    then all moments are BIGINT: per dimension the count, quantized
    sum, the n-scaled variance numerator n*sum(q^2) - sum(q)^2
    (non-negative by Cauchy-Schwarz), min/max, and the zero-value
    count.

    Output: (dim, n, sum_q, var_num, min_q, max_q, n_zero), one row
    per dimension (0-based).

    Scale shape: posexplode is map-side; ONE hash aggregate keyed by
    dimension — output rows = embedding width.
    """
    q = (emb.select(F.posexplode("embedding").alias("dim", "_x"))
         .select("dim", F.floor(F.col("_x").cast("double") * scale)
                 .cast("long").alias("_q")))
    return (q.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_q").cast("long").alias("sum_q"),
        (F.count(F.lit(1)) * F.sum(F.col("_q") * F.col("_q"))
         - F.sum("_q") * F.sum("_q")).cast("long").alias("var_num"),
        F.min("_q").cast("long").alias("min_q"),
        F.max("_q").cast("long").alias("max_q"),
        F.sum((F.col("_q") == 0).cast("int")).cast("long")
        .alias("n_zero"))
        .select(F.col("dim").cast("int"), "n", "sum_q", "var_num",
                "min_q", "max_q", "n_zero"))


def label_separation(emb: DataFrame, scale: int = 10**3) -> DataFrame:
    """Fisher-style label separability per embedding dimension: the
    one-way ANOVA share SS_between / SS_total of each dimension's
    quantized values over the label groups — the "is this vector
    space worth training a classifier on, and WHICH dimensions carry
    the signal" read.

    Float-free at a CONSISTENT n-scale: after the single
    floor(x*scale) quantization (scale 1e3 — what the engines READ
    from the float32 column, not python literals), sst_scaled =
    n * sum(q^2) - S^2 = n * SST and ssb_scaled = sum_l ((n*S_l -
    n_l*S)^2 div (n_l * n)) = n * SSB (per-label floor documented),
    so separation = ssb_scaled / sst_scaled exactly.  The micro6
    ratio guards INT64: when sst_scaled exceeds ~9e12 the multiply
    flips to the divide-first branch (ssb div (sst div 1e6)) — both
    branches are identical integer ops in both engines, so the
    result stays bit-deterministic; precision loss only in the
    flipped branch and bounded by 1 micro6.

    Output: (dim, n_labels, ssb_scaled, sst_scaled,
    separation_micro6), one row per dimension.

    Scale shape: posexplode map-side; two hash aggregates keyed by
    (dim) and (label, dim) — output bounded by width x labels.
    """
    q = (emb.select("label",
                    F.posexplode("embedding").alias("dim", "_x"))
         .select("label", "dim",
                 F.floor(F.col("_x").cast("double") * scale)
                 .cast("long").alias("_q")))
    tot = q.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_q").cast("long").alias("_s"),
        F.sum(F.col("_q") * F.col("_q")).cast("long").alias("_s2"))
    sst = tot.select(
        "dim", "_n", "_s",
        (F.col("_n") * F.col("_s2") - F.col("_s") * F.col("_s"))
        .cast("long").alias("sst_scaled"))
    grp = q.groupBy("dim", "label").agg(
        F.count(F.lit(1)).cast("long").alias("_ng"),
        F.sum("_q").cast("long").alias("_sg"))
    ssb = (grp.join(sst.select("dim", "_n", "_s"), "dim")
           .withColumn("_term",
                       F.expr("((_n * _sg - _ng * _s)"
                              " * (_n * _sg - _ng * _s))"
                              " div (_ng * _n)"))
           .groupBy("dim").agg(
               F.count(F.lit(1)).cast("long").alias("n_labels"),
               F.sum("_term").cast("long").alias("ssb_scaled")))
    return (sst.join(ssb, "dim")
            .where(F.col("sst_scaled") > 0)
            .select(F.col("dim").cast("int"), "n_labels",
                    "ssb_scaled", "sst_scaled",
                    F.expr("CASE WHEN sst_scaled <= 9000000000000"
                           " THEN (1000000 * ssb_scaled)"
                           " div sst_scaled"
                           " ELSE ssb_scaled"
                           " div (sst_scaled div 1000000) END")
                    .cast("long").alias("separation_micro6")))


def sq8_audit(emb: DataFrame) -> DataFrame:
    """int8 scalar-quantization loss audit per dimension — the
    go/no-go read before shipping an SQ8-compressed vector index
    (4x smaller, but HOW lossy, and WHERE?): per dimension, how much
    reconstruction error does the 8-bit code introduce, and how
    often does the value saturate the [-127, 127] range?

    Two reads of the same float32 cell, both single-multiply
    IEEE-deterministic (the embedding_profile discipline): the
    high-res reference q6 = floor(x * 1e6) and the stored code
    q8 = clip(floor(x * 64), -127, 127).  Because 1e6 / 64 = 15625
    EXACTLY, the dequantized code lands on the same micro6 grid and
    err = q6 - 15625 * q8 is a pure integer residual; within range
    it lies in [0, 15625) (floor-grid nesting), saturated cells
    can blow past it.

    Output per dim: (dim, n, n_saturated, sum_sq_err, max_abs_err,
    mean_err_micro6 = floor(1e6 * sum|err| / n)).

    Scale shape: map-side posexplode + ONE hash aggregate keyed by
    dimension — output rows = embedding width.
    """
    q = (emb.select(F.posexplode("embedding").alias("dim", "_x"))
         .select("dim",
                 F.floor(F.col("_x").cast("double") * 1000000)
                 .cast("long").alias("_q6"),
                 F.greatest(
                     F.lit(-127),
                     F.least(F.lit(127),
                             F.floor(F.col("_x").cast("double") * 64)
                             .cast("long"))).alias("_q8"),
                 (F.abs(F.floor(F.col("_x").cast("double") * 64))
                  > 127).cast("int").alias("_sat")))
    err = F.col("_q6") - F.lit(15625) * F.col("_q8")
    return (q.withColumn("_e", err)
            .groupBy("dim").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("_sat").cast("long").alias("n_saturated"),
                F.sum(F.col("_e") * F.col("_e")).cast("long")
                .alias("sum_sq_err"),
                F.max(F.abs("_e")).cast("long").alias("max_abs_err"),
                F.expr("(1000000 * sum(abs(_e))) div count(1)")
                .cast("long").alias("mean_err_micro6"))
            .select(F.col("dim").cast("int"), "n", "n_saturated",
                    "sum_sq_err", "max_abs_err", "mean_err_micro6"))


def ivf_quality(emb: DataFrame, n_cells: int = 8) -> DataFrame:
    """IVF cell-quality audit — the recall-risk read on the coarse
    quantizer: per cell, how tight are its members (cosine to their
    own centroid) and how close is the nearest COMPETING centroid
    (the argmax margin)?  Cells with thin margins are where nprobe=1
    loses recall, and exactly where ivf_topk's probe budget should
    grow.

    Same deterministic seed codebook and floor(cosine * 1e6) device
    as ivf_assign (the registered value-exact query), so every
    number here is the integer the index actually used.  margin_s6 =
    own_s6 - runner_up_s6 >= 0 by argmax.

    Output per cell: (cell, n, sum_own_s6, min_own_s6,
    sum_margin_s6, min_margin_s6, avg_margin_s6 = sum div n).

    Scale shape: broadcast codebook join + per-vector top-2 window
    (keyed by vec_id) + one cell aggregate — the corpus shuffles
    once on vec_id, same as the assign path.
    """
    base = _with_norm(emb.select("vec_id", "embedding"), "embedding")
    cents = F.broadcast(
        base.where(F.col("vec_id") < n_cells)
        .select(F.col("vec_id").alias("cell"),
                F.col("_v").alias("_cv"),
                F.col("_norm").alias("_cn")))
    sims = (base.join(cents)
            .select("vec_id", "cell",
                    F.floor((_dot(F.col("_v"), F.col("_cv"))
                             / (F.col("_norm") * F.col("_cn")))
                            * 1000000).cast("long").alias("_s6")))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("_s6").desc(), F.col("cell"))
    top2 = (sims.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= 2))
    per_vec = (top2.groupBy("vec_id").agg(
        F.max(F.when(F.col("_r") == 1, F.col("cell"))).alias("cell"),
        F.max(F.when(F.col("_r") == 1, F.col("_s6"))).alias("_own"),
        F.max(F.when(F.col("_r") == 2, F.col("_s6"))).alias("_alt")))
    return (per_vec
            .withColumn("_m", F.col("_own") - F.col("_alt"))
            .groupBy("cell").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("_own").cast("long").alias("sum_own_s6"),
                F.min("_own").cast("long").alias("min_own_s6"),
                F.sum("_m").cast("long").alias("sum_margin_s6"),
                F.min("_m").cast("long").alias("min_margin_s6"))
            .withColumn("avg_margin_s6",
                        F.expr("sum_margin_s6 div n").cast("long"))
            .select(F.col("cell").cast("int"), "n", "sum_own_s6",
                    "min_own_s6", "sum_margin_s6", "min_margin_s6",
                    "avg_margin_s6"))


def borda_fusion(rankings: "list[DataFrame]", k: int = 5) -> DataFrame:
    """Truncated Borda-count fusion of multiple (query_id, rank,
    neighbor_id) rankings — the positional-points companion to
    rrf_fusion: each list awards a candidate (L - rank + 1) points,
    where L is that list's OWN depth for the query (so a shorter ANN
    list never out-votes the deeper exact list), absentees get 0.
    Unlike RRF's 1/(60+r) (flat across ranks), Borda is linear — it
    rewards consistent mid-rank agreement more and top-1 spikes
    less; running both exposes rank-fusion sensitivity.

    Output: (query_id, rank, neighbor_id, borda_points, n_lists),
    re-ranked top-``k``, ties by neighbor_id — all integers.

    Plan: same as rrf_fusion — unionAll of top-k-bounded tables, one
    hash aggregate, one per-query window; no raw vectors.
    """
    from pyspark.sql import Window

    parts = []
    for r in rankings:
        wl = Window.partitionBy("query_id")
        parts.append(r.select(
            "query_id", "neighbor_id",
            (F.max("rank").over(wl) - F.col("rank") + 1)
            .cast("long").alias("_pts")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    agg = (u.groupBy("query_id", "neighbor_id")
           .agg(F.sum("_pts").cast("long").alias("borda_points"),
                F.count(F.lit(1)).cast("long").alias("n_lists")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("borda_points").desc(), F.col("neighbor_id"))
    return (agg.withColumn("rank",
                           F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id",
                    "borda_points", "n_lists"))


def embedding_pca(emb: DataFrame, n_iter: int = 4,
                  qscale: int = 1024,
                  vscale: int = 10**6) -> DataFrame:
    """Dominant principal component of the embedding cloud by
    integer fixed-point power iteration — the distribution-level
    read that completes the embedding-audit family:
    embedding_profile checks per-dimension moments, sq8_audit
    prices quantization, this one finds the DIRECTION the cloud
    actually varies along (anisotropy / rogue-dimension detection —
    a single dominant axis in a supposedly-isotropic embedding
    space is the classic symptom of uncentered features or a
    collapsed encoder).

    Quantize-first (the sq8_audit device): x_q = floor(x * qscale)
    on the DOUBLE-cast embedding, then every later step is integer
    arithmetic, so Spark and the unrolled DuckDB oracle agree
    bit-for-bit.  The covariance action is applied matrix-free
    against N^2-scaled centered second moments:

        C'v = N * sum_i x_i (x_i . v)  -  sx (sx . v)

    (sx = sum of x_q; C' = N^2 * covariance, an integer matrix
    never materialized), and each round renormalizes v to
    max-abs = vscale by a truncating division (both engines
    truncate toward zero, verified).

    Output: one row per dimension (dim_idx, v_u) — the final
    direction in units of 1/vscale.

    Scale shape: per round, ONE vec_id-keyed shuffle (the dot
    products) and ONE dim-keyed shuffle (the re-projection, dim is
    a bounded domain); the per-round 1-row scalars (sx.v, max-abs)
    attach as lazy broadcast crossJoins behind a localCheckpoint.
    N arrives via one bounded count() (the pagerank_fixed n
    pattern).  Row products are accumulated in DECIMAL(38,0)
    (DuckDB HUGEINT), so billion-row clouds cannot overflow.
    """
    x = (emb.select("vec_id",
                    F.posexplode(F.col("embedding")
                                 .cast("array<double>"))
                    .alias("dim", "_xd"))
         .select("vec_id", "dim",
                 F.floor(F.col("_xd") * qscale).cast("long")
                 .alias("xq"))
         .localCheckpoint())
    n = x.select("vec_id").dropDuplicates().count()  # bounded: one
    # scalar (the pagerank_fixed n-count pattern)
    sx = (x.groupBy("dim").agg(F.sum("xq").cast("long").alias("sxd"))
          .localCheckpoint())
    v = sx.select("dim",
                  F.when(F.col("dim") == 0, F.lit(vscale))
                  .otherwise(F.lit(0)).cast("long").alias("vu"))
    for _ in range(n_iter):
        t = (x.join(v, "dim")
             .groupBy("vec_id")
             .agg(F.sum(F.col("xq") * F.col("vu")).cast("long")
                  .alias("t")))
        w = (x.join(t, "vec_id")
             .groupBy("dim")
             .agg(F.sum(F.expr(
                 "CAST(xq AS DECIMAL(38,0)) * t")).alias("w")))
        sv = (v.join(sx, "dim")
              .agg(F.sum(F.expr("CAST(sxd AS DECIMAL(38,0)) * vu"))
                   .alias("sv")))
        cv = (w.join(sx, "dim")
              .crossJoin(F.broadcast(sv))  # 1-row scalar
              .select("dim",
                      F.expr(f"CAST({n} AS DECIMAL(38,0)) * w"
                             " - CAST(sxd AS DECIMAL(38,0)) * sv")
                      .alias("cvd")))
        m = cv.agg(F.max(F.abs(F.col("cvd"))).alias("m"))
        v = (cv.crossJoin(F.broadcast(m))  # 1-row scalar
             .select("dim",
                     F.expr(f"CASE WHEN m > 0 THEN CAST((cvd"
                            f" * {vscale}) div m AS BIGINT)"
                            " ELSE CAST(0 AS BIGINT) END")
                     .alias("vu"))
             .localCheckpoint())
    return v.select(F.col("dim").cast("int").alias("dim_idx"),
                    F.col("vu").cast("long").alias("v_u"))
