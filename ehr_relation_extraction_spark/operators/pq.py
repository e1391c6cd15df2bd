"""Product quantization (PQ) for the embedding stack — the
memory-side complement to IVF (operators/similarity.py): vectors
compress to ``m`` one-byte codes (one per subspace), and search runs
over the CODES via asymmetric distance computation (ADC, Jegou et al.,
"Product Quantization for Nearest Neighbor Search", PAMI'11) — at
10^12 vectors the index is m bytes/vector instead of 4*dim, and the
scan never touches raw embeddings.

Spark-first shapes, mirroring the IVF discipline:

- codebooks are a bounded broadcast dimension (m * k rows); training
  collects only quantized means per round (m * k * dsub longs), never
  vectors;
- assignment/encode joins the corpus's subvectors against the
  broadcast codebook on the subspace id — an equi-join, k candidate
  rows per subvector, argmin by (quantized distance, code);
- ADC search explodes codes to (vec_id, sub, code) and equi-joins the
  per-query lookup table on (sub, code), then one sum aggregate per
  (query, vector) — no raw-vector product anywhere.

Everything is integer-quantized (floor(x * 1e6)) at the decision
points, so training and search are bit-deterministic under any
partitioning and exactly reproducible by the serial numpy replica in
tests/test_pq.py.

Reference analogue: none (single-document service); this is the
training-data/serving side of the brief, same family as
similarity.py's IVF thread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _subvectors(emb: DataFrame, m: int) -> DataFrame:
    """(vec_id, sub, _sv): split each embedding into m contiguous
    subvectors (dim must divide evenly; checked lazily by slice
    semantics — a ragged final slice would change lengths)."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = F.size(v)
    dsub = (d / m).cast("int")
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.struct(
            s.cast("int").alias("sub"),
            F.slice(v, s * dsub + 1, dsub).alias("_sv")))
    return (emb.select("vec_id", F.explode(subs).alias("e"))
            .select("vec_id", F.col("e.sub").alias("sub"),
                    F.col("e._sv").alias("_sv")))


def _query_side(emb: DataFrame, n_queries: int) -> DataFrame:
    """The benchmark query workload: the ``n_queries`` SMALLEST actual
    vec_ids (not ``vec_id < n_queries`` — sparse/offset id spaces must
    still yield exactly n_queries rows).  The id list is collected
    (bounded by n_queries, a benchmark knob ~20) and inlined as a
    literal filter so the corpus scan stays a pushed-down IN."""
    ids = [r["vec_id"] for r in
           emb.select("vec_id").orderBy("vec_id").limit(n_queries).collect()]
    return emb.where(F.col("vec_id").isin(ids))


def _codebook_frame(spark, codebooks: "list[list[list[float]]]"):
    """(sub, code, _cv) broadcast dimension from nested codebooks
    [m][k][dsub]."""
    rows = [(s, c, [float(x) for x in vec])
            for s, cb in enumerate(codebooks)
            for c, vec in enumerate(cb)]
    return spark.createDataFrame(
        rows, "sub int, code int, _cv array<double>")


def _l2_q6(a, b):
    """floor(1e6 * sum (a_i - b_i)^2), folded in index order — the
    quantized L2 both engines (Spark and the numpy replica) reproduce
    bit-exactly."""
    return F.floor(
        F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, v: acc + v) * 1000000
    ).cast("long")


def _assign_codes(sv: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, sub, code): argmin quantized-L2 centroid per
    subvector, ties to the smallest code.  Equi-join on sub (k rows
    per subvector), then min_by over a (dist, code) struct — one
    aggregate, no window."""
    scored = (sv.join(F.broadcast(cents), "sub")
              .select("vec_id", "sub",
                      F.struct(
                          _l2_q6(F.col("_sv"), F.col("_cv")).alias("d"),
                          F.col("code").alias("code")).alias("_sc")))
    return (scored.groupBy("vec_id", "sub")
            .agg(F.min("_sc").alias("_best"))
            .select("vec_id", "sub", F.col("_best.code").alias("code")))


def _seed_codebooks(emb: DataFrame, m: int,
                    k: int) -> "list[list[list[float]]]":
    """Deterministic PQ seed: the subvectors of the k SMALLEST actual
    vec_ids (not ``vec_id < k`` — sparse or offset id spaces must
    still yield exactly k seed rows).  Validates dim % m == 0 up
    front: a ragged final slice would silently drop the trailing dims
    from every distance."""
    seed = (emb.orderBy("vec_id").limit(k)
            .select(F.col("embedding").cast("array<double>").alias("v"))
            .collect())
    if len(seed) < k:
        raise ValueError(
            f"need >= k={k} vectors to seed PQ codebooks, got {len(seed)}")
    dim = len(seed[0]["v"])
    if dim % m != 0:
        raise ValueError(
            f"embedding dim {dim} not divisible by m={m}: the trailing "
            f"{dim % m} dims would be silently dropped from every distance")
    dsub = dim // m
    return [[list(r["v"][s * dsub:(s + 1) * dsub]) for r in seed]
            for s in range(m)]


def _subvec_q6(sv: DataFrame) -> DataFrame:
    """(vec_id, sub, dim, q6): per-dimension integer micro-units of
    each subvector — quantize BEFORE summing so Lloyd means are
    order-independent (bit-identical under any partitioning and in
    the SQL oracle; float accumulation order would not be)."""
    return sv.select(
        "vec_id", "sub",
        F.posexplode(F.transform(
            "_sv", lambda x: F.floor(x * 1000000).cast("long")))
        .alias("dim", "q6"))


def pq_centroid_update(emb: DataFrame, m: int = 8,
                       k: int = 16) -> DataFrame:
    """One Lloyd update step for the PQ codebooks — the per-subspace
    twin of similarity.ivf_centroid_update and the unit the driver
    oracle verifies value-exactly: assign every subvector to its
    nearest SEED centroid (quantized L2, ties to the smallest code),
    then recompute each (sub, code) centroid as the floor-quantized
    per-dimension mean.

    Output: (sub, code, dim, n_subvecs, sum_q6, mean_q6); mean_q6 =
    floor(sum_q6 / n_subvecs) is the quantized centroid coordinate.
    Codes with no members emit no rows (train_pq_codebooks keeps the
    seed centroid for those).

    Scale: assignment is a broadcast equi-join + one min_by aggregate
    (k candidate rows per subvector, no corpus shuffle); the update is
    ONE hash-aggregate on (sub, code, dim) — partial map-side combine,
    the shuffle is m * k * dsub partial rows per partition,
    independent of corpus size."""
    spark = emb.sparkSession
    cents = _codebook_frame(spark, _seed_codebooks(emb, m, k))
    sv = _subvectors(emb, m)
    codes = _assign_codes(sv, cents)
    return (codes.join(_subvec_q6(sv), ["vec_id", "sub"])
            .groupBy("sub", "code", "dim")
            .agg(F.count(F.lit(1)).cast("long").alias("n_subvecs"),
                 F.sum("q6").cast("long").alias("sum_q6"))
            .withColumn("mean_q6",
                        F.floor(F.col("sum_q6") / F.col("n_subvecs"))
                        .cast("long"))
            .select(F.col("sub").cast("int").alias("sub"),
                    F.col("code").cast("int").alias("code"),
                    F.col("dim").cast("int").alias("dim"),
                    "n_subvecs", "sum_q6", "mean_q6"))


def train_pq_codebooks(emb: DataFrame, m: int = 8, k: int = 16,
                       rounds: int = 3) -> "list[list[list[float]]]":
    """Per-subspace Lloyd with the IVF codebook's determinism
    contract: seed = subvectors of the first k vec_ids; each round
    assigns (equi-join + min_by) and updates centroids as
    floor-quantized means (order-independent integer sums); empty
    codes keep their centroid.  Driver traffic per round is the
    m * k * dsub mean table — codebook-sized, never corpus-sized."""
    spark = emb.sparkSession
    codebooks = _seed_codebooks(emb, m, k)
    sv = _subvectors(emb, m).localCheckpoint()
    for _ in range(rounds):
        cents = _codebook_frame(spark, codebooks)
        codes = _assign_codes(sv, cents)
        upd = (codes.join(_subvec_q6(sv), ["vec_id", "sub"])
               .groupBy("sub", "code", "dim")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("q6").alias("s"))
               .select("sub", "code", "dim",
                       F.floor(F.col("s") / F.col("n")).alias("mean_q6"))
               .collect())
        nxt = [[list(c) for c in cb] for cb in codebooks]
        for r in upd:
            nxt[r["sub"]][r["code"]][r["dim"]] = r["mean_q6"] / 1e6
        codebooks = nxt
    return codebooks


def pq_encode(emb: DataFrame,
              codebooks: "list[list[list[float]]]") -> DataFrame:
    """(vec_id, codes array<int>): the compressed corpus — m small
    ints per vector, the table an ADC scan reads instead of raw
    embeddings."""
    spark = emb.sparkSession
    cents = _codebook_frame(spark, codebooks)
    codes = _assign_codes(_subvectors(emb, len(codebooks)), cents)
    return (codes.groupBy("vec_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("sub", "code"))),
                lambda p: p["code"]).alias("codes")))


def _exact_rerank(shortlist: DataFrame, emb: DataFrame,
                  k: int) -> DataFrame:
    """Exact-cosine rerank of an ADC shortlist — the standard PQ
    accuracy recovery (Jégou et al.'s IVFADC+R): raw vectors are
    touched ONLY for the (n_queries * R) shortlist rows, never for the
    corpus scan, so the 100 TB shape is unchanged while recall@k
    approaches the shortlist's recall@R.  Same similarity quantization
    and tie-break as brute_force_topk, so results are engine-exact.

    Output: (query_id, rank, neighbor_id, sim_micro6)."""
    from .similarity import _dot, _with_norm

    base = _with_norm(emb.select("vec_id", "embedding"), "embedding")
    q = base.select(F.col("vec_id").alias("query_id"),
                    F.col("_v").alias("_qv"), F.col("_norm").alias("_qn"))
    c = base.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("_v").alias("_cv"), F.col("_norm").alias("_cn"))
    scored = (shortlist.select("query_id", "neighbor_id")
              .join(q, "query_id").join(c, "neighbor_id")
              .select("query_id", "neighbor_id",
                      F.floor(_dot(F.col("_qv"), F.col("_cv"))
                              / (F.col("_qn") * F.col("_cn")) * 1000000)
                      .cast("long").alias("sim_micro6")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_micro6").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "sim_micro6"))


def pq_topk(emb: DataFrame, codebooks: "list[list[list[float]]]",
            n_queries: int = 20, k: int = 5,
            rerank: "int | None" = None) -> DataFrame:
    """ADC top-k: approximate L2 distance of query q to vector x =
    sum over subspaces of ||q_sub - centroid(code_x_sub)||^2 — the
    per-query lookup table (m * k quantized distances) is built by an
    equi-join of query subvectors against the broadcast codebook, the
    scan is an equi-join of the CODE table against that LUT on
    (sub, code), and one sum-aggregate ranks candidates.  Raw
    embeddings appear only on the (bounded) query side.

    Output: (query_id, rank, neighbor_id, adist_q6) — adist_q6 is the
    integer-quantized approximate distance, rank 1 = nearest.

    ``rerank=R``: return the exact-cosine rerank of the ADC top-R
    shortlist instead (output ends in sim_micro6) — the accuracy mode
    the ANN bench records recall for."""
    if rerank is not None:
        shortlist = pq_topk(emb, codebooks, n_queries, k=rerank)
        return _exact_rerank(shortlist, emb, k)
    spark = emb.sparkSession
    m = len(codebooks)
    cents = _codebook_frame(spark, codebooks)
    qsv = (_subvectors(_query_side(emb, n_queries), m)
        .withColumnRenamed("vec_id", "query_id"))
    lut = (qsv.join(F.broadcast(cents), "sub")
           .select("query_id", "sub", "code",
                   _l2_q6(F.col("_sv"), F.col("_cv")).alias("d_q6")))
    enc = pq_encode(emb, codebooks)
    exploded = enc.select(
        F.col("vec_id").alias("neighbor_id"),
        F.posexplode("codes").alias("sub", "code"))
    dists = (exploded.join(F.broadcast(lut), ["sub", "code"])
             .where(F.col("neighbor_id") != F.col("query_id"))
             .groupBy("query_id", "neighbor_id")
             .agg(F.sum("d_q6").cast("long").alias("adist_q6"),
                  F.count(F.lit(1)).alias("_m")))
    # a candidate must have all m subspace terms (always true by
    # construction; the guard keeps the contract explicit)
    dists = dists.where(F.col("_m") == m).drop("_m")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist_q6").asc(), F.col("neighbor_id"))
    return (dists.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "adist_q6"))


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cells + PQ over residuals (the Faiss IndexIVFPQ shape)
# ---------------------------------------------------------------------------


def _residuals(emb: DataFrame, assigned: DataFrame,
               coarse: "list[list[float]]") -> DataFrame:
    """(vec_id, cell, embedding): vector minus its coarse centroid —
    the residual PQ quantizes.  Centroids join in as a broadcast
    (cell, _cc) dimension; the subtraction is a zip_with."""
    spark = emb.sparkSession
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(coarse)]
    cents = F.broadcast(spark.createDataFrame(
        rows, "cell int, _cc array<double>"))
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (emb.select("vec_id", v.alias("_v"))
            .join(assigned.select("vec_id", "cell"), "vec_id")
            .join(cents, "cell")
            .select("vec_id", "cell",
                    F.zip_with("_v", "_cc",
                               lambda x, c: x - c).alias("embedding")))


def train_ivfpq(emb: DataFrame, n_cells: int = 8, m: int = 8,
                k: int = 16, rounds: int = 2):
    """Train the composed index: IVF coarse codebook (cosine Lloyd,
    similarity.train_ivf_codebook) + ONE shared PQ codebook set over
    the coarse residuals (the standard IVF-PQ layout — per-cell
    codebooks multiply index metadata by n_cells for marginal gain).
    Returns (coarse, pq_codebooks)."""
    from .similarity import ivf_assign, train_ivf_codebook

    coarse = train_ivf_codebook(emb, n_cells, rounds)
    assigned = ivf_assign(emb, n_cells, codebook=coarse)
    resid = _residuals(emb, assigned, coarse).localCheckpoint()
    return coarse, train_pq_codebooks(resid, m=m, k=k, rounds=rounds)


def ivfpq_encode(emb: DataFrame, coarse: "list[list[float]]",
                 pq_codebooks) -> DataFrame:
    """(vec_id, cell, codes): the full compressed index row — a coarse
    cell id + m residual codes per vector (m+1 small ints instead of
    4*dim bytes)."""
    from .similarity import ivf_assign

    assigned = ivf_assign(emb, len(coarse), codebook=coarse) \
        .select("vec_id", "cell")
    resid = _residuals(emb, assigned, coarse)
    codes = pq_encode(resid.select("vec_id", "embedding"), pq_codebooks)
    return assigned.join(codes, "vec_id").select("vec_id", "cell", "codes")


def ivfpq_topk(emb: DataFrame, coarse: "list[list[float]]",
               pq_codebooks, n_queries: int = 20, nprobe: int = 2,
               k: int = 5, rerank: "int | None" = None) -> DataFrame:
    """IVF-PQ search: probe the ``nprobe`` coarse cells with the
    highest query-centroid cosine (same scoring as ivf_topk), then ADC
    over the probed candidates' residual codes with a PER-(query,
    cell) lookup table — the LUT is built on the query's residual
    against EACH probed cell's centroid, so the asymmetric distance is
    to q - c_cell exactly as the encoded residuals are x - c_cell.

    All joins are equi-joins; the LUT (n_queries * nprobe * m * k
    rows) and probe list are broadcast dimensions; candidate rows are
    only the probed cells' code rows.

    Output: (query_id, rank, neighbor_id, adist_q6).

    ``rerank=R``: exact-cosine rerank of the ADC top-R shortlist
    (output ends in sim_micro6), see :func:`_exact_rerank`."""
    from .similarity import _codebook_frame as _coarse_frame
    from .similarity import _dot, _with_norm

    if rerank is not None:
        shortlist = ivfpq_topk(emb, coarse, pq_codebooks, n_queries,
                               nprobe, k=rerank)
        return _exact_rerank(shortlist, emb, k)
    spark = emb.sparkSession
    m = len(pq_codebooks)
    enc = ivfpq_encode(emb, coarse, pq_codebooks).localCheckpoint()

    qv = _with_norm(
        _query_side(emb, n_queries)
        .select(F.col("vec_id").alias("query_id"), "embedding"),
        "embedding").select("query_id", F.col("_v").alias("_qv"),
                            F.col("_norm").alias("_qn"))
    cents = F.broadcast(_coarse_frame(spark, coarse))
    scores = qv.join(cents).select(
        "query_id", "cell",
        F.floor(_dot(F.col("_qv"), F.col("_cv"))
                / (F.col("_qn") * F.col("_cn")) * 1000000)
        .cast("long").alias("_s6"))
    wp = Window.partitionBy("query_id").orderBy(
        F.col("_s6").desc(), F.col("cell"))
    probes = (scores.withColumn("_r", F.row_number().over(wp))
              .where(F.col("_r") <= nprobe)
              .select("query_id", F.col("cell").cast("int").alias("cell")))

    # per-(query, probed-cell) residual LUT
    qres = (qv.select("query_id", "_qv")
            .join(probes, "query_id")
            .select(F.col("query_id").alias("vec_id"), "cell", "_qv"))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(coarse)]
    cframe = F.broadcast(spark.createDataFrame(
        rows, "cell int, _cc array<double>"))
    qres = (qres.join(cframe, "cell")
            .select("vec_id", "cell",
                    F.zip_with("_qv", "_cc",
                               lambda x, c: x - c).alias("embedding")))
    qsv = _residual_subvectors(qres, m)
    lut = (qsv.join(F.broadcast(_codebook_frame(spark, pq_codebooks)),
                    "sub")
           .select(F.col("vec_id").alias("query_id"), "cell", "sub",
                   "code", _l2_q6(F.col("_sv"), F.col("_cv"))
                   .alias("d_q6")))

    # the (cell, sub, code) equi-join against the LUT is ALSO the
    # probe filter: the LUT only holds probed (query, cell) pairs, so
    # un-probed cells' code rows match nothing for that query
    exploded = (enc.select(F.col("vec_id").alias("neighbor_id"),
                           "cell", F.posexplode("codes")
                           .alias("sub", "code")))
    dists = (exploded.join(F.broadcast(lut), ["cell", "sub", "code"])
             .where(F.col("neighbor_id") != F.col("query_id"))
             .groupBy("query_id", "neighbor_id")
             .agg(F.sum("d_q6").cast("long").alias("adist_q6"),
                  F.count(F.lit(1)).alias("_m"))
             .where(F.col("_m") == m).drop("_m"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist_q6").asc(), F.col("neighbor_id"))
    return (dists.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "adist_q6"))


def _residual_subvectors(qres: DataFrame, m: int) -> DataFrame:
    """(vec_id, cell, sub, _sv): subvector split that CARRIES the cell
    column (the per-(query, cell) residual identity the IVF-PQ LUT
    needs)."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = F.size(v)
    dsub = (d / m).cast("int")
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.struct(
            s.cast("int").alias("sub"),
            F.slice(v, s * dsub + 1, dsub).alias("_sv")))
    return (qres.select("vec_id", "cell", F.explode(subs).alias("e"))
            .select("vec_id", "cell", F.col("e.sub").alias("sub"),
                    F.col("e._sv").alias("_sv")))
