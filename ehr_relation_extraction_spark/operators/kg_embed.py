"""Integer-quantized KG-embedding scoring (TransE-style).

Bordes et al.'s TransE models a fact (h, r, t) as h + r ≈ t in
embedding space and scores it by -||h + r - t||.  Training a real
encoder is environment-blocked here (no torch), but the SCORING and
EVALUATION machinery — the part that runs over the full KG at
100 TB — is pure relational algebra, so we ship it with
hash-derived deterministic embeddings: emb(x)[d] = md5-nibble of
(x, d) shifted to [-8, 7].  Every score is a small integer, so the
Spark plan and the DuckDB oracle agree bit-exactly (the repo's
integer-device discipline), and a trained embedding table can later
replace the hash rows without touching any plan.

The score expression is emitted ONCE as an ANSI SQL string
(:func:`transe_score_sql`) and parsed by BOTH engines — the same
no-drift device the linker uses for its hash bucketing
(operators/linking.py).  Generalizes the reference's fixed
drug->attribute relation schema (ehr.py:239-258) to ranked
link-prediction over arbitrary web-entity predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DIM = 8


def _nib_sql(expr: str, d: int, salt: str = "") -> str:
    """One embedding coordinate in [-8, 7]: the md5-hex-nibble device
    over (value, dim), entity and relation spaces separated by salt."""
    inner = (f"concat('{salt}', {expr}, ':{d}')" if salt
             else f"concat({expr}, ':{d}')")
    return (f"(instr('0123456789abcdef', "
            f"substring(md5({inner}), 1, 1)) - 9)")


def transe_score_sql(h: str, r: str, t: str, dim: int = DIM) -> str:
    """L1 TransE energy sum_d |h_d + r_d - t_d| as one codegen-able
    SQL expression (lower = more plausible).  Range [0, 23 * dim]."""
    terms = [f"abs({_nib_sql(h, d)} + {_nib_sql(r, d, 'P:')}"
             f" - {_nib_sql(t, d)})" for d in range(dim)]
    return "(" + " + ".join(terms) + ")"


def transe_scores(triples: DataFrame, dim: int = DIM) -> DataFrame:
    """Score every distinct fact with the integer TransE energy —
    the KG-wide plausibility pass that feeds fact ranking and
    anomaly triage.  ONE distinct-projection shuffle; the score
    itself is a pure whole-stage-codegen expression (no UDF, no
    join, no explode — the dim loop is unrolled into the
    expression)."""
    facts = triples.select("subj", "pred", "obj").dropDuplicates()
    return facts.withColumn(
        "score",
        F.expr(f"CAST({transe_score_sql('subj', 'pred', 'obj')}"
               " AS BIGINT)"))


def transe_ranks(triples: DataFrame, n_cands: int = 100,
                 hits_k: int = 10, dim: int = DIM) -> DataFrame:
    """Filtered link-prediction evaluation, per predicate: rank every
    true fact's tail against a TYPE-CONSTRAINED corrupted-candidate
    set (the pred's own observed objects — the standard filtered
    protocol), report mean rank and hits@1/@k.

    Scale discipline: the candidate set per predicate is capped at
    ``n_cands`` by deterministic hash order (ORDER BY md5(obj) — the
    sampled-evaluation protocol), so the corruption join fans out at
    most ``n_cands`` rows per test fact regardless of corpus size;
    corrupted pairs that are themselves true facts are excluded with
    a null-flag left join (never a per-fact anti-join).  rank = 1 +
    #corrupted-with-strictly-smaller-energy (optimistic ranks; exact
    ties do not count against the true tail — documented
    deterministic convention).

    Output: (pred, n_test, n_cands, sum_rank, mean_rank_micro6,
    hits_at_1, hits_at_k)."""
    facts = triples.select("subj", "pred", "obj").dropDuplicates()
    scored = facts.withColumn(
        "score_true",
        F.expr(f"CAST({transe_score_sql('subj', 'pred', 'obj', dim)}"
               " AS BIGINT)"))
    cands = (facts.select("pred", "obj").dropDuplicates()
             .withColumn("rk", F.row_number().over(
                 Window.partitionBy("pred")
                 .orderBy(F.md5("obj"), "obj")))
             .where(F.col("rk") <= n_cands)
             .select("pred", F.col("obj").alias("obj_c")))
    n_c = cands.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_cands"))
    true_flag = (facts.select("subj", "pred",
                              F.col("obj").alias("obj_c"))
                 .withColumn("_t", F.lit(1)))
    corr = (scored.join(cands, "pred")
            .join(true_flag, ["subj", "pred", "obj_c"], "left")
            .where(F.col("_t").isNull())
            .withColumn(
                "score_c",
                F.expr(f"CAST("
                       f"{transe_score_sql('subj', 'pred', 'obj_c', dim)}"
                       " AS BIGINT)")))
    better = (corr.groupBy("subj", "pred", "obj")
              .agg(F.sum(F.when(F.col("score_c") < F.col("score_true"),
                                1).otherwise(0)).alias("_nb")))
    ranks = (scored.join(better, ["subj", "pred", "obj"], "left")
             .withColumn("rank", F.coalesce("_nb", F.lit(0)) + 1))
    return (ranks.groupBy("pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n_test"),
                 F.sum("rank").cast("long").alias("sum_rank"),
                 F.sum(F.when(F.col("rank") == 1, 1).otherwise(0))
                 .cast("long").alias("hits_at_1"),
                 F.sum(F.when(F.col("rank") <= hits_k, 1).otherwise(0))
                 .cast("long").alias("hits_at_k"))
            .join(n_c, "pred")
            .withColumn("mean_rank_micro6",
                        F.expr("CAST(sum_rank * 1000000 DIV n_test"
                               " AS BIGINT)"))
            .select("pred", "n_test", "n_cands", "sum_rank",
                    "mean_rank_micro6", "hits_at_1", "hits_at_k"))


def distmult_score_sql(h: str, r: str, t: str, dim: int = DIM) -> str:
    """DistMult bilinear score sum_d h_d * r_d * t_d as one
    codegen-able SQL expression (HIGHER = more plausible — note the
    opposite polarity to the TransE energy).  Range
    [-512 * dim, 448 * dim] for nibble coordinates in [-8, 7]."""
    terms = [f"({_nib_sql(h, d)} * {_nib_sql(r, d, 'P:')}"
             f" * {_nib_sql(t, d)})" for d in range(dim)]
    return "(" + " + ".join(terms) + ")"


def distmult_scores(triples: DataFrame, dim: int = DIM) -> DataFrame:
    """Score every distinct fact with the integer DistMult bilinear
    form (Yang et al., ICLR'15) — the second scoring family next to
    :func:`transe_scores`: DistMult is SYMMETRIC in (h, t), so facts
    whose plausibility is direction-dependent score identically both
    ways — exactly the model-capacity gap :func:`scorer_agreement`
    measures.  Same shape as transe_scores: one distinct-projection
    shuffle, score is pure whole-stage codegen."""
    facts = triples.select("subj", "pred", "obj").dropDuplicates()
    return facts.withColumn(
        "score",
        F.expr(f"CAST({distmult_score_sql('subj', 'pred', 'obj', dim)}"
               " AS BIGINT)"))


def scorer_agreement(triples: DataFrame, k: int = 10,
                     dim: int = DIM) -> DataFrame:
    """Ranker-agreement profile between the two embedding scorers:
    per predicate, how many of the TransE top-k (lowest energy) facts
    are also DistMult top-k (highest bilinear score)?  Low overlap on
    a predicate flags facts whose triage verdict depends on the model
    family — the ones a human should adjudicate before either score
    gates ingestion.

    Output: (pred, n_facts, topk, n_overlap, overlap_micro6); topk =
    min(k, n_facts).  Ties broken (subj, obj) asc under both rankers
    so the two top-k sets are deterministic.

    Scale: both scores are codegen expressions over ONE distinct fact
    projection; the two top-k picks are windows keyed by pred; the
    overlap is a keyed semi-join + roll-up."""
    facts = (triples.select("subj", "pred", "obj").dropDuplicates()
             .withColumn("te", F.expr(
                 f"CAST({transe_score_sql('subj', 'pred', 'obj', dim)}"
                 " AS BIGINT)"))
             .withColumn("dm", F.expr(
                 f"CAST({distmult_score_sql('subj', 'pred', 'obj', dim)}"
                 " AS BIGINT)")))
    wt = Window.partitionBy("pred").orderBy(
        F.col("te").asc(), F.col("subj"), F.col("obj"))
    wd = Window.partitionBy("pred").orderBy(
        F.col("dm").desc(), F.col("subj"), F.col("obj"))
    ranked = (facts.withColumn("rt", F.row_number().over(wt))
              .withColumn("rd", F.row_number().over(wd)))
    n_f = ranked.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_facts"))
    both = (ranked.where((F.col("rt") <= k) & (F.col("rd") <= k))
            .groupBy("pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n_overlap")))
    return (n_f.join(both, "pred", "left")
            .select("pred", "n_facts",
                    F.least(F.lit(k).cast("long"), F.col("n_facts"))
                    .alias("topk"),
                    F.coalesce("n_overlap", F.lit(0)).cast("long")
                    .alias("n_overlap"))
            .withColumn("overlap_micro6",
                        F.expr("CAST(n_overlap * 1000000 DIV topk"
                               " AS BIGINT)")))


def complex_score_sql(h: str, r: str, t: str, dim: int = DIM) -> str:
    """ComplEx score Re(<e_h, w_r, conj(e_t)>) (Trouillon et al.,
    ICML'16) as one codegen-able SQL expression: per dimension,
    hRe*rRe*tRe + hIm*rRe*tIm + hRe*rIm*tIm - hIm*rIm*tRe.  Real
    parts reuse the entity/relation nibble spaces of TransE/DistMult
    (salts '' and 'P:'); imaginary parts live in fresh salted spaces
    ('I:' entities, 'Q:' relations), so the real projection of this
    model IS the DistMult embedding — when the imaginary channel is
    zero the two scores coincide, which the oracle tests pin.
    HIGHER = more plausible.  Range [-2048 * dim, 2048 * dim] for
    nibbles in [-8, 7].
    """
    terms = []
    for d in range(dim):
        h_re, h_im = _nib_sql(h, d), _nib_sql(h, d, "I:")
        r_re, r_im = _nib_sql(r, d, "P:"), _nib_sql(r, d, "Q:")
        t_re, t_im = _nib_sql(t, d), _nib_sql(t, d, "I:")
        terms.append(
            f"({h_re} * {r_re} * {t_re} + {h_im} * {r_re} * {t_im}"
            f" + {h_re} * {r_im} * {t_im} - {h_im} * {r_im} * {t_re})")
    return "(" + " + ".join(terms) + ")"


def complex_scores(triples: DataFrame, dim: int = DIM) -> DataFrame:
    """Score every distinct fact with the integer ComplEx bilinear
    form — the third scoring family next to :func:`transe_scores`
    and :func:`distmult_scores`, and the one that closes DistMult's
    capacity gap: the imaginary channel makes the score ASYMMETRIC
    in (h, t), so direction-dependent predicates (parent_of vs
    child_of) can rank (h, r, t) and (t, r, h) differently — the
    exact failure mode scorer_agreement flags for DistMult.  Same
    scale shape as the siblings: one distinct-projection shuffle,
    score is pure whole-stage codegen (the dim loop unrolls into
    the expression; no UDF, no join, no explode)."""
    facts = triples.select("subj", "pred", "obj").dropDuplicates()
    return facts.withColumn(
        "score",
        F.expr(f"CAST({complex_score_sql('subj', 'pred', 'obj', dim)}"
               " AS BIGINT)"))
