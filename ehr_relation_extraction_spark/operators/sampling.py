"""Deterministic weighted sampling (integer bottom-k priorities).

Efraimidis & Spirakis's weighted reservoir scheme samples without
replacement by giving every item the key u^(1/w) and keeping the k
largest — equivalently, keeping the k SMALLEST values of
-ln(u)/w, an exponential race with rate w.  The float race does not
cross engines bit-exactly, so this module ships the integer variant
the repo's oracle discipline requires: priority = h * 2^20 // w,
where h is a 32-bit md5-derived uniform and w >= 1 the item weight —
heavier items draw stochastically smaller priorities and win the
bottom-k more often, the selection is a pure function of (id, w),
and both engines evaluate the SAME SQL expression string (the
kg_embed no-drift device).

int64 envelope: h < 2^32 and the 2^20 precision shift keep the
numerator under 2^52.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PRECISION_SHIFT = 1 << 20


def md5_int32_sql(expr: str) -> str:
    """First 8 md5 hex nibbles of ``expr`` as an integer in
    [0, 2^32): the repo's md5-nibble device widened to 32 bits,
    unrolled so DuckDB and Spark parse one identical expression."""
    terms = [
        f"(instr('0123456789abcdef', substring(md5({expr}), {i + 1}, 1))"
        # CAST the radix literal: bare int literals are INT32 in
        # Spark ANSI mode and nib * 16^7 overflows them
        f" - 1) * CAST({16 ** (7 - i)} AS BIGINT)"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def weighted_priority_sql(id_expr: str, w_expr: str,
                          div: str = "DIV") -> str:
    """The integer race key: smaller = more likely sampled; weight
    must be >= 1 (callers clamp).  ``div`` is the engine's integer
    division spelling (Spark ``DIV``, DuckDB ``//``) — the ONLY
    non-shared token, and both operands are non-negative, so floor
    and truncate agree."""
    return (f"CAST({md5_int32_sql(id_expr)} * {PRECISION_SHIFT}"
            f" {div} {w_expr} AS BIGINT)")


def weighted_sample(pages: DataFrame, tokens: DataFrame,
                    k: int = 3) -> DataFrame:
    """Per-host weighted document sample: keep each host's ``k``
    documents with the smallest integer race priorities, weighted by
    token count — the curation primitive for "give me a few
    representative (length-weighted) pages per site" that feeds
    human review and per-host quality audits.

    Plan: one token-count aggregate, one host-keyed window (bottom-k
    per partition key — distributed, never a global sort), zero
    joins beyond the count attach.  The sample is a pure function of
    (doc_id, weight), so recomputing after a resume or on a
    different partitioning returns the identical rows.

    Output: (host, doc_id, weight, priority, rk), rk in 1..k."""
    w = (tokens.groupBy("doc_id")
         .agg(F.count(F.lit(1)).cast("long").alias("weight")))
    host = F.regexp_extract("url", r"^https?://([^/]*)", 1)
    pts = (pages.select("doc_id", host.alias("host"))
           .join(w, "doc_id")
           .withColumn("priority", F.expr(weighted_priority_sql(
               "CAST(doc_id AS STRING)", "weight"))))
    rk = F.row_number().over(
        Window.partitionBy("host").orderBy("priority", "doc_id"))
    return (pts.withColumn("rk", rk.cast("int"))
            .where(F.col("rk") <= k)
            .select("host", "doc_id", "weight", "priority", "rk"))


def greedy_coverage(doc_entities: DataFrame, k: int = 5) -> DataFrame:
    """Greedy maximum-coverage corpus selection: pick up to ``k``
    documents, each round taking the doc that covers the most
    still-uncovered entities (ties -> smallest doc_id), stopping
    early when the best marginal gain hits zero.  The classic
    (1 - 1/e)-approximation greedy, used to curate a small corpus
    slice that maximizes entity coverage (seed-set selection for
    annotation / eval splits).

    ``doc_entities``: (doc_id, canonical_id) — deduplicated
    doc -> entity incidence (any extra columns are ignored).

    Per round: one grouped count over the incidence rows still
    uncovered (anti-join on the covered-entity set) + one 1-row
    bounded collect (the argmax — never corpus-sized); the covered
    set and the shrinking incidence table localCheckpoint per round,
    so round r scans only what rounds 1..r-1 left uncovered.  k is a
    small constant -> k bounded collects total.

    Returns (pick_rank, doc_id, gain, covered_cum) for the selected
    docs in pick order.
    """
    spark = doc_entities.sparkSession
    inc = (doc_entities.select("doc_id", "canonical_id")
           .dropDuplicates().localCheckpoint())
    out: list[tuple[int, int, int, int]] = []
    covered_cum = 0
    for rank in range(1, k + 1):
        best = (inc.groupBy("doc_id")
                .agg(F.count(F.lit(1)).cast("long").alias("gain"))
                .orderBy(F.col("gain").desc(), F.col("doc_id").asc())
                .limit(1).collect())  # bounded: 1 row
        if not best or best[0]["gain"] == 0:
            break
        doc_id, gain = best[0]["doc_id"], int(best[0]["gain"])
        covered_cum += gain
        out.append((rank, doc_id, gain, covered_cum))
        newly = (inc.where(F.col("doc_id") == F.lit(doc_id))
                 .select("canonical_id"))
        inc = (inc.join(newly, "canonical_id", "anti")
               .localCheckpoint())
    schema = ("pick_rank int, doc_id long, gain long, "
              "covered_cum long")
    return spark.createDataFrame(
        [(r, int(d), g, c) for r, d, g, c in out], schema)


def neyman_allocation(docs: DataFrame, budget: int = 1000,
                      stratum_col: str = "lang",
                      value_col: str = "n_chars") -> DataFrame:
    """Exact Neyman allocation of a sampling budget across strata —
    the survey-design primitive behind every "sample B docs for
    human eval / training mixture" step: stratum h gets n_h
    proportional to N_h * S_h (population-variance form), which
    minimizes the variance of the estimated corpus mean under a
    fixed budget.  Deviation from textbook floats, on purpose:

    - N_h * S_h = sqrt(N_h^2 * Var_pop) = sqrt(SS_h) where
      SS_h = N_h * sum(x^2) - sum(x)^2, an integer; the weight is
      the EXACT integer square root, computed as floor(sqrt(double))
      followed by a +/-1 integer correction (s -= s*s > x;
      s += (s+1)^2 <= x), so double rounding can never leak in.
    - seats round by the largest-remainder (Hamilton) method:
      floor(B * W_h / sum W) each, then the B - sum(floor) leftover
      seats go to the largest remainders (ties by stratum name) —
      allocations are integers that sum to EXACTLY the budget.

    If every stratum is constant (sum W = 0) no allocation is
    defensible and all seats stay at 0.

    Output: (stratum, n_docs, ss, w, alloc_floor, alloc).

    Scale shape: ONE corpus-wide moment aggregate; everything after
    runs on the bounded stratum table (windows over L rows).
    Docstring bound: SS_h stays in int64 to ~1e18 (about 1e8 docs
    of 3e3 chars per stratum); beyond that promote the moments to
    DECIMAL(38,0).
    """
    m = (docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(value_col).cast("long")).alias("_sx"),
        F.sum(F.col(value_col).cast("long")
              * F.col(value_col).cast("long")).alias("_sxx"))
        .withColumn("ss", (F.col("n_docs") * F.col("_sxx")
                           - F.col("_sx") * F.col("_sx"))
                    .cast("long")))
    m = m.withColumn(
        "w", F.expr(
            "CAST(floor(sqrt(CAST(ss AS DOUBLE))) AS BIGINT)"
            " - CASE WHEN CAST(floor(sqrt(CAST(ss AS DOUBLE))) AS BIGINT)"
            "        * CAST(floor(sqrt(CAST(ss AS DOUBLE))) AS BIGINT) > ss"
            "        THEN 1 ELSE 0 END"
            " + CASE WHEN (CAST(floor(sqrt(CAST(ss AS DOUBLE))) AS BIGINT) + 1)"
            "        * (CAST(floor(sqrt(CAST(ss AS DOUBLE))) AS BIGINT) + 1) <= ss"
            "        THEN 1 ELSE 0 END"))
    wtot = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    m = (m.withColumn("_wsum", F.sum("w").over(wtot))
         .withColumn("alloc_floor",
                     F.when(F.col("_wsum") > 0,
                            F.expr(f"({budget} * w) div _wsum"))
                     .otherwise(F.lit(0)).cast("long"))
         .withColumn("_rem",
                     F.when(F.col("_wsum") > 0,
                            F.expr(f"({budget} * w) % _wsum"))
                     .otherwise(F.lit(0)).cast("long")))
    m = (m.withColumn("_left",
                      F.lit(budget) * F.max(
                          (F.col("_wsum") > 0).cast("long")).over(wtot)
                      - F.sum("alloc_floor").over(wtot))
         .withColumn("_rk", F.row_number().over(
             Window.orderBy(F.col("_rem").desc(), F.col("stratum")))))
    return (m.withColumn(
        "alloc", (F.col("alloc_floor")
                  + (F.col("_rk") <= F.col("_left")).cast("long"))
        .cast("long"))
        .select("stratum", "n_docs", "ss", "w", "alloc_floor", "alloc"))
