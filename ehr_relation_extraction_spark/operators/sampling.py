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
