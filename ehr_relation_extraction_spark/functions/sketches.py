"""Mergeable cardinality sketches — deterministic HyperLogLog.

HyperLogLog (Flajolet et al., AofA'07) over a DETERMINISTIC
md5-derived (register, rank) decomposition, so unlike Spark's
built-in ``approx_count_distinct`` the sketch itself is a first-class
TABLE: cross-engine exact (the DuckDB oracle replays the same hex
arithmetic), mergeable by a union + max aggregate, and storable.
That is the 100 TB operating mode — keep one (register, max_rho)
table per corpus shard / crawl day (<= 256 rows each), answer "how
many distinct tokens/urls/entities" over ANY shard combination by
merging sketches, never rescanning the corpus.

Decomposition of h = md5(item):
- register = integer value of the first ``n_nib`` hex nibbles
  (m = 16^n_nib registers);
- rank rho = 1 + number of leading zero BITS in the next 12 nibbles
  (48 bits; all-zero tail => rho = 49), computed exactly from the
  hex string: 4 * (leading zero nibbles) + zero bits within the
  first non-zero nibble + 1.  All integer/string ops — no floats,
  no platform-dependent bit intrinsics — so Spark and DuckDB agree
  byte-for-byte (the same md5-hex-nibble pattern the minhash and
  negative-sampling oracles rely on).

Plan shape: one projection + one (register) hash-aggregate — map-side
partial combine, 16^n_nib result rows; no shuffle of the item stream
beyond the aggregate.  The float estimator (`estimate`) runs on the
collected <= m-row register table on the driver, never in the plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

HLL_NIBBLES = 2  # 256 registers; standard error ~1.04/sqrt(256) = 6.5%
_HEX = "0123456789abcdef"


def hll_registers(items: DataFrame, col: str,
                  n_nib: int = HLL_NIBBLES) -> DataFrame:
    """(register, max_rho): the HLL register table of ``items[col]``.

    Duplicate items are free (max is idempotent); NULL items are
    dropped.  Registers never hit by any item are absent (the
    estimator treats absent as 0).
    """
    h = F.md5(F.col(col).cast("string")).alias("_h")
    d = items.where(F.col(col).isNotNull()).select(h)
    reg = None
    for i in range(1, n_nib + 1):
        v = F.expr(f"instr('{_HEX}', substring(_h, {i}, 1)) - 1")
        reg = v if reg is None else reg * 16 + v
    tail = f"substring(_h, {n_nib + 1}, 12)"
    z = F.expr(f"trim(LEADING '0' FROM {tail})")
    first = F.expr(
        f"instr('{_HEX}', substring(trim(LEADING '0' FROM {tail}), 1, 1)) - 1")
    zero_bits = (F.when(first >= 8, F.lit(0))
                 .when(first >= 4, F.lit(1))
                 .when(first >= 2, F.lit(2)).otherwise(F.lit(3)))
    rho = (F.when(F.length(z) == 0, F.lit(49))
           .otherwise((F.lit(12) - F.length(z)) * 4 + zero_bits + 1))
    return (d.select(reg.cast("int").alias("register"),
                     rho.cast("int").alias("rho"))
            .groupBy("register")
            .agg(F.max("rho").cast("int").alias("max_rho")))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union registers, max per register — sketch(A) merge sketch(B)
    == sketch(A union B) exactly (max is associative/commutative/
    idempotent).  This is the shard-combine step at scale."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.groupBy("register")
            .agg(F.max("max_rho").cast("int").alias("max_rho")))


def hll_estimate(register_rows, n_nib: int = HLL_NIBBLES) -> float:
    """Bias-corrected HLL cardinality estimate from a collected
    register table (list of (register, max_rho) rows — <= 16^n_nib of
    them; driver-side floats are fine here, the sketch stays exact).
    Standard small-range (linear counting) correction included."""
    m = 16 ** n_nib
    regs = {int(r[0]): int(r[1]) for r in register_rows}
    alpha = 0.7213 / (1 + 1.079 / m)
    inv_sum = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    est = alpha * m * m / inv_sum
    zeros = m - len(regs)
    if est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return est


def hll_token_sketch(docs: DataFrame,
                     n_nib: int = HLL_NIBBLES) -> DataFrame:
    """Distinct-token sketch of a corpus: the whitespace token stream
    (same split as the quality features) fed through
    :func:`hll_registers`.  One explode + one aggregate."""
    toks = (docs.select(F.explode(
        F.filter(F.split(F.col("text"), "[\n \t]"),
                 lambda t: t != "")).alias("tok")))
    return hll_registers(toks, "tok", n_nib)


def hll_shingle_sketch(docs: DataFrame,
                       n_nib: int = HLL_NIBBLES) -> DataFrame:
    """Distinct-shingle sketch: "how large is this corpus's 3-gram
    space" — the dedup-planning question (shingle cardinality drives
    minhash band tuning) answered without a COUNT(DISTINCT) shuffle
    of the full shingle stream: the 16^n_nib-row register table is
    the only reduced state, and per-shard sketches merge.  Items are
    the minhash shingler's k-grams (operators/dedup.shingles)."""
    from ..operators.dedup import shingles

    return hll_registers(shingles(docs).select("shingle"),
                         "shingle", n_nib)
