"""Mergeable sketches — deterministic HyperLogLog + count-min.

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
CM_DEPTH = 4     # count-min hash rows
CM_NIBBLES = 2   # 256 columns per row -> 1024 counters total
_HEX = "0123456789abcdef"


def _nibble_value(h_col: str, start: int, n_nib: int):
    """Integer value of ``n_nib`` hex nibbles of column ``h_col``
    starting at 1-based position ``start`` — the shared md5-hex
    arithmetic both engines reproduce byte-for-byte."""
    v = None
    for i in range(start, start + n_nib):
        nib = F.expr(f"instr('{_HEX}', substring({h_col}, {i}, 1)) - 1")
        v = nib if v is None else v * 16 + nib
    return v


def hll_registers(items: DataFrame, col: str,
                  n_nib: int = HLL_NIBBLES) -> DataFrame:
    """(register, max_rho): the HLL register table of ``items[col]``.

    Duplicate items are free (max is idempotent); NULL items are
    dropped.  Registers never hit by any item are absent (the
    estimator treats absent as 0).
    """
    h = F.md5(F.col(col).cast("string")).alias("_h")
    d = items.where(F.col(col).isNotNull()).select(h)
    reg = _nibble_value("_h", 1, n_nib)
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


def cm_registers(items: DataFrame, col: str, depth: int = CM_DEPTH,
                 n_nib: int = CM_NIBBLES) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan, J.Alg'05) of the
    ``items[col]`` stream as a (cm_row, cm_col, cnt) TABLE of at most
    depth * 16^n_nib rows.

    Each item lands in one column per hash row; the column is the
    first ``n_nib`` nibbles of the SALTED hash md5(row || ':' ||
    item), so the rows are independent hash functions derived from
    the same deterministic primitive the HLL/minhash oracles replay.
    Plan shape: a ``depth``-way explode (sequence, no shuffle) into
    ONE hash-aggregate with map-side combine — the only reduced state
    is the <=1024-row counter table, which per-shard sketches merge
    into by elementwise addition (:func:`cm_merge`).  NULL items are
    dropped; every item counts 1 (pre-weight upstream if needed).
    """
    d = items.where(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("_it"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("cm_row"))
    h = F.md5(F.concat(F.col("cm_row").cast("string"),
                       F.lit(":"), F.col("_it")))
    return (d.select(F.col("cm_row").cast("int"), h.alias("_h"))
            .select("cm_row",
                    _nibble_value("_h", 1, n_nib).cast("int").alias("cm_col"))
            .groupBy("cm_row", "cm_col")
            .agg(F.count(F.lit(1)).alias("cnt")))


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Union counters, sum per cell — sketch(A) merge sketch(B) ==
    sketch(A ++ B) exactly (sums are associative/commutative).  The
    shard-combine step: one tiny aggregate over <=1024-row tables."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.groupBy("cm_row", "cm_col")
            .agg(F.sum("cnt").cast("long").alias("cnt")))


def cm_lookup(sketch: DataFrame, probes: DataFrame, col: str,
              depth: int = CM_DEPTH,
              n_nib: int = CM_NIBBLES) -> DataFrame:
    """Point-query the sketch for every probe item: est_cnt =
    min over hash rows of the counter each salted hash hits (0 if a
    row's cell is absent).  Never underestimates the true count;
    overestimates only on column collisions (bounded by the classic
    eps = e/width guarantee at the default 4x256 geometry).

    The sketch side is <= depth * 16^n_nib rows by construction, so
    it is explicitly broadcast — probing N items is a map-side join +
    one (item) min-aggregate, no matter how large the probe set."""
    from pyspark.sql.functions import broadcast

    d = probes.where(F.col(col).isNotNull()).select(
        F.col(col).alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("cm_row"))
    h = F.md5(F.concat(F.col("cm_row").cast("string"), F.lit(":"),
                       F.col("item").cast("string")))
    keyed = d.select("item", F.col("cm_row").cast("int"),
                     h.alias("_h")).select(
        "item", "cm_row",
        _nibble_value("_h", 1, n_nib).cast("int").alias("cm_col"))
    return (keyed.join(broadcast(sketch), ["cm_row", "cm_col"], "left")
            .groupBy("item")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("long").alias("est_cnt")))


def cm_token_sketch(docs: DataFrame, depth: int = CM_DEPTH,
                    n_nib: int = CM_NIBBLES) -> DataFrame:
    """Token-frequency sketch of a corpus: the whitespace token
    stream (same split as the quality features) counted into a
    count-min table.  The 100 TB question this answers without a
    full token groupBy: "roughly how often does token X appear in
    shard/day Y" for ANY X chosen later, from <=1024 stored rows per
    shard."""
    toks = (docs.select(F.explode(
        F.filter(F.split(F.col("text"), "[\n \t]"),
                 lambda t: t != "")).alias("tok")))
    return cm_registers(toks, "tok", depth, n_nib)


def cm_token_estimates(docs: DataFrame, depth: int = CM_DEPTH,
                       n_nib: int = CM_NIBBLES) -> DataFrame:
    """Sketch-vs-truth audit row per distinct token: build the token
    sketch, point-query it for every distinct token, and join the
    true corpus count — (item, est_cnt, true_cnt) with est_cnt >=
    true_cnt guaranteed.  This is the accuracy-evidence query for the
    sketch (and, at scale, the audit you run on one shard before
    trusting merged sketches corpus-wide; the probe set is
    vocabulary-sized, and cm_lookup stays map-side however large it
    grows)."""
    toks = (docs.select(F.explode(
        F.filter(F.split(F.col("text"), "[\n \t]"),
                 lambda t: t != "")).alias("tok")))
    sketch = cm_registers(toks, "tok", depth, n_nib)
    probes = toks.select(F.col("tok").alias("item")).dropDuplicates()
    est = cm_lookup(sketch, probes, "item", depth, n_nib)
    true_cnt = (toks.groupBy(F.col("tok").alias("item"))
                .agg(F.count(F.lit(1)).cast("long").alias("true_cnt")))
    return est.join(true_cnt, "item")


BLOOM_K = 4      # salted probes per item
BLOOM_NIB = 5    # 16^5 = 1,048,576 bits -> <= 32,768 words of 32 bits
_BLOOM_BITS = 16 ** BLOOM_NIB
_WORD_BITS = 32  # bits per bigint word (<<31 max keeps shifts exact)


def bloom_words(items: DataFrame, col: str, k: int = BLOOM_K,
                n_nib: int = BLOOM_NIB) -> DataFrame:
    """Bloom filter (Bloom, CACM'70) of ``items[col]`` as a
    (word, bits) TABLE of at most 16^n_nib / 32 rows (<= 32,768
    BIGINTs = a 256 KB broadcast at the default geometry) — the third
    mergeable sketch of the family (HLL answers "how many distinct",
    count-min "how often", Bloom "have we seen THIS").

    Each item sets ``k`` bits; bit j lives at position
    nibble_value(md5(j || ':' || item), n_nib) — the same salted
    deterministic primitive as the count-min rows, so the DuckDB
    oracle replays it byte-for-byte.  The bit array is packed into
    32-bits-per-bigint words (shift <= 31 stays exact in BOTH
    engines' signed arithmetic); words no item hit are absent
    (lookups treat absent as all-zero).

    Plan shape: a k-way explode (sequence, no shuffle) into ONE
    (word) hash-aggregate with map-side ``bit_or`` combine — the only
    reduced state is the <=128-row word table.  At 100 TB this is
    the decontamination operating mode: keep one Bloom table per
    benchmark/eval set (tiny), broadcast it, and flag training-set
    n-grams map-side (:func:`bloom_lookup`) without ever shuffling
    the corpus against the eval corpus.  Duplicate items are free
    (bit_or is idempotent); NULL items are dropped.
    """
    d = items.where(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("_it"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("probe"))
    h = F.md5(F.concat(F.col("probe").cast("string"),
                       F.lit(":"), F.col("_it")))
    pos = _nibble_value("_h", 1, n_nib)
    return (d.select(h.alias("_h"))
            .select(pos.cast("int").alias("_pos"))
            .select((F.col("_pos") / _WORD_BITS).cast("int").alias("word"),
                    (F.col("_pos") % _WORD_BITS).cast("int").alias("_bit"))
            .groupBy("word")
            .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), _bit))")
                 .alias("bits")))


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Union words, bit_or per word — sketch(A) merge sketch(B) ==
    sketch(A union B) exactly (bit_or is associative/commutative/
    idempotent).  The shard-combine step over <=128-row tables."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("word").agg(
        F.expr("bit_or(bits)").alias("bits"))


def bloom_lookup(sketch: DataFrame, probes: DataFrame, col: str,
                 k: int = BLOOM_K, n_nib: int = BLOOM_NIB) -> DataFrame:
    """Membership test per probe row: maybe = 1 iff ALL k salted bits
    are set (min over probes of the tested bit).  NO false negatives
    ever; false positives at the classic (1 - e^{-kn/m})^k rate.

    The sketch is <=16^n_nib/32 rows by construction, so it is
    explicitly broadcast — probing N items is a map-side join + one
    (item) min-aggregate regardless of probe-set size."""
    from pyspark.sql.functions import broadcast

    d = probes.where(F.col(col).isNotNull()).select(
        F.col(col).alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("probe"))
    h = F.md5(F.concat(F.col("probe").cast("string"), F.lit(":"),
                       F.col("item").cast("string")))
    pos = _nibble_value("_h", 1, n_nib)
    keyed = (d.select("item", h.alias("_h"))
             .select("item", pos.cast("int").alias("_pos"))
             .select("item",
                     (F.col("_pos") / _WORD_BITS).cast("int").alias("word"),
                     (F.col("_pos") % _WORD_BITS).cast("int").alias("_bit")))
    hit = F.expr(
        "CAST((shiftright(CAST(COALESCE(bits, 0) AS BIGINT), _bit) & 1)"
        " AS INT)")
    return (keyed.join(broadcast(sketch), ["word"], "left")
            .groupBy("item")
            .agg(F.min(hit).cast("int").alias("maybe")))


def bloom_eval_sketch(docs: DataFrame, modulus: int = 17,
                      k: int = BLOOM_K,
                      n_nib: int = BLOOM_NIB) -> DataFrame:
    """The eval-set Bloom table: 3-gram shingles of the held-out
    docs (doc_id % modulus == 0 — the same deterministic hash-split
    convention as corpus_split) packed into a (word, bits) filter.
    This is the artifact a 100 TB decontamination pass stores and
    broadcasts."""
    from ..operators.dedup import shingles

    ev = docs.where(F.col("doc_id") % modulus == 0)
    return bloom_words(shingles(ev).select("shingle"), "shingle",
                       k, n_nib)


def bloom_decontaminate(docs: DataFrame, modulus: int = 17,
                        k: int = BLOOM_K,
                        n_nib: int = BLOOM_NIB) -> DataFrame:
    """Per-TRAINING-doc decontamination verdict against the eval-set
    Bloom filter, with the exact truth alongside as the audit
    column: (doc_id, n_shingles, n_flagged, n_true_hits, flagged).

    n_flagged >= n_true_hits ALWAYS (no false negatives); the gap is
    the false-positive cost of the 16^n_nib-bit geometry.  flagged =
    1 iff any shingle tests positive — the drop verdict a curation
    pipeline acts on.  The truth join exists for the audit/driver
    oracle and is a plain (shingle) equi-join — the eval shingle set
    is corpus-sized, so it is NOT broadcast; the production path is
    the Bloom side alone (map-side broadcast test, no eval-corpus
    shuffle)."""
    from ..operators.dedup import shingles

    sketch = bloom_eval_sketch(docs, modulus, k, n_nib)
    ev_sh = (shingles(docs.where(F.col("doc_id") % modulus == 0))
             .select("shingle").dropDuplicates()
             .withColumn("in_eval", F.lit(1)))
    train_sh = shingles(docs.where(F.col("doc_id") % modulus != 0))
    tested = bloom_lookup(sketch, train_sh.select("doc_id", "shingle"),
                          "shingle", k, n_nib)
    # bloom_lookup keys on the probe VALUE; re-join the doc ids so the
    # verdict aggregates per doc (distinct shingles per doc).
    per_sh = (train_sh
              .join(tested.withColumnRenamed("item", "shingle"), "shingle")
              .join(ev_sh, "shingle", "left"))
    return (per_sh.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shingles"),
                 F.sum("maybe").cast("long").alias("n_flagged"),
                 F.sum(F.coalesce(F.col("in_eval"), F.lit(0)))
                 .cast("long").alias("n_true_hits"),
                 F.max("maybe").cast("int").alias("flagged")))


HIST_WIDTH = 64  # default bucket width (chars) for length histograms


def hist_registers(items: DataFrame, col: str,
                   width: int = HIST_WIDTH) -> DataFrame:
    """Fixed-width histogram sketch of ``items[col]`` as a
    (bucket, cnt) TABLE — the distribution axis of the sketch family
    (HLL: distinct, count-min: frequency, Bloom: membership,
    histogram: quantiles).  bucket = value // width (floor division
    toward -inf for negatives is avoided by contract: callers feed
    non-negative measures), so the table is cross-engine exact,
    mergeable by union+sum, and <= max(value)/width rows however many
    items stream through.  NULLs dropped.

    Plan: one projection + one bucket hash-aggregate, map-side
    combinable — per-shard/day histograms merge instead of rescanning,
    and any quantile is answerable later from the merged table
    (:func:`hist_quantile`)."""
    d = items.where(F.col(col).isNotNull())
    return (d.select(F.expr(f"CAST(CAST({col} AS BIGINT) DIV {width}"
                            " AS BIGINT)").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Union buckets, sum per bucket — sketch(A) merge sketch(B) ==
    sketch(A ++ B) exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.groupBy("bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt")))


def hist_quantile(bucket_rows, q_pct: int, width: int = HIST_WIDTH) -> int:
    """Quantile estimate from a collected (bucket, cnt) table: the
    upper edge of the bucket holding the q-th percentile rank —
    integer, deterministic, error bounded by the bucket width.  Runs
    on the driver over the bounded table, never in the plan."""
    rows = sorted((int(r[0]), int(r[1])) for r in bucket_rows)
    total = sum(c for _, c in rows)
    target = (total * q_pct + 99) // 100  # ceil rank
    seen = 0
    for b, c in rows:
        seen += c
        if seen >= target:
            return (b + 1) * width - 1
    return (rows[-1][0] + 1) * width - 1 if rows else 0


def doclen_hist(docs: DataFrame, width: int = HIST_WIDTH) -> DataFrame:
    """Per-source doc-length histogram: (source, bucket, cnt) with
    bucket = n_chars // width — the grouped form of
    :func:`hist_registers` (same single aggregate, source added to
    the key).  The 100 TB question: "what does the length
    distribution of shard/source X look like" from a bounded table
    per source, merged across days without rescans; exact percentiles
    (source_stats) need a full sort-based aggregate per question,
    this answers EVERY quantile from one stored table."""
    return (docs.where(F.col("n_chars").isNotNull())
            .select("source",
                    F.expr(f"CAST(CAST(n_chars AS BIGINT) DIV {width}"
                           " AS BIGINT)").alias("bucket"))
            .groupBy("source", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def hll_day_registers(items: DataFrame, day_col: str,
                      item_col: str) -> DataFrame:
    """Per-day 16-register HLL sketch table (day, register, rho) of
    the ``items[item_col]`` stream — the shared state both the batch
    window merge (:func:`rolling_from_registers`) and the streaming
    twin (streaming/stream.incremental_entity_hll) maintain: the
    aggregate is a MAX, so it is streaming-legal, mergeable, and
    idempotent under replays."""
    h = F.md5(F.col(item_col).cast("string"))
    tail = "substring(_h, 2, 12)"
    z = F.expr(f"trim(LEADING '0' FROM {tail})")
    first = F.expr("instr('0123456789abcdef', "
                   f"substring(trim(LEADING '0' FROM {tail}), 1, 1)) - 1")
    zero_bits = (F.when(first >= 8, F.lit(0))
                 .when(first >= 4, F.lit(1))
                 .when(first >= 2, F.lit(2)).otherwise(F.lit(3)))
    rho = (F.when(F.length(z) == 0, F.lit(49))
           .otherwise((F.lit(12) - F.length(z)) * 4 + zero_bits + 1))
    return (items.select(F.col(day_col).cast("long").alias("day"),
                         h.alias("_h"))
            .select("day",
                    _nibble_value("_h", 1, 1).cast("int")
                    .alias("register"),
                    rho.cast("int").alias("rho"))
            .groupBy("day", "register")
            .agg(F.max("rho").cast("int").alias("rho")))


def rolling_from_registers(daily: DataFrame,
                           window: int = 3) -> DataFrame:
    """Window merge + clamped integer estimator over a per-day
    register table (day, register, rho) — the pure post-process half
    of :func:`rolling_hll_estimates`, shared with the streaming twin
    so stream and batch estimates agree bit-for-bit."""
    slots = (daily.select(
        F.explode(F.sequence(F.col("day"),
                             F.col("day") + F.lit(window - 1)))
        .alias("day_idx"), "day", "register", "rho"))
    days = daily.select(F.col("day").alias("day_idx")).dropDuplicates()
    merged = (slots.join(days, "day_idx", "semi")
              .groupBy("day_idx", "register")
              .agg(F.max("rho").alias("rho")))
    nd = (slots.join(days, "day_idx", "semi")
          .select("day_idx", "day").dropDuplicates()
          .groupBy("day_idx")
          .agg(F.count(F.lit(1)).cast("long").alias("n_days_merged")))
    term = F.expr("shiftleft(1, 20 - least(rho, 20))")
    est = (merged.groupBy("day_idx")
           .agg((F.lit(16 * (1 << 20))
                 - F.sum(F.lit(1 << 20) - term)).cast("long")
                .alias("s_x2p20")))
    return (est.join(nd, "day_idx")
            .select("day_idx", "n_days_merged", "s_x2p20",
                    F.floor(F.lit(673 * 256 * (1 << 20))
                            / F.col("s_x2p20")).cast("long")
                    .alias("est_milli")))


def rolling_hll_estimates(items: DataFrame, day_col: str,
                          item_col: str, window: int = 3) -> DataFrame:
    """Rolling distinct-count estimates from per-day HLL sketches —
    the dashboard read path a crawl pipeline serves ("distinct
    entities seen in the last N days") WITHOUT rescanning N days of
    raw data: keep one 16-register sketch per day, answer any
    window by register max-merge.

    Deterministic integer protocol matching graph_algos.hyperball_nf:
    register = first md5 nibble, rho = 1 + leading zero bits of the
    next 12 nibbles; estimate integers via the rho-clamp-at-20 /
    2^20-scale / alpha_16 = 673/1000 raw estimator.

    Output: (day_idx, n_days_merged, s_x2p20, est_milli) — one row
    per day present, merging the sketches of days [d - window + 1,
    d] that exist.

    Scale: per-day state is <= 16 rows; the window merge EXPLODES
    each day-register row into the <= ``window`` window slots it
    serves (a sequence explode, no shuffle) and re-aggregates — the
    sketch-union form of a sliding window, state days x 16 forever.
    Composition of :func:`hll_day_registers` (streaming-legal MAX
    aggregate) and :func:`rolling_from_registers` (pure
    post-process) — the streaming twin reuses both.
    """
    return rolling_from_registers(
        hll_day_registers(items, day_col, item_col), window)


# ---------------------------------------------------------------------------
# AMS F2 "tug-of-war" sketch (continuation batch 58)

AMS_ESTIMATORS = 16


def ams_f2_sketch(items: DataFrame, col: str,
                  n_est: int = AMS_ESTIMATORS) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy,
    STOC'96): F2 = sum over keys of count(key)^2 — the SELF-JOIN SIZE
    of the stream on ``col``, the statistic a join planner needs
    before picking a shuffle strategy.  Each estimator r draws a
    deterministic +/-1 sign per key (md5 first-nibble parity of
    ``ams:<r>:<key>``) and keeps Z_r = sum of signs over the stream;
    E[Z_r^2] = F2 exactly (4-wise-independent signs suffice; md5
    nibbles stand in deterministically, same device as the HLL/
    count-min family).

    Output: (est_id, z, z_sq) — n_est rows.

    Scale: all n_est signs are computed as COLUMNS of one projection
    (the stream is scanned ONCE, never replicated n_est-fold) and
    reduced by one map-side-combinable global aggregate; the sketch
    is mergeable (Z is a plain sum — union streams, add Zs).
    """
    h = F.col(col).cast("string")
    sums = []
    for r in range(n_est):
        nib = F.expr(
            f"instr('{_HEX}', substring(md5(concat('ams:{r}:', "
            f"CAST({col} AS STRING))), 1, 1)) - 1")
        sign = F.lit(1) - F.lit(2) * (nib % 2)
        sums.append(F.sum(sign).cast("long").alias(f"z_{r}"))
    wide = items.where(h.isNotNull()).agg(*sums)
    stack_args = ", ".join(f"{r}, z_{r}" for r in range(n_est))
    return (wide.selectExpr(
        f"stack({n_est}, {stack_args}) AS (est_id, z)")
        .select(F.col("est_id").cast("int").alias("est_id"),
                F.col("z").cast("long").alias("z"),
                (F.col("z") * F.col("z")).cast("long").alias("z_sq")))


def ams_f2_with_exact(items: DataFrame, col: str,
                      n_est: int = AMS_ESTIMATORS) -> DataFrame:
    """The AMS estimator table joined with the exact F2 (one grouped
    count + one sum of squares) so the sketch's accuracy is a COLUMN
    of the result, not a separate run.

    Output: (est_id, z, z_sq, exact_f2) — the mean of z_sq is the
    AMS estimate; exact_f2 is the ground truth (computable at fixture
    scale; at 100 TB one keeps only the n_est-row sketch).
    """
    sk = ams_f2_sketch(items, col, n_est)
    exact = (items.where(F.col(col).isNotNull())
             .groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("c"))
             .agg(F.sum(F.col("c") * F.col("c")).cast("long")
                  .alias("exact_f2")))
    # 1-row frame: stays fully lazy/distributed
    return sk.crossJoin(exact)


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta) distinct sketch
# (continuation batch 59)

KMV_K = 8
_KMV_POW60 = 1 << 60  # hash domain size: 15 md5 hex nibbles = 60 bits


def kmv_hash_col(col: str):
    """The shared KMV hash expression — 60-bit integer value of the
    first 15 md5 hex nibbles of ``'kmv:' + value`` — as a Column, so
    the batch sketch and its streaming twin hash identically."""
    return F.expr(
        f"CAST(conv(substring(md5(concat('kmv:', CAST({col} AS "
        f"STRING))), 1, 15), 16, 10) AS BIGINT)")


def kmv_hashes(items: DataFrame, grp_col: str, col: str) -> DataFrame:
    """Distinct (grp, hval) pairs where hval is the 60-bit integer
    value of the first 15 md5 hex nibbles of ``'kmv:' + value`` — the
    shared hash stream every KMV operation (sketch, merge, estimate)
    consumes.  60 bits fit a BIGINT exactly on both engines (DuckDB
    replays the same nibble arithmetic), so no floats anywhere."""
    h = kmv_hash_col(col)
    return (items.where(F.col(col).isNotNull())
            .select(F.col(grp_col).alias("grp"), h.alias("hval"))
            .dropDuplicates())


def kmv_sketch(items: DataFrame, grp_col: str, col: str,
               k: int = KMV_K) -> DataFrame:
    """Per-group KMV sketch: the k smallest DISTINCT 60-bit hash
    values of the group's value stream (Bar-Yossef et al., RANDOM'02;
    the theta-sketch bottom-k form).  Output (grp, rank, hval),
    rank 1..k ascending — <= k rows per group FOREVER, mergeable by
    union + re-rank (:func:`kmv_merge`).

    Scale: dedup is one hash-aggregate on (grp, hval); the bottom-k
    is a per-group window on the SAME key (co-partitioned, no second
    shuffle).  The sketch table is what ships between shards at
    100 TB — k rows per group, never the value stream."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("hval")
    return (kmv_hashes(items, grp_col, col)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("grp", "rank", F.col("hval").cast("long")))


def kmv_merge(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge two KMV sketch tables: bottom-k of the distinct union —
    exactly the sketch of the concatenated streams (the property the
    union test pins).  Same (grp, rank, hval) contract."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("hval")
    return (a.select("grp", "hval").union(b.select("grp", "hval"))
            .dropDuplicates()
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("grp", "rank", F.col("hval").cast("long")))


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch table:
    n_seen < k  -> the sketch IS the distinct set (estimate exact);
    n_seen == k -> floor((k-1) * 2^60 / kth_min) (the unbiased KMV
    estimator on the 60-bit hash domain).  (k-1) * 2^60 = 7 * 2^60
    < 2^63, so the whole estimator is exact BIGINT division — the
    DuckDB oracle reproduces it with `//`.

    Output (grp, n_seen, kth_hval, est_distinct)."""
    num = (k - 1) * _KMV_POW60
    return (sketch.groupBy("grp")
            .agg(F.count(F.lit(1)).cast("int").alias("n_seen"),
                 F.max("hval").cast("long").alias("kth_hval"))
            .select("grp", "n_seen", "kth_hval",
                    F.when(F.col("n_seen") < k,
                           F.col("n_seen").cast("long"))
                    .otherwise(F.expr(f"{num}L div kth_hval"))
                    .cast("long").alias("est_distinct")))


def kmv_with_exact(items: DataFrame, grp_col: str, col: str,
                   k: int = KMV_K) -> DataFrame:
    """KMV estimates joined with the exact per-group distinct count
    so accuracy is a COLUMN of the result (the ams_f2_with_exact
    pattern; at 100 TB one keeps only the k-row sketches).

    Output (grp, n_seen, kth_hval, est_distinct, exact_distinct)."""
    est = kmv_estimate(kmv_sketch(items, grp_col, col, k), k)
    exact = (items.where(F.col(col).isNotNull())
             .groupBy(F.col(grp_col).alias("grp"))
             .agg(F.countDistinct(col).cast("long")
                  .alias("exact_distinct")))
    return est.join(exact, "grp")


# ---------------------------------------------------------------------------
# Theta-sketch set operations on KMV sketches (continuation batch 60)

THETA_DOMAIN = _KMV_POW60  # 2^60; every 60-bit hval is strictly below


def _theta_scale(n: str, theta: str):
    """Exact ``floor(n * 2^60 / theta)`` with every intermediate
    strictly inside BIGINT: since ``2^60 % theta <= min(theta - 1,
    2^60 - theta) < 2^59`` for any theta in [1, 2^60], and the
    retained counts ``n`` are bounded by 2k = 16, both products stay
    below 2^63.  Split-division identity:
    ``floor(nD/t) = n * (D // t) + (n * (D % t)) // t``."""
    d = THETA_DOMAIN
    return F.expr(f"{n} * ({d}L div {theta}) "
                  f"+ ({n} * ({d}L % {theta})) div {theta}")


def theta_set_ops(items: DataFrame, grp_col: str, col: str,
                  k: int = KMV_K, top_n: int = 12) -> DataFrame:
    """Set-algebra on KMV/theta sketches (Dasgupta et al., the
    DataSketches theta form): for every pair of the ``top_n``
    largest-estimate groups, estimate |A intersect B|, |A union B| and
    Jaccard FROM THE k-ROW SKETCHES ALONE — the operating mode where
    per-source entity sets never co-locate and only sketches ship.

    theta_g = k-th smallest hash when the sketch is saturated, else
    the full domain 2^60 (the sketch IS the set, estimates exact).
    For a pair, theta = min(theta_a, theta_b); entries below theta
    are a uniform sample of the union at rate theta/2^60, so
    ``est = count * 2^60 // theta`` (overflow-proof split division,
    :func:`_theta_scale`; theta = 0 is impossible for k >= 2 because
    in-group hvals are distinct).  Everything is BIGINT — the DuckDB
    oracle replays it exactly.

    The exact intersection/union over the top groups ride along as
    audit columns (at 100 TB one keeps only the sketch estimates;
    pair fanout is bounded by top_n choose 2, and every joined frame
    is sketch-sized — k rows per group).

    Output per (grp_a < grp_b): (grp_a, grp_b, theta, n_inter_ret,
    n_union_ret, est_inter, est_union, est_jaccard_micro6,
    exact_inter, exact_union)."""
    sk = kmv_sketch(items, grp_col, col, k)
    top = (kmv_estimate(sk, k)
           .orderBy(F.desc("est_distinct"), "grp").limit(top_n)
           .select("grp",
                   F.when(F.col("n_seen") < k, F.lit(THETA_DOMAIN))
                   .otherwise(F.col("kth_hval")).cast("long")
                   .alias("theta")))
    pairs = (top.alias("a").join(top.alias("b"),
                                 F.col("a.grp") < F.col("b.grp"))
             .select(F.col("a.grp").alias("grp_a"),
                     F.col("b.grp").alias("grp_b"),
                     F.least("a.theta", "b.theta").alias("theta")))
    ents = sk.join(top.select("grp"), "grp").select("grp", "hval")
    ea = (pairs.join(ents.withColumnRenamed("grp", "grp_a"), "grp_a")
          .where(F.col("hval") < F.col("theta"))
          .select("grp_a", "grp_b", "hval"))
    eb = (pairs.join(ents.withColumnRenamed("grp", "grp_b"), "grp_b")
          .where(F.col("hval") < F.col("theta"))
          .select("grp_a", "grp_b", "hval"))
    n_u = (ea.union(eb).dropDuplicates()
           .groupBy("grp_a", "grp_b")
           .agg(F.count(F.lit(1)).cast("long").alias("n_union_ret")))
    n_i = (ea.join(eb, ["grp_a", "grp_b", "hval"])
           .groupBy("grp_a", "grp_b")
           .agg(F.count(F.lit(1)).cast("long").alias("n_inter_ret")))
    core = (pairs.join(n_u, ["grp_a", "grp_b"], "left")
            .join(n_i, ["grp_a", "grp_b"], "left")
            .na.fill(0, ["n_union_ret", "n_inter_ret"])
            .select("grp_a", "grp_b", "theta",
                    F.col("n_inter_ret").cast("long").alias("n_inter_ret"),
                    F.col("n_union_ret").cast("long").alias("n_union_ret"),
                    _theta_scale("n_inter_ret", "theta").cast("long")
                    .alias("est_inter"),
                    _theta_scale("n_union_ret", "theta").cast("long")
                    .alias("est_union"))
            .withColumn("est_jaccard_micro6",
                        F.when(F.col("est_union") > 0,
                               F.expr("est_inter * 1000000"
                                      " div est_union"))
                        .otherwise(F.lit(0)).cast("long")))
    # exact audit over the top groups only (fanout <= top_n per value)
    he = (items.where(F.col(col).isNotNull())
          .select(F.col(grp_col).alias("grp"), F.col(col).alias("val"))
          .dropDuplicates()
          .join(top.select("grp"), "grp"))
    sizes = he.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_ex"))
    xi = (he.alias("x").join(
            he.alias("y"),
            (F.col("x.val") == F.col("y.val"))
            & (F.col("x.grp") < F.col("y.grp")))
          .groupBy(F.col("x.grp").alias("grp_a"),
                   F.col("y.grp").alias("grp_b"))
          .agg(F.count(F.lit(1)).cast("long").alias("exact_inter")))
    return (core.join(xi, ["grp_a", "grp_b"], "left")
            .na.fill(0, ["exact_inter"])
            .join(sizes.select(F.col("grp").alias("grp_a"),
                               F.col("n_ex").alias("na")), "grp_a")
            .join(sizes.select(F.col("grp").alias("grp_b"),
                               F.col("n_ex").alias("nb")), "grp_b")
            .select("grp_a", "grp_b", "theta", "n_inter_ret",
                    "n_union_ret", "est_inter", "est_union",
                    "est_jaccard_micro6",
                    F.col("exact_inter").cast("long")
                    .alias("exact_inter"),
                    F.expr("CAST(na + nb - exact_inter AS BIGINT)")
                    .alias("exact_union")))


# ---------------------------------------------------------------------------
# V-optimal histogram construction (continuation batch 65)

VOPT_BUCKETS = 6
VOPT_SCHEMA = ("bucket int, lo_val long, hi_val long, n_items bigint, "
               "sse_micro6 bigint")


def _vopt_dp(pdf):
    """The V-optimal DP on the distinct-value synopsis: E[b][i] =
    min_j E[b-1][j-1] + SSE(j..i), all integers.  Per-bucket SSE is
    floored once to micro6 via the exact rational identity
    SSE·C = A·C − B² (A = Σc·v², B = Σc·v, C = Σc), so the objective
    is a sum of integers and the argmin (ties → smallest split j) is
    bit-stable and SQL-replayable."""
    import pandas as pd

    pdf = pdf.sort_values("val").reset_index(drop=True)
    vals = [int(v) for v in pdf.val]
    cnts = [int(c) for c in pdf.cnt]
    n_v = len(vals)
    n_b = min(int(pdf.n_buckets[0]), n_v)
    pc = [0] * (n_v + 1)
    ps = [0] * (n_v + 1)
    ps2 = [0] * (n_v + 1)
    for i, (v, c) in enumerate(zip(vals, cnts), start=1):
        pc[i] = pc[i - 1] + c
        ps[i] = ps[i - 1] + c * v
        ps2[i] = ps2[i - 1] + c * v * v

    def sse(j, i):
        a = ps2[i] - ps2[j - 1]
        b = ps[i] - ps[j - 1]
        c = pc[i] - pc[j - 1]
        return ((a * c - b * b) * 10**6) // c

    cost = [[None] * (n_v + 1) for _ in range(n_b + 1)]
    back = [[0] * (n_v + 1) for _ in range(n_b + 1)]
    cost[0][0] = 0
    for b in range(1, n_b + 1):
        for i in range(b, n_v + 1):
            best, bj = None, 0
            for j in range(b, i + 1):
                prev = cost[b - 1][j - 1]
                if prev is None:
                    continue
                c = prev + sse(j, i)
                if best is None or c < best:
                    best, bj = c, j
            cost[b][i] = best
            back[b][i] = bj
    out = []
    i = n_v
    for b in range(n_b, 0, -1):
        j = back[b][i]
        out.append((vals[j - 1], vals[i - 1],
                    pc[i] - pc[j - 1], sse(j, i)))
        i = j - 1
    out.reverse()
    return pd.DataFrame(
        [(k + 1, lo, hi, n, s)
         for k, (lo, hi, n, s) in enumerate(out)],
        columns=["bucket", "lo_val", "hi_val", "n_items",
                 "sse_micro6"])


def v_optimal_histogram(items: DataFrame, col: str,
                        n_buckets: int = VOPT_BUCKETS) -> DataFrame:
    """V-optimal histogram (Jagadish et al., VLDB'98): partition the
    value domain of ``items[col]`` into ``n_buckets`` contiguous
    buckets minimizing total within-bucket SSE — the synopsis a
    cost-based optimizer keeps per column, provably optimal among
    bucketizations (unlike equi-width/equi-depth).

    Scale split: the corpus is touched by ONE hash aggregate (value →
    count); the O(V²·B) DP runs on that distinct-value synopsis
    (V = |value domain|, bounded — e.g. token-length domains are a
    few hundred), inside a single applyInPandas group.  All DP
    arithmetic is exact integers (per-bucket SSE floored once to
    micro6), so the chosen boundaries replay bit-exactly in the
    DuckDB oracle's chained level CTEs.

    Output: (bucket 1..B ascending, lo_val, hi_val, n_items,
    sse_micro6)."""
    vals = (items.where(F.col(col).isNotNull())
            .groupBy(F.col(col).cast("long").alias("val"))
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .withColumn("n_buckets", F.lit(n_buckets))
            .withColumn("_g", F.lit(1)))
    return vals.groupBy("_g").applyInPandas(_vopt_dp, VOPT_SCHEMA)


def bloom_semi_join_stats(fact: DataFrame, fact_col: str,
                          dim: DataFrame, dim_col: str,
                          k: int = BLOOM_K,
                          n_nib: int = BLOOM_NIB) -> DataFrame:
    """Bloom semi-join reduction audit — the classic distributed-join
    optimization (Bloomjoin, Mackert & Lohman SIGMOD'86): build a
    Bloom filter of the dim keys, test every fact key against it
    map-side, and drop non-passing fact rows BEFORE the join
    shuffle.  This operator measures exactly what that buys and
    proves it is safe on this workload.

    Output: ONE row (n_fact, n_fact_keys, n_dim_keys, pass_keys,
    pass_rows, true_keys, true_rows, fp_keys, false_neg_keys,
    reduction_micro6).  ``false_neg_keys`` is the safety audit and
    is 0 by Bloom construction (a joining key can never fail the
    filter); ``reduction_micro6`` = fraction of fact ROWS the
    pre-filter keeps off the join shuffle, floor-scaled.

    Scale: the fact table is touched by ONE hash aggregate (per-key
    counts); the Bloom table (<=32,768 words) and the dim key set
    join against that bounded key-count table, never against raw
    fact rows.  At 100 TB the production form is bloom_lookup
    fused map-side before the shuffle; this audit quantifies the
    shuffle-row savings that form achieves."""
    keys = (fact.where(F.col(fact_col).isNotNull())
            .groupBy(F.col(fact_col).cast("string").alias("item"))
            .agg(F.count(F.lit(1)).cast("long").alias("c")))
    dkeys = (dim.where(F.col(dim_col).isNotNull())
             .select(F.col(dim_col).cast("string").alias("item"))
             .dropDuplicates())
    sk = bloom_words(dkeys, "item", k, n_nib)
    verdicts = bloom_lookup(sk, keys.select("item"), "item", k, n_nib)
    audited = (keys.join(verdicts, "item")
               .join(dkeys.select("item", F.lit(1).alias("_in")),
                     "item", "left")
               .select("item", "c", "maybe",
                       F.coalesce("_in", F.lit(0)).alias("is_true")))
    n_dim = dkeys.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (audited.agg(
        F.sum("c").cast("long").alias("n_fact"),
        F.count(F.lit(1)).cast("long").alias("n_fact_keys"),
        F.sum("maybe").cast("long").alias("pass_keys"),
        F.sum(F.col("c") * F.col("maybe")).cast("long")
        .alias("pass_rows"),
        F.sum("is_true").cast("long").alias("true_keys"),
        F.sum(F.col("c") * F.col("is_true")).cast("long")
        .alias("true_rows"),
        F.sum(F.col("is_true") * (1 - F.col("maybe"))).cast("long")
        .alias("false_neg_keys"))
        .crossJoin(n_dim.select(F.col("n").alias("n_dim_keys")))
        .select("n_fact", "n_fact_keys", "n_dim_keys", "pass_keys",
                "pass_rows", "true_keys", "true_rows",
                (F.col("pass_keys") - F.col("true_keys")).cast("long")
                .alias("fp_keys"),
                "false_neg_keys",
                F.expr("CAST((n_fact - pass_rows) * 1000000"
                       " DIV n_fact AS BIGINT)")
                .alias("reduction_micro6")))


CS_DEPTH = 5     # odd, so the median is a single middle element
CS_NIBBLES = 2   # 16^2 = 256 columns per hash row


def count_sketch_estimates(docs: DataFrame, depth: int = CS_DEPTH,
                           n_nib: int = CS_NIBBLES) -> DataFrame:
    """Count-sketch (Charikar-Chen-Farach-Colton '02) vs truth audit
    per distinct token — the SIGNED cousin of the count-min table:
    each item adds sign(row, item) * count to its cell, so colliding
    items cancel in expectation and the point estimate sign * cell is
    UNBIASED (count-min only ever overestimates); the median across
    the ``depth`` hash rows tames the variance.  depth is odd, so the
    median is one exact middle element — no averaging, no floats.

    Column and sign both derive from the salted md5(row ':' item)
    primitive the CM/HLL/minhash oracles replay: column = first
    ``n_nib`` nibbles, sign = parity of the next nibble.

    Output: (item, true_cnt, est_cnt, abs_err) — est_cnt may sit on
    either side of truth (the unbiasedness signature; a count-min
    audit row never shows est < true).

    Scale shape: ONE corpus hash-aggregate to the vocab count table;
    the sketch build and every probe run over that bounded table
    (depth-way explode, no extra corpus pass), and the counter table
    (<= depth * 16^n_nib rows) is broadcast for probing.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    toks = (docs.select(F.explode(
        F.filter(F.split(F.col("text"), "[\n \t]"),
                 lambda t: t != "")).alias("tok")))
    vocab = (toks.groupBy(F.col("tok").alias("item"))
             .agg(F.count(F.lit(1)).cast("long").alias("true_cnt")))
    d = vocab.select(
        "item", "true_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
        .alias("cs_row"))
    h = F.md5(F.concat(F.col("cs_row").cast("string"), F.lit(":"),
                       F.col("item")))
    keyed = (d.withColumn("_h", h)
             .select("item", "true_cnt", "cs_row",
                     _nibble_value("_h", 1, n_nib).cast("int")
                     .alias("cs_col"),
                     (1 - 2 * (_nibble_value("_h", n_nib + 1, 1)
                               % 2)).cast("long").alias("sign")))
    sketch = (keyed.groupBy("cs_row", "cs_col")
              .agg(F.sum(F.col("sign") * F.col("true_cnt"))
                   .cast("long").alias("cell")))
    probed = (keyed.join(broadcast(sketch), ["cs_row", "cs_col"])
              .select("item", "true_cnt",
                      (F.col("sign") * F.col("cell")).alias("_est")))
    w = Window.partitionBy("item").orderBy("_est")
    med = (probed.withColumn("_rn", F.row_number().over(w))
           .where(F.col("_rn") == (depth + 1) // 2))
    return med.select(
        "item", "true_cnt", F.col("_est").cast("long").alias("est_cnt"),
        F.abs(F.col("_est") - F.col("true_cnt")).cast("long")
        .alias("abs_err"))


def hash_uniformity(docs: DataFrame, n_nib: int = 2) -> DataFrame:
    """Uniformity audit of the md5-nibble hash device every bucketed
    component in this engine trusts (LSH bands, CM/count-sketch
    columns, Bloom positions, salts, splits): bucket the corpus's
    doc_ids into 16^n_nib cells by the first nibbles of md5(doc_id)
    and report occupancy skew plus the exact chi-square numerator
    against uniform — chi2_num = sum_b (B*O_b - N)^2 with B buckets
    and N items (chi2 = chi2_num / (B*N); emitted unscaled so it
    stays integral).  A healthy hash reads max/min near N/B and
    chi2_num near B*N*(B-1) in expectation.

    Output: one row (n_buckets, n_items, occupied, max_bucket,
    min_bucket, chi2_num).

    Scale shape: one hash aggregate to the bounded bucket table,
    a zero-fill against the literal bucket spine, one reduce.
    """
    from pyspark.sql import Window

    b = 16 ** n_nib
    occ = (docs.select(
        F.md5(F.col("doc_id").cast("string")).alias("_h"))
        .select(_nibble_value("_h", 1, n_nib).cast("int")
                .alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c")))
    spine = docs.sparkSession.range(b).select(
        F.col("id").cast("int").alias("bucket"))
    full = (spine.join(occ, "bucket", "left").na.fill(0, ["c"])
            .withColumn("_n", F.sum("c").over(
                Window.rowsBetween(Window.unboundedPreceding,
                                   Window.unboundedFollowing))))
    return (full.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.max("_n").cast("long").alias("n_items"),
        F.sum((F.col("c") > 0).cast("int")).cast("long")
        .alias("occupied"),
        F.max("c").cast("long").alias("max_bucket"),
        F.min("c").cast("long").alias("min_bucket"),
        F.sum((F.lit(b) * F.col("c") - F.col("_n"))
              * (F.lit(b) * F.col("c") - F.col("_n")))
        .cast("long").alias("chi2_num")))


def hash_collisions(docs: DataFrame, widths=(8, 12, 16)) -> DataFrame:
    """Birthday-collision audit of truncated token hashes — the
    sizing read for every fingerprint table here (simhash bands,
    minhash buckets, bloom slots): when the vocabulary is hashed
    into 2^w buckets, how many DISTINCT tokens actually collide, and
    how many colliding pairs does that create?

    The bucket is the first w bits of md5(token) (hex-nibble
    arithmetic, the corpus-wide device), keys are distinct lowercase
    tokens.  Per width: n_keys, n_buckets_used, n_colliding_keys
    (keys sharing a bucket with another key), n_collision_pairs
    (sum over buckets of C(c,2)), and keys_per_bucket_micro6.
    All integers.

    Scale shape: one distinct-token aggregate, a per-width literal
    explode, one (width, bucket) hash aggregate, one bounded
    roll-up.
    """
    vocab = (docs.select(
        F.explode(F.split(F.col("text"), "[\n \t]")).alias("tok"))
        .where(F.col("tok") != "")
        .select(F.lower("tok").alias("tok")).dropDuplicates())
    hashed = vocab.select(
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10)
        .cast("long").alias("_h16"))
    fan = hashed.select(
        "_h16",
        F.explode(F.array(*[F.lit(w) for w in widths])).alias("w"))
    bucketed = fan.select(
        "w", F.expr("_h16 div (65536 div shiftleft(1, w))")
        .alias("_b"))
    cells = (bucketed.groupBy("w", "_b")
             .agg(F.count(F.lit(1)).alias("_c")))
    return (cells.groupBy("w").agg(
        F.sum("_c").cast("long").alias("n_keys"),
        F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
        F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0))
        .cast("long").alias("n_colliding_keys"),
        F.expr("sum((_c * (_c - 1)) div 2)").cast("long")
        .alias("n_collision_pairs"))
        .select(F.col("w").cast("int").alias("width"), "n_keys",
                "n_buckets_used", "n_colliding_keys",
                "n_collision_pairs",
                F.expr("(1000000 * n_keys) div n_buckets_used")
                .cast("long").alias("keys_per_bucket_micro6")))
