"""Windowed aggregation over the events table (batch form of the
streaming rollup in streaming/stream.py — same grouping logic, so the
batch oracle also validates the foreachBatch path).

Float note: sums are emitted at cent precision (floor(sum * 100));
min/max are raw parquet values (no arithmetic), exact in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    time since the previous event exceeds the gap.  Classic running-sum
    island detection — one shuffle on user_id.

    Output: (user_id, session_id, n_events, first_ts, last_ts,
    duration_sec) with session_id = 0-based per user.
    """
    # ANSI mode forbids timestamp->long casts; integer-exact epoch
    # seconds via unix_micros (identical truncation to DuckDB's
    # epoch_us // 1e6)
    secs = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    events = events.withColumn("_sec", secs)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("_sec").over(w)
    new_sess = gap.isNull() | (F.col("_sec") - gap > gap_minutes * 60)
    sess = (events
            .withColumn("_new", new_sess.cast("int"))
            .withColumn("session_id",
                        (F.sum("_new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
                        .cast("int")))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
                 F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
                 (F.max("_sec") - F.min("_sec")).cast("long").alias("duration_sec")))


def asof_attribution(events: DataFrame,
                     left_type: str = "purchase",
                     right_type: str = "click") -> DataFrame:
    """As-of join: each ``left_type`` event attributed to the most
    recent ``right_type`` event of the same user at-or-before it
    (classic last-touch attribution).

    Physical plan: NOT a range join (which explodes at scale) — the
    union-tag + running ``last(..., ignorenulls)`` window formulation:
    one shuffle on user_id, one sort, linear scan.  Tie-break on equal
    timestamps is (ts, event_id) ascending, so results are exact and
    partition-count-independent.

    Output: (purchase_id, user_id, purchase_us, click_id, click_us,
    lag_us) — microsecond epochs as integers; NULL click columns when
    no prior right-side event exists.
    """
    # parquet ts is TIMESTAMP_NTZ; same cast idiom as sessionize —
    # integer-exact micros matching DuckDB's epoch_us
    ev = (events.where(F.col("event_type").isin(left_type, right_type))
          .select("event_id", "user_id", "ts", "event_type",
                  F.expr("unix_micros(cast(ts as timestamp))").alias("_us")))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    right_id = F.when(F.col("event_type") == right_type, F.col("event_id"))
    right_us = F.when(F.col("event_type") == right_type, F.col("_us"))
    return (ev
            .withColumn("click_id",
                        F.last(right_id, ignorenulls=True).over(w))
            .withColumn("click_us",
                        F.last(right_us, ignorenulls=True).over(w))
            .where(F.col("event_type") == left_type)
            .select(F.col("event_id").alias("purchase_id"), "user_id",
                    F.col("_us").alias("purchase_us"),
                    "click_id", "click_us",
                    (F.col("_us") - F.col("click_us")).alias("lag_us")))


def session_funnel(events: DataFrame, gap_minutes: int = 30,
                   first_step: str = "click",
                   second_step: str = "purchase") -> DataFrame:
    """Two-step in-session funnel: of all sessions, how many contain a
    ``first_step`` event, and how many of those convert (a
    ``second_step`` event strictly LATER in the session).  Ordering is
    by within-session event position (row_number over (ts, event_id))
    so both engines compare identical small integers — no
    timestamp-tiebreak encoding tricks.
    Output: one row (n_sessions, n_with_first, n_converted,
    conv_pct_x10000)."""
    secs = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    ev = events.withColumn("_sec", secs)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("_sec").over(w)
    new_sess = (gap.isNull()
                | (F.col("_sec") - gap > gap_minutes * 60)).cast("int")
    ev = ev.withColumn("session_id", (F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast("int"))
    pos_w = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id")
    ev = ev.withColumn("_pos", F.row_number().over(pos_w))
    per = (ev.groupBy("user_id", "session_id")
           .agg(F.min(F.when(F.col("event_type") == first_step,
                             F.col("_pos"))).alias("first_pos"),
                F.max(F.when(F.col("event_type") == second_step,
                             F.col("_pos"))).alias("second_pos")))
    conv = (F.col("first_pos").isNotNull()
            & F.col("second_pos").isNotNull()
            & (F.col("first_pos") < F.col("second_pos"))).cast("long")
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.count("first_pos").cast("long").alias("n_with_first"),
        F.sum(conv).cast("long").alias("n_converted"))
    return agg.withColumn(
        "conv_pct_x10000",
        F.when(F.col("n_with_first") > 0,
               F.expr("(n_converted * 10000) div n_with_first"))
        .otherwise(F.lit(0)).cast("long"))


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-active day, counted on
    each later active day — (cohort_day, day_offset, n_users).  Two
    keyed aggregations + one join on user_id (the natural partitioning
    for per-user state at scale); days as exact integer epoch days
    (ts is TIMESTAMP_NTZ, session tz UTC — unix_micros matches DuckDB
    epoch_us)."""
    day = F.expr(
        "unix_micros(cast(ts as timestamp)) div 86400000000").cast("int")
    d = events.select("user_id", day.alias("day"))
    cohort = d.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = d.dropDuplicates(["user_id", "day"])
    return (active.join(cohort, "user_id")
            .groupBy("cohort_day",
                     (F.col("day") - F.col("cohort_day"))
                     .cast("int").alias("day_offset"))
            .agg(F.count_distinct("user_id").cast("long").alias("n_users")))


def hourly_rollup(events: DataFrame) -> DataFrame:
    win = F.date_trunc("hour", F.col("ts"))
    return (events.groupBy(
                F.date_format(win, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.floor(F.sum("value") * 100).cast("long").alias("sum_value_x100"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value")))


# ---------------------------------------------------------------------------
# Kleinberg burst detection (continuation batch 63)

BURST_SCHEMA = ("event_type string, day_idx int, n_events bigint, "
                "n_total bigint, in_burst int, total_cost_micro6 bigint")


def _burst_viterbi(pdf):
    """Per-type 2-state Viterbi over the day series — PURE integer
    arithmetic on the pre-floored micro6 log-rates, so the decode is
    bit-exact regardless of partitioning and replayable in SQL.
    Ties prefer the base state (0) everywhere."""
    import pandas as pd

    pdf = pdf.sort_values("day_idx").reset_index(drop=True)
    lnp0, ln1p0 = int(pdf.lnp0[0]), int(pdf.ln1p0[0])
    lnp1, ln1p1 = int(pdf.lnp1[0]), int(pdf.ln1p1[0])
    trans = int(pdf.trans[0])
    rs = [int(x) for x in pdf.r]
    ds = [int(x) for x in pdf.d]
    c0 = c1 = 0
    back: list[tuple[int, int]] = []
    for i, (r, d) in enumerate(zip(rs, ds)):
        e0 = -(r * lnp0 + (d - r) * ln1p0)
        e1 = -(r * lnp1 + (d - r) * ln1p1)
        if i == 0:
            n0, n1, b0, b1 = e0, e1 + trans, -1, -1
        else:
            b0 = 0 if c0 <= c1 else 1
            n0 = e0 + min(c0, c1)
            b1 = 0 if c0 + trans <= c1 else 1
            n1 = e1 + min(c0 + trans, c1)
        back.append((b0, b1))
        c0, c1 = n0, n1
    state = 0 if c0 <= c1 else 1
    total = min(c0, c1)
    states = [0] * len(rs)
    for i in range(len(rs) - 1, -1, -1):
        states[i] = state
        if i > 0:
            state = back[i][state]
    return pd.DataFrame({
        "event_type": pdf.etype, "day_idx": pdf.day_idx,
        "n_events": rs, "n_total": ds, "in_burst": states,
        "total_cost_micro6": total})


def kleinberg_bursts(events: DataFrame) -> DataFrame:
    """Kleinberg burst detection (KDD'02), the batched two-state
    form: per event type, label each crawl day as base-rate (0) or
    burst (1) by a minimum-cost state sequence — day t costs
    ``-(r ln p_q + (d-r) ln(1-p_q))`` in state q plus one transition
    charge ``ln(T)`` for entering the burst state.

    Rates are Laplace-smoothed integer ratios: p0 = (R+1)/(D+2)
    (type share of the whole stream) and p1 = 2·p0 capped at the
    midpoint to 1, so both are always in (0, 1) with no guards.  The
    four log-rates and the transition charge are the repo's
    single-ln device (integer ratio, ONE double division, ONE ln,
    floor-scale 1e6 — identical in DuckDB), computed as COLUMNS in
    the engine; the Viterbi decode itself is pure integer arithmetic
    in one applyInPandas per type, so the whole operator is bit-exact
    cross-engine (oracle = forward/backward recursive CTEs).

    Output: (event_type, day_idx, n_events, n_total, in_burst,
    total_cost_micro6).

    Scale: the grid is (type vocabulary x day spine) — both bounded
    dimensions, the crossJoin never touches the event stream — and
    the DP state is O(1) per step; at 100 TB one shards the series
    (per type x bounded window) exactly like this fixture's 30-day
    month."""
    day = events.select(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
        .cast("int").alias("day_idx"),
        F.col("event_type").alias("etype"))
    spine = day.groupBy("day_idx").agg(
        F.count(F.lit(1)).cast("long").alias("d"))
    types = day.select("etype").dropDuplicates()
    sparse = day.groupBy("etype", "day_idx").agg(
        F.count(F.lit(1)).cast("long").alias("r"))
    grid = (types.crossJoin(spine)
            .join(sparse, ["etype", "day_idx"], "left")
            .na.fill(0, ["r"]))
    tot = grid.groupBy("etype").agg(
        F.sum("r").cast("long").alias("bigr"),
        F.count(F.lit(1)).cast("long").alias("t_len"))
    grand = spine.agg(F.sum("d").cast("long").alias("bigd"))

    def _ln(num, den):
        return (F.floor(F.log(num.cast("double") / den.cast("double"))
                        * F.lit(1000000)).cast("long"))

    r1, d2 = F.col("bigr") + 1, F.col("bigd") + 2
    sat = (2 * r1) < d2  # burst rate 2*p0, midpoint-capped below 1
    p1n = F.when(sat, 2 * r1).otherwise(r1 + d2)
    p1d = F.when(sat, d2).otherwise(2 * d2)
    scalars = (tot.crossJoin(grand).select(
        "etype",
        _ln(r1, d2).alias("lnp0"),
        _ln(d2 - r1, d2).alias("ln1p0"),
        _ln(p1n, p1d).alias("lnp1"),
        _ln(p1d - p1n, p1d).alias("ln1p1"),
        F.floor(F.log(F.col("t_len").cast("double"))
                * F.lit(1000000)).cast("long").alias("trans")))
    ready = grid.join(scalars, "etype")
    return ready.groupBy("etype").applyInPandas(
        _burst_viterbi, BURST_SCHEMA)


# ---------------------------------------------------------------------------
# Session sequential patterns (continuation batch 66)


def session_trigrams(events: DataFrame,
                     gap_minutes: int = 30) -> DataFrame:
    """Behavioral pattern mining: CONSECUTIVE length-3 event-type
    sequences within a session, with occurrence and session support.
    The deliberately bounded form of sequential-pattern mining — an
    arbitrary-gap subsequence miner (PrefixSpan-style) fans out
    C(session_len, 3) candidates per session and dies on long
    sessions; consecutive trigrams are one lead() window — LINEAR in
    the event stream, one user_id shuffle shared with sessionize.

    Output per (t1, t2, t3): n_occurrences, n_sessions (distinct
    sessions containing it), support_micro6 = n_sessions * 1e6 //
    total sessions (the 1-row total attaches lazily, trending_
    entities-class scalar).  Session boundaries are sessionize's
    (same gap, same (ts, event_id) ordering)."""
    secs = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    ev = events.withColumn("_sec", secs)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("_sec").over(w)
    new_sess = gap.isNull() | (F.col("_sec") - gap > gap_minutes * 60)
    ev = (ev.withColumn("_new", new_sess.cast("int"))
          .withColumn("session_id",
                      (F.sum("_new").over(
                          w.rowsBetween(Window.unboundedPreceding, 0))
                       - 1).cast("int")))
    ws = Window.partitionBy("user_id", "session_id") \
        .orderBy("ts", "event_id")
    tri = (ev.select("user_id", "session_id",
                     F.col("event_type").alias("t1"),
                     F.lead("event_type", 1).over(ws).alias("t2"),
                     F.lead("event_type", 2).over(ws).alias("t3"))
           .where(F.col("t3").isNotNull()))
    counts = (tri.groupBy("t1", "t2", "t3")
              .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"),
                   F.countDistinct("user_id", "session_id").cast("long")
                   .alias("n_sessions")))
    total = (ev.select("user_id", "session_id").dropDuplicates()
             .agg(F.count(F.lit(1)).cast("long").alias("_tot")))
    return (counts.crossJoin(total)
            .select("t1", "t2", "t3", "n_occurrences", "n_sessions",
                    F.expr("CAST(n_sessions * 1000000 DIV _tot"
                           " AS BIGINT)").alias("support_micro6")))


def cusum_drift(events: DataFrame, k_den: int = 4, h_num: int = 3,
                h_add: int = 5) -> DataFrame:
    """One-sided CUSUM drift detection (Page '54) per event type over
    the crawl-day spine: the sequential-change statistic
    S_t = max(0, S_{t-1} + (r_t - mu - k)) with allowance
    k = max(1, mu DIV k_den) and alarm threshold h = h_num*mu +
    h_add.  Where Kleinberg labels sustained bursts by global
    minimum cost, CUSUM is the ONLINE drift alarm — it fires as soon
    as cumulative excess crosses h and resets when the excess
    drains.

    The recurrence is computed by its prefix-sum closed form
    S_t = P_t - min(0, min_{j<=t} P_j) with P the running sum of
    (r - mu - k) — two cumulative windows per type, NO recursion,
    which is what makes it both shuffle-cheap and expressible as
    plain window SQL in the oracle.  All quantities are exact
    integers.

    Output: (etype, day_idx, r, mu, cusum, alarm).

    Scale: the dense grid is (type vocabulary x day spine) — bounded
    dims, the crossJoin never touches the event stream (the
    kleinberg_bursts device); windows partition by type, never
    global."""
    day = events.select(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
        .cast("int").alias("day_idx"),
        F.col("event_type").alias("etype"))
    spine = day.select("day_idx").dropDuplicates()
    types = day.select("etype").dropDuplicates()
    sparse = day.groupBy("etype", "day_idx").agg(
        F.count(F.lit(1)).cast("long").alias("r"))
    grid = (types.crossJoin(spine)
            .join(sparse, ["etype", "day_idx"], "left")
            .na.fill(0, ["r"]))
    mu = grid.groupBy("etype").agg(
        F.expr("CAST(sum(r) DIV count(*) AS BIGINT)").alias("mu"))
    g = (grid.join(mu, "etype")
         .withColumn("_dev",
                     F.col("r") - F.col("mu")
                     - F.greatest(F.lit(1),
                                  F.expr(f"mu DIV {k_den}"))))
    w = (Window.partitionBy("etype").orderBy("day_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    g = (g.withColumn("_p", F.sum("_dev").over(w))
         .withColumn("_minp", F.min("_p").over(w)))
    return g.select(
        "etype", "day_idx", "r", "mu",
        (F.col("_p") - F.least(F.lit(0), F.col("_minp")))
        .cast("long").alias("cusum"),
        ((F.col("_p") - F.least(F.lit(0), F.col("_minp")))
         > F.col("mu") * h_num + h_add).cast("int").alias("alarm"))


def _day_grid(events: DataFrame) -> DataFrame:
    """(etype, day_idx, r): daily event counts per type over the
    SHARED crawl-day spine, zero-filled — the dense series every
    per-type time-series statistic in this module runs on.  The
    types x spine cross join is bounded by two tiny dimensions
    (distinct event types x distinct days), never corpus-sized."""
    day = events.select(
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
        .cast("int").alias("day_idx"),
        F.col("event_type").alias("etype"))
    spine = day.select("day_idx").dropDuplicates()
    types = day.select("etype").dropDuplicates()
    sparse = day.groupBy("etype", "day_idx").agg(
        F.count(F.lit(1)).cast("long").alias("r"))
    return (types.crossJoin(spine)
            .join(sparse, ["etype", "day_idx"], "left")
            .na.fill(0, ["r"]))


def pettitt_change(events: DataFrame) -> DataFrame:
    """Pettitt change-point test per event type: localize WHERE a
    level shift happened (the complement of the CUSUM alarm, which
    only says THAT drift occurred).  U_t = sum over pairs (i<=t<j)
    of sign(r_j - r_i); the change point is the earliest day whose
    |U_t| attains K = max_{t<T} |U_t|.  Exact integers throughout —
    no ranks-to-float conversion, so cross-engine bit-exact.

    The O(T^2) pair sum is collapsed to one rank pass via the
    recurrence U_t - U_{t-1} = sum_j sign(r_j - r_t) = #greater -
    #less = T - 2*(rank_t - 1) - #ties_t, so the whole test is two
    window passes over the (types x days) grid — T is the day-spine
    length, bounded by the crawl window, never data volume.

    Output: one row per (etype, day) with the U_t curve plus the
    per-type verdict columns (k_stat, change_day); sign of U at the
    change day says shift direction (positive = later days ran
    lower).  Types need n_days >= 2 (U_T is identically 0).
    """
    from pyspark.sql import Window

    grid = _day_grid(events)
    wt = Window.partitionBy("etype")
    wrank = Window.partitionBy("etype").orderBy("r")
    weq = Window.partitionBy("etype", "r")
    wcum = (Window.partitionBy("etype").orderBy("day_idx")
            .rowsBetween(Window.unboundedPreceding,
                         Window.currentRow))
    v = (grid
         .withColumn("_nd", F.count(F.lit(1)).over(wt))
         .withColumn(
             "_v", (F.col("_nd")
                    - 2 * (F.rank().over(wrank) - F.lit(1))
                    - F.count(F.lit(1)).over(weq)).cast("long"))
         .withColumn("u_t", F.sum("_v").over(wcum).cast("long"))
         .withColumn("_pos",
                     F.row_number().over(
                         Window.partitionBy("etype")
                         .orderBy("day_idx"))))
    k = (v.withColumn(
            "k_stat",
            F.max(F.when(F.col("_pos") < F.col("_nd"),
                         F.abs(F.col("u_t")))).over(wt)
            .cast("long")))
    return (k.withColumn(
                "change_day",
                F.min(F.when((F.col("_pos") < F.col("_nd"))
                             & (F.abs(F.col("u_t"))
                                == F.col("k_stat")),
                             F.col("day_idx"))).over(wt))
            .where(F.col("_nd") >= 2)
            .select("etype", "day_idx", "r", "u_t",
                    F.col("_nd").cast("long").alias("n_days"),
                    "k_stat", "change_day"))


def theil_sen_trend(events: DataFrame) -> DataFrame:
    """Theil-Sen robust trend per event type over the crawl-day
    spine: the MEDIAN of all pairwise slopes (r_j - r_i)/(j - i) —
    the estimator that shrugs off the outlier days that wreck a
    least-squares fit (up to ~29% contamination).

    Slopes are micro6 integers by TRUNCATING division toward zero —
    measured behavior of BOTH engines on negative numerators
    (Spark DIV and DuckDB // both give -7/2 = -3), so the raw
    integer division is already cross-engine exact; the median is
    the lower nearest-rank over (slope, i, j) order.  Fully
    deterministic.

    Output: (etype, n_days, n_pairs, slope_micro6).

    Scale: the pair self-join runs on the (type x day-spine) grid —
    both bounded dimensions (a trend window is days-to-months, never
    corpus-sized), so the quadratic is T(T-1)/2 over T = spine
    length, keyed by etype."""
    from pyspark.sql import Window

    grid = _day_grid(events)
    a = grid.select("etype", F.col("day_idx").alias("i"),
                    F.col("r").alias("ri"))
    b = grid.select("etype", F.col("day_idx").alias("j"),
                    F.col("r").alias("rj"))
    pairs = (a.join(b, "etype").where(F.col("j") > F.col("i"))
             .withColumn(
                 "_num", (F.col("rj") - F.col("ri")) * 1000000)
             .withColumn("_den", F.col("j") - F.col("i"))
             .withColumn(
                 "slope", F.expr("_num DIV _den").cast("long")))
    w = Window.partitionBy("etype").orderBy("slope", "i", "j")
    wc = Window.partitionBy("etype")
    ranked = (pairs.withColumn("_rk", F.row_number().over(w) - 1)
              .withColumn("_n", F.count(F.lit(1)).over(wc)))
    return (ranked
            .where(F.col("_rk") == F.expr("(_n - 1) DIV 2"))
            .join(grid.groupBy("etype")
                  .agg(F.count(F.lit(1)).cast("long")
                       .alias("n_days")), "etype")
            .select("etype", "n_days",
                    F.col("_n").cast("long").alias("n_pairs"),
                    F.col("slope").alias("slope_micro6")))


def interarrival_stats(events: DataFrame) -> DataFrame:
    """Per-event-type inter-arrival gap statistics — the queueing
    read behind every rate-limit / burst-capacity decision: order
    each type's stream by timestamp (event_id as the deterministic
    tie-break for equal timestamps) and aggregate the successive gaps
    in exact integer microseconds.

    Percentiles are lower nearest-rank over (gap, occurrence order) —
    the doclen_percentiles discipline — and the mean floors, so every
    column is cross-engine bit-exact.

    Output: (etype, n_gaps, mean_us, p50_us, p90_us, max_us).

    Scale shape: one shuffle partitioned by event type, two in-
    partition windows (lag + rank), one aggregate — gaps never leave
    their type partition, and the type vocabulary bounds output rows.
    """
    from pyspark.sql import Window

    t = events.select(
        F.col("event_type").alias("etype"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("_us"),
        F.col("event_id").alias("_eid"))
    w = Window.partitionBy("etype").orderBy("_us", "_eid")
    g = (t.withColumn("_gap", F.col("_us") - F.lag("_us").over(w))
         .where(F.col("_gap").isNotNull()))
    wr = Window.partitionBy("etype").orderBy("_gap", "_us", "_eid")
    r = (g.withColumn("_rn", F.row_number().over(wr) - 1)
         .withColumn("_cnt", F.count(F.lit(1)).over(
             Window.partitionBy("etype"))))
    return (r.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.expr("sum(_gap) div count(*)").cast("long").alias("mean_us"),
        F.max(F.when(F.col("_rn") == F.expr("((_cnt - 1) * 50) div 100"),
                     F.col("_gap"))).cast("long").alias("p50_us"),
        F.max(F.when(F.col("_rn") == F.expr("((_cnt - 1) * 90) div 100"),
                     F.col("_gap"))).cast("long").alias("p90_us"),
        F.max("_gap").cast("long").alias("max_us")))


def fano_factor(events: DataFrame) -> DataFrame:
    """Fano factor (index of dispersion) of the daily count series
    per event type: F = variance / mean over the zero-filled day
    grid — the one-number Poisson check (F = 1 pure Poisson, > 1
    bursty/overdispersed, < 1 regular/underdispersed) behind every
    burst-capacity model.

    Exact integers via the computational identity: with n days,
    S1 = sum r, S2 = sum r^2, population variance = (n*S2 - S1^2) /
    n^2 and mean = S1/n, so F = (n*S2 - S1^2) / (n * S1) — ONE floor
    division, micro6-scaled, bit-exact cross-engine (numerator is
    non-negative by Cauchy-Schwarz).

    Output: (etype, n_days, total, fano_micro6).

    Scale shape: the event stream reduces by one hash aggregate to
    the bounded (type x day) grid; everything after is per-type
    aggregates on that grid.
    """
    grid = _day_grid(events)
    return (grid.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("r").cast("long").alias("total"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("_s2"))
        .where(F.col("total") > 0)
        .select("etype", "n_days", "total",
                F.expr("(1000000 * (n_days * _s2 - total * total))"
                       " div (n_days * total)").cast("long")
                .alias("fano_micro6")))


def transition_gini(events: DataFrame,
                    gap_minutes: int = 30) -> DataFrame:
    """Next-event predictability per predecessor type: within
    gap-based sessions, collect the first-order transition counts
    (prev event type -> next event type) and report each
    predecessor's Gini impurity of its next-event distribution —
    1 - sum p_i^2, the float-free cousin of transition entropy
    (0 = next event fully determined, (m-1)/m = uniform over m
    successors).  Exact integers: gini_micro6 = 1e6 * (n^2 -
    sum c_i^2) div n^2.  The modal successor and its share come
    along for the qualitative read.

    Output: (prev_type, n_transitions, n_successors, top_next,
    top_share_micro6, gini_micro6).

    Scale shape: one shuffle on user_id for sessionization (same as
    sessionize), lead within the session partition, then two bounded
    aggregates over the (type x type) transition matrix.
    """
    from pyspark.sql import Window

    secs = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (events.withColumn("_sec", secs)
         .withColumn("_new",
                     (F.lag("_sec").over(w).isNull()
                      | (F.col("_sec") - F.lag("_sec").over(w)
                         > gap_minutes * 60)).cast("int"))
         .withColumn("session_id",
                     F.sum("_new").over(
                         w.rowsBetween(Window.unboundedPreceding, 0))))
    ws = Window.partitionBy("user_id", "session_id") \
        .orderBy("ts", "event_id")
    tr = (s.select(F.col("event_type").alias("prev_type"),
                   F.lead("event_type").over(ws).alias("next_type"))
          .where(F.col("next_type").isNotNull()))
    conf = tr.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    return (conf.groupBy("prev_type").agg(
        F.sum("c").cast("long").alias("n_transitions"),
        F.count(F.lit(1)).cast("long").alias("n_successors"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("_c2"),
        F.max(F.struct(F.col("c"), F.col("next_type"))).alias("_top"))
        .select("prev_type", "n_transitions", "n_successors",
                F.col("_top.next_type").alias("top_next"),
                F.expr("(1000000 * _top.c) div n_transitions")
                .cast("long").alias("top_share_micro6"),
                F.expr("(1000000 * (n_transitions * n_transitions"
                       " - _c2)) div (n_transitions * n_transitions)")
                .cast("long").alias("gini_micro6")))


def mann_kendall(events: DataFrame) -> DataFrame:
    """Mann-Kendall trend test per event type over the zero-filled
    day grid — the nonparametric "is there a monotone trend at all"
    companion to theil_sen_trend's slope estimate: S = sum over day
    pairs i<j of sign(r_j - r_i), with the exact tie-corrected
    variance numerator var18 = n(n-1)(2n+5) - sum_t t(t-1)(2t+5)
    (Var(S) = var18/18; the z-score's sqrt is deliberately left to
    the consumer — everything emitted is exact integer).

    |S| close to n(n-1)/2 with var18 small => strong monotone trend;
    sign(S) is the direction.

    Output: (etype, n_days, s_stat, var18, n_tie_groups).

    Scale shape: same discipline as theil_sen_trend — the pair
    product runs on the bounded (type x day-spine) grid keyed by
    etype, never on the event stream; tie groups are one aggregate
    over the same grid.
    """
    grid = _day_grid(events)
    a = grid.select("etype", F.col("day_idx").alias("i"),
                    F.col("r").alias("ri"))
    b = grid.select("etype", F.col("day_idx").alias("j"),
                    F.col("r").alias("rj"))
    s = (a.join(b, "etype").where(F.col("j") > F.col("i"))
         .groupBy("etype").agg(
             F.sum(F.when(F.col("rj") > F.col("ri"), 1)
                   .when(F.col("rj") < F.col("ri"), -1)
                   .otherwise(0)).cast("long").alias("s_stat")))
    ties = (grid.groupBy("etype", "r")
            .agg(F.count(F.lit(1)).cast("long").alias("t"))
            .groupBy("etype").agg(
                F.count(F.lit(1)).cast("long").alias("n_tie_groups"),
                F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
                .cast("long").alias("_tie_sum")))
    n = grid.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"))
    return (n.join(s, "etype").join(ties, "etype")
            .select("etype", "n_days", "s_stat",
                    F.expr("n_days * (n_days - 1) * (2 * n_days + 5)"
                           " - _tie_sum").cast("long").alias("var18"),
                    "n_tie_groups"))


def autocorrelation(events: DataFrame, lags=(1, 2, 7)) -> DataFrame:
    """Sample autocorrelation of the daily count series per event
    type at the given lags — the periodicity read (lag-7 spikes =
    weekly seasonality) behind recrawl scheduling.  Float-free by
    clearing the mean denominator: with n days, S = sum r, the
    centered product sum over pairs (t, t+k) is computed on n*r - S
    (each term an exact integer), giving

        acf_micro6 = 1e6 * sum_t (n*r_t - S)(n*r_{t+k} - S)
                     div sum_t (n*r_t - S)^2

    — the standard ACF estimator scaled by n^2 in both numerator and
    denominator, so the ratio is unchanged and every intermediate is
    BIGINT.  Negative numerators divide truncating toward zero in
    both engines (the theil_sen measured rule).

    Output: (etype, lag, n_days, num, den, acf_micro6).

    Scale shape: the zero-filled grid is bounded (types x spine);
    the lag shift is a per-type window lead, the lag fan-out a
    literal explode — no joins beyond the grid build.
    """
    from pyspark.sql import Window

    grid = _day_grid(events)
    w = Window.partitionBy("etype").orderBy("day_idx")
    stats = grid.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("r").cast("long").alias("_s"))
    # localCheckpoint the bounded centered frame: six consumers below
    # would otherwise each re-plan the grid crossJoin AND re-aggregate
    # the event stream (observed: 7 plan copies before the cut)
    g = (grid.join(stats, "etype")
         .withColumn("_c", F.col("n_days") * F.col("r") - F.col("_s"))
         .localCheckpoint())
    fan = g.select(
        "etype", "day_idx", "n_days", "_c",
        F.explode(F.array(*[F.lit(k) for k in lags])).alias("lag"))
    # lead(k) needs a constant offset, but lag here is a column from
    # the explode — shift via an equi-join on day_idx + lag over the
    # bounded grid instead
    shifted = (g.select("etype", (F.col("day_idx")).alias("_dj"),
                        F.col("_c").alias("_cj")))
    pair = (fan.join(shifted,
                     (fan["etype"] == shifted["etype"])
                     & (shifted["_dj"] == fan["day_idx"] + fan["lag"]))
            .drop(shifted["etype"]))
    num = pair.groupBy("etype", "lag").agg(
        F.sum(F.col("_c") * F.col("_cj")).cast("long").alias("num"))
    den = g.groupBy("etype").agg(
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("den"),
        F.max("n_days").cast("long").alias("n_days"))
    return (num.join(den, "etype")
            .where(F.col("den") > 0)
            .select("etype", F.col("lag").cast("int"), "n_days",
                    "num", "den",
                    F.expr("(1000000 * num) div den").cast("long")
                    .alias("acf_micro6")))


def weekday_seasonality(events: DataFrame) -> DataFrame:
    """Weekly-seasonality strength per event type: the one-way ANOVA
    variance decomposition of the daily count series over weekday
    groups (day_idx mod 7) — strength = SS_between / SS_total, the
    share of day-to-day variance the weekday explains (near 1e6 =
    strict weekly rhythm, near 0 = no weekly structure).  The peak
    weekday comes along for the qualitative read.

    Float-free by clearing means: with n days, S = sum r, per-group
    size n_g and sum S_g, SS_total scales to SSTn = sum_t (n*r_t -
    S)^2 and SS_between to SSBn = sum_g (n*S_g - n_g*S)^2 / n_g
    (floored per group — 7 groups, documented); strength_micro6 =
    1e6 * SSBn div SSTn.  Validity bound: n * max_daily_count must
    stay under ~3e9 for the squares to fit BIGINT — true for any
    sane day spine; shard the spine before this ever binds.

    Output: (etype, n_days, ssb_scaled, sst_scaled,
    strength_micro6, peak_weekday).

    Scale shape: everything after the bounded day grid is two
    aggregates over (type x 7) groups.
    """
    grid = _day_grid(events).withColumn(
        "_wd", (F.col("day_idx") % 7).cast("int"))
    tot = grid.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("r").cast("long").alias("_s"))
    g = grid.join(tot, "etype").localCheckpoint()  # bounded frame
    sst = g.groupBy("etype").agg(
        F.sum((F.col("n_days") * F.col("r") - F.col("_s"))
              * (F.col("n_days") * F.col("r") - F.col("_s")))
        .cast("long").alias("sst_scaled"))
    grp = g.groupBy("etype", "_wd").agg(
        F.count(F.lit(1)).cast("long").alias("_ng"),
        F.sum("r").cast("long").alias("_sg"),
        F.max("n_days").alias("_n"), F.max("_s").alias("_stot"))
    ssb = (grp.withColumn(
        "_term", F.expr("((_n * _sg - _ng * _stot)"
                        " * (_n * _sg - _ng * _stot)) div _ng"))
        .groupBy("etype").agg(
            F.sum("_term").cast("long").alias("ssb_scaled")))
    # peak weekday: argmax of the group MEAN S_g/n_g ordered by the
    # floor-scaled mean (x10080); floor is identical cross-engine, so
    # the pick is deterministic — means within 1/10080 of each other
    # tie and break to the smallest weekday (documented behavior)
    peak = (grp.withColumn(
        "_best", F.row_number().over(
            Window.partitionBy("etype").orderBy(
                F.expr("-((_sg * 10080) div _ng)"),
                F.col("_wd"))))
        .where(F.col("_best") == 1)
        .select("etype", F.col("_wd").alias("peak_weekday")))
    return (sst.join(ssb, "etype").join(peak, "etype")
            .join(tot.select("etype", "n_days"), "etype")
            .where(F.col("sst_scaled") > 0)
            .select("etype", "n_days", "ssb_scaled", "sst_scaled",
                    F.expr("(1000000 * ssb_scaled) div sst_scaled")
                    .cast("long").alias("strength_micro6"),
                    "peak_weekday"))


def q1_pricing(lineitem: DataFrame) -> DataFrame:
    """The canonical scan-heavy OLAP aggregate (TPC-H Q1's pricing
    summary) re-expressed float-free, as the warehouse-side anchor
    for the engine's exact-integer discipline: every monetary value
    is cent-quantized PER ROW (floor(x*100) — one IEEE-deterministic
    double multiply + floor, identical in both engines), then all
    sums, products and averages run in BIGINT, so the result is
    bit-exact regardless of aggregation order — the property float
    SUMs cannot give across partitionings.

    disc_price = price * (1 - disc) and charge = disc_price *
    (1 + tax) become cents * (100 - disc_centi) and cents *
    (100 - disc_centi) * (100 + tax_centi), emitted at their natural
    x10^4 / x10^6 scales.

    Output per (l_returnflag, l_linestatus): (n_rows, sum_qty,
    sum_base_cents, sum_disc_x10000, sum_charge_x1000000,
    avg_qty_micro6, avg_price_cents).

    Scale shape: ONE map-side-combinable hash aggregate over the
    fact table — the textbook whole-stage-codegen scan.
    """
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.floor(F.col("l_discount") * 100).cast("long")
    tax_c = F.floor(F.col("l_tax") * 100).cast("long")
    qty = F.floor(F.col("l_quantity")).cast("long")
    return (lineitem.select(
        "l_returnflag", "l_linestatus", qty.alias("_q"),
        cents.alias("_c"),
        (cents * (100 - disc_c)).alias("_d"),
        (cents * (100 - disc_c) * (100 + tax_c)).alias("_g"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             F.sum("_q").cast("long").alias("sum_qty"),
             F.sum("_c").cast("long").alias("sum_base_cents"),
             F.sum("_d").cast("long").alias("sum_disc_x10000"),
             F.sum("_g").cast("long").alias("sum_charge_x1000000"))
        .select("l_returnflag", "l_linestatus", "n_rows", "sum_qty",
                "sum_base_cents", "sum_disc_x10000",
                "sum_charge_x1000000",
                F.expr("(1000000 * sum_qty) div n_rows").cast("long")
                .alias("avg_qty_micro6"),
                F.expr("sum_base_cents div n_rows").cast("long")
                .alias("avg_price_cents")))


def type_covariance(events: DataFrame) -> DataFrame:
    """Cross-type co-burst detection: the exact covariance numerator
    between every pair of event types' daily count series on the
    SHARED zero-filled day spine — positive = the types surge
    together (one upstream cause), negative = they trade off
    (cannibalization / failover).  Mean-cleared by n-scaling like
    autocorrelation: cov_n = sum_t (n*r_at - S_a)(n*r_bt - S_b),
    emitted with both types' own variance numerators so the consumer
    can normalize to a correlation without the engine ever touching
    a square root.

    Output: (etype_a, etype_b, n_days, cov_n, cov_sign, var_a,
    var_b), one row per unordered pair.

    Scale shape: the grid is the bounded (types x spine) frame; the
    pair join is keyed on day_idx over the centered table (types^2
    x spine rows at most), then one aggregate per pair.
    """
    from pyspark.sql import Window

    grid = _day_grid(events)
    stats = grid.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("r").cast("long").alias("_s"))
    g = (grid.join(stats, "etype")
         .withColumn("_c", F.col("n_days") * F.col("r") - F.col("_s"))
         .localCheckpoint())  # bounded; pair sides + variances read it
    var = g.groupBy("etype").agg(
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("_v"))
    a = g.select(F.col("etype").alias("etype_a"), "day_idx",
                 F.col("_c").alias("_ca"),
                 F.col("n_days").alias("n_days"))
    b = g.select(F.col("etype").alias("etype_b"),
                 F.col("day_idx").alias("_db"),
                 F.col("_c").alias("_cb"))
    pairs = (a.join(b, (a["day_idx"] == b["_db"])
                    & (a["etype_a"] < b["etype_b"]))
             .groupBy("etype_a", "etype_b", "n_days")
             .agg(F.sum(F.col("_ca") * F.col("_cb")).cast("long")
                  .alias("cov_n")))
    return (pairs
            .join(var.withColumnRenamed("etype", "etype_a")
                  .withColumnRenamed("_v", "var_a"), "etype_a")
            .join(var.withColumnRenamed("etype", "etype_b")
                  .withColumnRenamed("_v", "var_b"), "etype_b")
            .select("etype_a", "etype_b", "n_days", "cov_n",
                    F.signum("cov_n").cast("int").alias("cov_sign"),
                    F.col("var_a").cast("long"),
                    F.col("var_b").cast("long")))


def lateness_audit(events: DataFrame,
                   watermarks_s=(60, 600, 3600)) -> DataFrame:
    """Watermark-sizing audit for the streaming twins: with arrival
    order = event_id (the log-ingestion convention every stateful op
    here assumes) and per-user keyed state (the partitioning those
    ops run under), how late does each event arrive relative to the
    running event-time high-water mark of its key, and how many
    events would a watermark of W seconds discard?

    lateness_s = running-max(sec) - sec over arrival order within
    the user partition; for each candidate W the count and exact
    share of events strictly later than W.

    Output: one row per W: (watermark_s, n_events, n_out_of_order,
    max_lateness_s, n_late, late_share_micro6).

    Scale shape: ONE per-user window (the same key the stateful ops
    shuffle by — no global sort), one aggregate; the W fan-out is a
    literal explode.
    """
    from pyspark.sql import Window

    sec = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    late = (events.select("user_id", "event_id", sec.alias("_sec"))
            .withColumn("_hwm", F.max("_sec").over(w))
            .select((F.col("_hwm") - F.col("_sec")).alias("_late")))
    fan = late.select(
        "_late",
        F.explode(F.array(*[F.lit(x) for x in watermarks_s]))
        .alias("watermark_s"))
    return (fan.groupBy("watermark_s").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((F.col("_late") > 0).cast("int")).cast("long")
        .alias("n_out_of_order"),
        F.max("_late").cast("long").alias("max_lateness_s"),
        F.sum((F.col("_late") > F.col("watermark_s")).cast("int"))
        .cast("long").alias("n_late"))
        .select(F.col("watermark_s").cast("int"), "n_events",
                "n_out_of_order", "max_lateness_s", "n_late",
                F.expr("(1000000 * n_late) div n_events")
                .cast("long").alias("late_share_micro6")))


def zorder_locality(events: DataFrame,
                    rows_per_file: int = 50) -> DataFrame:
    """Data-layout audit: does Z-ORDERING the event log on
    (user-bucket, day-bucket) beat the naive user-major sort for
    day-scoped scans?  Models exactly the clustering decision an
    Iceberg/Delta writer makes — rows are laid out in some total
    order, chopped into fixed-size files, and a day-predicate scan
    touches every file containing at least one matching row.

    ub = user_id mod 16, db = epoch_day(ts) mod 16; z = 8-bit Morton
    interleave of (ub, db).  Two candidate layouts rank every row:
    z-order (z, event_id) and user-major (ub, db, event_id); file_id
    = rank div rows_per_file.  Per day-bucket: rows, distinct files
    touched, and the file-id span under each layout.  All integer
    bit arithmetic — exact in any engine.

    Scale shape: the global rank is NOT a one-partition window over
    the corpus — both layout keys have bounded cardinality (<=256),
    so rank = (broadcast cumulative offset per key) + row_number
    WITHIN the key partition.  The only global sort is over the
    256-row key-count table; the corpus sees two keyed windows and
    one aggregate.
    """
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    ub = F.pmod(F.col("user_id"), F.lit(16)).cast("int")
    db = F.pmod(day, F.lit(16)).cast("int")
    # Morton interleave of two 4-bit values: bit i of ub lands at
    # 2i+1, bit i of db at 2i.
    def _morton(h, d):
        z = F.lit(0)
        for i in range(4):
            z = (z + (F.shiftright(h, i) % 2) * (2 ** (2 * i + 1))
                 + (F.shiftright(d, i) % 2) * (2 ** (2 * i)))
        return z.cast("int")

    base = events.select(
        "event_id", ub.alias("ub"), db.alias("db")).withColumn(
        "z", _morton(F.col("ub"), F.col("db")))

    def _file_ids(df, key_cols, out):
        counts = df.groupBy(*key_cols).agg(
            F.count(F.lit(1)).alias("_n"))
        cum = counts.withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy(*key_cols)
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0))).drop("_n")
        rn = F.row_number().over(
            Window.partitionBy(*key_cols).orderBy("event_id"))
        return (df.join(F.broadcast(cum), key_cols)
                .withColumn(out,
                            ((F.col("_off") + rn - 1)
                             / rows_per_file).cast("long"))
                .drop("_off"))

    laid = _file_ids(_file_ids(base, ["z"], "z_file"),
                     ["ub", "db"], "lex_file")
    return (laid.groupBy("db").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("z_file").cast("long").alias("z_files"),
        F.countDistinct("lex_file").cast("long").alias("lex_files"),
        (F.max("z_file") - F.min("z_file") + 1).cast("long")
        .alias("z_span"),
        (F.max("lex_file") - F.min("lex_file") + 1).cast("long")
        .alias("lex_span"))
        .select(F.col("db").alias("day_bucket"), "n_events",
                "z_files", "lex_files", "z_span", "lex_span"))


def peak_prominence(events: DataFrame) -> DataFrame:
    """Topographic prominence of local maxima in the per-type daily
    count series — the burst-triage statistic: a spike's height
    relative to the KEY COL (the highest saddle separating it from
    higher terrain), not relative to zero, so a wiggle on a plateau
    ranks below a genuine burst of the same absolute height.

    Series = observed days per event_type in day order, v = daily
    count, idx = 0-based position.  A peak is strictly higher than
    both sequence neighbors.  On each side, the col is MIN(v) between
    the peak and the NEAREST STRICTLY HIGHER value (or over the whole
    side when no higher value exists); saddle = MAX(left col, right
    col); prominence = v - saddle.  All integers — exact in any
    engine.

    Output: (event_type, day_idx, peak_v, saddle_v, prominence).

    Scale shape: everything is keyed by event_type, and the per-type
    series length is CALENDAR-bounded (days, not corpus size), so
    the two O(len^2) within-type self-joins cost O(types x days^2)
    — independent of event volume; the corpus itself sees only the
    one (type, day) roll-up shuffle.
    """
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    daily = (events.select(F.col("event_type").alias("etype"),
                           day.alias("_day"))
             .groupBy("etype", "_day")
             .agg(F.count(F.lit(1)).alias("v")))
    w = Window.partitionBy("etype").orderBy("_day")
    ser = (daily.withColumn("idx", F.row_number().over(w) - 1)
           .withColumn("_pv", F.lag("v").over(w))
           .withColumn("_nv", F.lead("v").over(w))
           .persist())
    peaks = (ser.where((F.col("v") > F.col("_pv"))
                       & (F.col("v") > F.col("_nv")))
             .select("etype", F.col("idx").alias("pidx"),
                     F.col("v").alias("peak_v")))
    other = ser.select("etype", F.col("idx").alias("oidx"),
                       F.col("v").alias("ov"))

    def _side(name, left):
        cond = (F.col("oidx") < F.col("pidx") if left
                else F.col("oidx") > F.col("pidx"))
        j = peaks.join(other, "etype").where(cond)
        # nearest strictly-higher index on this side (null if none)
        agg = F.max if left else F.min
        bound = (j.where(F.col("ov") > F.col("peak_v"))
                 .groupBy("etype", "pidx")
                 .agg(agg("oidx").alias(f"_b_{name}")))
        withb = j.join(bound, ["etype", "pidx"], "left")
        inner = (F.col("oidx") > F.col(f"_b_{name}") if left
                 else F.col("oidx") < F.col(f"_b_{name}"))
        return (withb.where(F.col(f"_b_{name}").isNull() | inner)
                .groupBy("etype", "pidx")
                .agg(F.min("ov").alias(f"col_{name}")))

    lcol = _side("l", True)
    rcol = _side("r", False)
    return (peaks.join(lcol, ["etype", "pidx"])
            .join(rcol, ["etype", "pidx"])
            .select(F.col("etype").alias("event_type"),
                    F.col("pidx").cast("long").alias("day_idx"),
                    F.col("peak_v").cast("long"),
                    F.greatest("col_l", "col_r").cast("long")
                    .alias("saddle_v"),
                    (F.col("peak_v")
                     - F.greatest("col_l", "col_r")).cast("long")
                    .alias("prominence")))


def runs_test(events: DataFrame) -> DataFrame:
    """Wald-Wolfowitz runs test per event type: is the daily-count
    series randomly ordered around its median, or does it clump
    (trend / regime persistence)?  Too FEW runs = sticky regimes,
    too MANY = oscillation — the randomness sanity check behind the
    Mann-Kendall / CUSUM drift monitors.

    Per type: med = the LOWER MEDIAN of daily counts (the
    ceil(n/2)-th smallest — integer-deterministic, no averaging);
    days with v == med are dropped (the classical treatment); sign =
    v > med; n_runs = maximal same-sign blocks in day order.  The
    null moments are emitted as exact integer-division micro6
    rationals of n1, n2: E[R] = 1 + 2*n1*n2/n and Var[R] =
    2*n1*n2*(2*n1*n2 - n)/(n^2*(n-1)) with n = n1+n2.

    Output: (event_type, n1, n2, n_runs, exp_runs_micro6,
    var_runs_micro6).

    Scale shape: one (type, day) roll-up shuffle; everything after
    runs per-type over CALENDAR-bounded series (two keyed windows,
    one keyed aggregate) — independent of event volume.
    """
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    daily = (events.select(F.col("event_type").alias("etype"),
                           day.alias("_day"))
             .groupBy("etype", "_day")
             .agg(F.count(F.lit(1)).alias("v")))
    wv = Window.partitionBy("etype").orderBy("v", "_day")
    wn = Window.partitionBy("etype")
    med = (daily.withColumn("_rn", F.row_number().over(wv))
           .withColumn("_n", F.count(F.lit(1)).over(wn))
           .where(F.col("_rn") == F.expr("(_n + 1) div 2"))
           .select("etype", F.col("v").alias("_med")))
    signed = (daily.join(F.broadcast(med), "etype")
              .where(F.col("v") != F.col("_med"))
              .withColumn("_sgn", (F.col("v") > F.col("_med"))
                          .cast("int")))
    wd = Window.partitionBy("etype").orderBy("_day")
    runs = (signed.withColumn("_chg",
                              (F.col("_sgn")
                               != F.coalesce(F.lag("_sgn").over(wd),
                                             F.col("_sgn") + 10))
                              .cast("int"))
            .groupBy("etype")
            .agg(F.sum((F.col("_sgn") == 1).cast("long")).alias("n1"),
                 F.sum((F.col("_sgn") == 0).cast("long")).alias("n2"),
                 F.sum("_chg").cast("long").alias("n_runs")))
    # n1 + n2 >= 2 guards the n and n*(n-1) divisors; a type whose
    # counts are all equal to its median has no testable sequence
    return (runs.where(F.col("n1") + F.col("n2") >= 2).select(
        F.col("etype").alias("event_type"),
        "n1", "n2", "n_runs",
        (F.lit(1000000) + F.expr(
            "(2000000 * n1 * n2) div (n1 + n2)")).cast("long")
        .alias("exp_runs_micro6"),
        F.expr("(1000000 * 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2))"
               " div ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))")
        .cast("long").alias("var_runs_micro6")))


def ewma_forecast(events: DataFrame, k: int = 16) -> DataFrame:
    """Dyadic EWMA one-step forecast per event type — the capacity-
    planning read: forecast today's volume from an alpha = 1/2
    exponentially-weighted mean of the prior ``k`` observed days,
    and report the exact forecast error.  alpha = 1/2 makes every
    weight a power of two, so the whole statistic is integer-exact:
    W = sum_{i=1..k} v(t-i) * 2^(k-i) (yesterday weighs 2^(k-1),
    halving per day back), D = 2^k - 1, and ewma_micro6 =
    floor(1e6 * W / D) — a weighted mean over [min v, max v].

    Types with fewer than k+1 observed days are dropped (a truncated
    window would silently re-weight; the caller picks a smaller k
    instead).

    Output: (event_type, n_days, last_v, ewma_micro6,
    abs_err_micro6) with abs_err_micro6 = |1e6 * last_v -
    ewma_micro6|.

    Scale shape: one (type, day) roll-up shuffle, one keyed window
    for the descending index, one keyed conditional aggregate —
    series length is calendar-bounded.
    """
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    daily = (events.select(F.col("event_type").alias("etype"),
                           day.alias("_day"))
             .groupBy("etype", "_day")
             .agg(F.count(F.lit(1)).alias("v")))
    w = Window.partitionBy("etype").orderBy(F.col("_day").desc())
    idx = daily.withColumn("_i", F.row_number().over(w))
    denom = (1 << k) - 1
    agg = (idx.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max(F.when(F.col("_i") == 1, F.col("v"))).cast("long")
        .alias("last_v"),
        F.sum(F.when((F.col("_i") >= 2) & (F.col("_i") <= k + 1),
                     F.col("v")
                     * F.expr(f"shiftleft(cast(1 as bigint),"
                              f" {k + 1} - cast(_i as int))")))
        .cast("long").alias("_w")))
    return (agg.where(F.col("n_days") >= k + 1)
            .withColumn("ewma_micro6",
                        F.expr(f"(1000000 * _w) div {denom}")
                        .cast("long"))
            .withColumn("abs_err_micro6",
                        F.abs(F.lit(1000000) * F.col("last_v")
                              - F.col("ewma_micro6")).cast("long"))
            .select(F.col("etype").alias("event_type"), "n_days",
                    "last_v", "ewma_micro6", "abs_err_micro6"))


LIS_SCHEMA = ("event_type string, n_days bigint, lis_len bigint, "
              "lds_len bigint, lis_share_micro6 bigint")


def _lis_len(vals):
    """O(n^2) longest STRICTLY monotone subsequence DP (n is
    calendar-bounded, so quadratic is irrelevant)."""
    n = len(vals)
    best = [1] * n
    for j in range(n):
        for i in range(j):
            if vals[i] < vals[j] and best[i] + 1 > best[j]:
                best[j] = best[i] + 1
    return max(best) if n else 0


def _lis_group(pdf):
    import pandas as pd

    pdf = pdf.sort_values("_day")
    vals = pdf["v"].tolist()
    n = len(vals)
    lis = _lis_len(vals)
    lds = _lis_len([-x for x in vals])
    return pd.DataFrame([{
        "event_type": pdf["etype"].iloc[0],
        "n_days": n, "lis_len": lis, "lds_len": lds,
        "lis_share_micro6": (1_000_000 * lis) // n,
    }])


def lis_trend(events: DataFrame) -> DataFrame:
    """Longest strictly increasing / decreasing subsequence of the
    per-type daily count series — the non-parametric trend-strength
    reading that complements Mann-Kendall: MK counts concordant
    pairs (can be dragged by one outlier day), while LIS/n measures
    how much of the series participates in a SUSTAINED ramp.

    Per type: (event_type, n_days, lis_len, lds_len,
    lis_share_micro6 = floor(1e6 * lis/n)).  Strict inequalities on
    integer counts — exact in any engine.

    Scale shape: one (type, day) roll-up shuffle, then ONE
    applyInPandas per type over a CALENDAR-bounded series (the
    Kleinberg-burst device: Arrow batch per key, O(days^2) DP is
    volume-independent).  The equivalent DuckDB oracle is the
    recursive longest-path closure over the i<j, v_i<v_j DAG.
    """
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    daily = (events.select(F.col("event_type").alias("etype"),
                           day.alias("_day"))
             .groupBy("etype", "_day")
             .agg(F.count(F.lit(1)).alias("v")))
    return daily.groupBy("etype").applyInPandas(
        lambda pdf: _lis_group(pdf), LIS_SCHEMA)


def series_motifs(events: DataFrame) -> DataFrame:
    """SAX-style motif census of the per-type daily series, with the
    float-free symbolization the rank devices here always use: each
    day's count maps to a QUARTILE SYMBOL a-d via its exact position
    in the type's value multiset (sym = (4 * #strictly-smaller) div
    n, ties share a symbol), then every 3 consecutive observed days
    form a motif string ("abd", "ddd", ...).  Recurring motifs =
    repeated local shapes (ramps, spikes, plateaus) — the discrete
    pattern-mining complement to autocorrelation.

    Output: (event_type, motif, n_windows, share_micro6) with
    share_micro6 = floor(1e6 * n_windows / total windows of that
    type); types with < 3 observed days vanish (no window).

    Scale shape: one (type, day) roll-up, a bounded per-type value
    histogram broadcast back for the symbol, one keyed lead-lead
    window, one hash aggregate — series length is calendar-bounded.
    """
    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
    daily = (events.select(F.col("event_type").alias("etype"),
                           day.alias("_day"))
             .groupBy("etype", "_day")
             .agg(F.count(F.lit(1)).alias("v")))
    hist = (daily.groupBy("etype", "v")
            .agg(F.count(F.lit(1)).alias("_c")))
    wv = (Window.partitionBy("etype").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1))
    wn = Window.partitionBy("etype")
    sym = (hist.withColumn("_below",
                           F.coalesce(F.sum("_c").over(wv), F.lit(0)))
           .withColumn("_n", F.sum("_c").over(wn))
           .select("etype", "v",
                   F.expr("substring('abcd',"
                          " cast((4 * _below) div _n as int) + 1, 1)")
                   .alias("_sym")))
    wd = Window.partitionBy("etype").orderBy("_day")
    motifs = (daily.join(F.broadcast(sym), ["etype", "v"])
              .withColumn("_s1", F.lead("_sym", 1).over(wd))
              .withColumn("_s2", F.lead("_sym", 2).over(wd))
              .where(F.col("_s2").isNotNull())
              .select("etype",
                      F.concat("_sym", "_s1", "_s2").alias("motif")))
    counts = (motifs.groupBy("etype", "motif")
              .agg(F.count(F.lit(1)).cast("long").alias("n_windows")))
    tot = Window.partitionBy("etype")
    return (counts.withColumn(
        "_tot", F.sum("n_windows").over(tot))
        .select(F.col("etype").alias("event_type"), "motif",
                "n_windows",
                F.expr("(1000000 * n_windows) div _tot").cast("long")
                .alias("share_micro6")))


def seq_patterns(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gapped length-2 sequential-pattern support over sessions —
    the PrefixSpan-style companion to session_trigrams: a session
    supports pattern (t1 -> t2) iff SOME t1 event precedes SOME t2
    event in it, any gap.  Contiguous n-grams (session_trigrams)
    miss "search ... eventually purchase" funnels with noise between
    the steps; this is the standard first level of GSP/PrefixSpan.

    The naive miner explodes C(len, 2) event pairs per session and
    dies on long sessions.  This one is LINEAR: one pass attaches,
    per event, the count of earlier same-session events of each type
    (T conditional prefix sums evaluated in ONE window, T = bounded
    event-type domain), then fans out T structs per event — so
    n_pairs(t1, t2) = sum over t2-events of their t1-prefix count,
    and session support counts sessions where that prefix count is
    ever positive.  No pair space, no per-session quadratic blowup.

    Output per (t1, t2): n_pairs (ordered co-occurrence pairs,
    the gapped analogue of n_occurrences), n_sessions, and
    support_micro6 = n_sessions * 1e6 // total sessions (1-row
    scalar attached lazily, trending_entities-class).

    Session boundaries are sessionize's (same gap, same (ts,
    event_id) ordering).
    """
    secs = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    ev = events.withColumn("_sec", secs)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("_sec").over(w)
    new_sess = gap.isNull() | (F.col("_sec") - gap > gap_minutes * 60)
    ev = (ev.withColumn("_new", new_sess.cast("int"))
          .withColumn("session_id",
                      (F.sum("_new").over(
                          w.rowsBetween(Window.unboundedPreceding, 0))
                       - 1).cast("int")))
    types = sorted(r[0] for r in
                   ev.select("event_type").distinct().collect())
    ws = (Window.partitionBy("user_id", "session_id")
          .orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    pre = ev
    for t in types:
        pre = pre.withColumn(
            f"_pre_{t}",
            F.coalesce(F.sum((F.col("event_type") == t).cast("long"))
                       .over(ws), F.lit(0)))
    structs = [F.struct(F.lit(t).alias("t1"),
                        F.col("event_type").alias("t2"),
                        F.col(f"_pre_{t}").alias("_cnt"))
               for t in types]
    ex = (pre.select("user_id", "session_id",
                     F.explode(F.array(*structs)).alias("p"))
          .select("user_id", "session_id", "p.*")
          .where(F.col("_cnt") > 0))
    counts = (ex.groupBy("t1", "t2").agg(
        F.sum("_cnt").cast("long").alias("n_pairs"),
        F.countDistinct("user_id", "session_id").cast("long")
        .alias("n_sessions")))
    total = (ev.select("user_id", "session_id").dropDuplicates()
             .agg(F.count(F.lit(1)).cast("long").alias("_tot")))
    return (counts.crossJoin(total)
            .select("t1", "t2", "n_pairs", "n_sessions",
                    F.expr("CAST(n_sessions * 1000000 DIV _tot"
                           " AS BIGINT)").alias("support_micro6")))


def record_census(events: DataFrame) -> DataFrame:
    """Running-record census of the per-type daily volume series —
    the distribution-free trend flag that complements mann_kendall
    and runs_test: under exchangeability (no trend), the expected
    number of running record highs in an n-day series is the
    harmonic number H_n regardless of the volume distribution, so
    n_record_highs far above the floor-scaled H_n (and record lows
    far below) is a nonparametric trend signal with NO tuning
    constants at all.

    Day i is a record high iff its volume strictly exceeds every
    earlier day's (day 1 is both a record high and low); ties break
    records (strict inequality) — the standard records-process
    convention.

    Output per event_type: (event_type, n_days, n_record_highs,
    n_record_lows, expected_micro6 = sum_{i=1..n} 1e6 // i, the
    per-term-floored H_n both engines compute identically).

    Scale shape: one daily pre-aggregate (map-side combinable),
    then one per-type ordered window for the prefix extrema — the
    series length is bounded by the calendar, not the corpus.
    """
    daily = (events
             .withColumn("_day", F.expr(
                 "unix_micros(cast(ts as timestamp)) div 86400000000"))
             .groupBy("event_type", "_day")
             .agg(F.count(F.lit(1)).cast("long").alias("_v")))
    w = (Window.partitionBy("event_type").orderBy("_day")
         .rowsBetween(Window.unboundedPreceding, -1))
    flagged = (daily
               .withColumn("_pmax", F.max("_v").over(w))
               .withColumn("_pmin", F.min("_v").over(w))
               .withColumn("_i", F.row_number().over(
                   Window.partitionBy("event_type").orderBy("_day")))
               .withColumn("_hi", (F.col("_pmax").isNull()
                                   | (F.col("_v") > F.col("_pmax")))
                           .cast("long"))
               .withColumn("_lo", (F.col("_pmin").isNull()
                                   | (F.col("_v") < F.col("_pmin")))
                           .cast("long")))
    return (flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("_hi").cast("long").alias("n_record_highs"),
        F.sum("_lo").cast("long").alias("n_record_lows"),
        F.sum(F.expr("1000000 div _i")).cast("long")
        .alias("expected_micro6")))


def wilcoxon_signed(events: DataFrame) -> DataFrame:
    """Exact tie-aware Wilcoxon signed-rank test of per-user
    activity shift between the early and late halves of the
    observation window — the PAIRED complement to mann_whitney /
    kruskal_wallis: each user is their own control, so
    between-user volume differences (which dominate any unpaired
    test) cancel, and what remains is the within-user drift the
    unpaired family cannot see.

    Pairing: per user, d = late-half event count - early-half
    count, split at the integer midpoint of the window
    (mid = (min_us + max_us) div 2, early = ts <= mid) — integers
    end to end, no float timestamps.  Zero differences are dropped
    (the classic Wilcoxon convention) but counted in n_zero.

    Doubled-rank trick under ties: |d| mid-ranks doubled to
    r2 = 2*below + c + 1; W2+ = sum of r2 over users with d > 0
    (i.e. 2*W+).  With var(W+) = (2n(n+1)(2n+1) - sum(t^3-t))/48
    (tie-corrected) and 2*W2+ - n(n+1) = 4*(W+ - mean), the squared
    normal score is z2 = 3*(2*W2+ - n(n+1))^2
    / (2n(n+1)(2n+1) - sum(t^3-t)),
    emitted as z2_micro6 by one DECIMAL(38,0) floor (the
    mann_whitney device; the squared numerator overflows BIGINT
    past ~50k paired users).

    Output: one row (n_pairs, n_zero, n_used, w2_plus, tie_cubes,
    shift_sign, z2_micro6) — all integers.

    Scale shape: one bounds aggregate (1-row lazy broadcast
    crossJoin), one per-user count aggregate, then the |d|
    HISTOGRAM — the single unpartitioned window runs over the
    bounded difference domain (max per-user count swing), never
    the user space.
    """
    ev = events.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp"))
        .alias("_us"))
    bounds = ev.agg(
        F.expr("(min(_us) + max(_us)) div 2").cast("long")
        .alias("_mid"))
    d = (ev.crossJoin(F.broadcast(bounds))  # 1-row scalar
         .groupBy("user_id")
         .agg((F.sum((F.col("_us") > F.col("_mid")).cast("long"))
               - F.sum((F.col("_us") <= F.col("_mid")).cast("long")))
              .cast("long").alias("_d")))
    hist = (d.groupBy(F.abs("_d").alias("_ad"))
            .agg(F.count(F.lit(1)).cast("long").alias("_c"),
                 F.sum((F.col("_d") > 0).cast("long")).cast("long")
                 .alias("_cp")))
    nz = hist.where(F.col("_ad") > 0)
    w = Window.orderBy("_ad").rowsBetween(Window.unboundedPreceding, -1)
    nz = (nz.withColumn("_below", F.coalesce(
              F.sum("_c").over(w), F.lit(0)).cast("long"))
          .withColumn("_r2", (F.lit(2) * F.col("_below")
                              + F.col("_c") + 1).cast("long")))
    zero = hist.where(F.col("_ad") == 0).agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_zero"))
    agg = nz.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_used"),
        F.coalesce(F.sum(F.col("_cp") * F.col("_r2")), F.lit(0))
        .cast("long").alias("w2_plus"),
        F.coalesce(F.sum(F.col("_c") * F.col("_c") * F.col("_c")
                         - F.col("_c")), F.lit(0)).cast("long")
        .alias("tie_cubes"))
    return (agg.crossJoin(F.broadcast(zero))  # 1-row scalar
            .withColumn("n_pairs",
                        (F.col("n_used") + F.col("n_zero"))
                        .cast("long"))
            .withColumn("shift_sign",
                        F.signum(F.lit(2) * F.col("w2_plus")
                                 - F.col("n_used")
                                 * (F.col("n_used") + 1))
                        .cast("int"))
            .withColumn(
                "z2_micro6",
                F.expr(
                    "CASE WHEN n_used > 0 AND"
                    " 2 * n_used * (n_used + 1) * (2 * n_used + 1)"
                    " - tie_cubes > 0 THEN"
                    " CAST((CAST(3000000 AS DECIMAL(38,0))"
                    " * (2 * w2_plus - n_used * (n_used + 1))"
                    " * (2 * w2_plus - n_used * (n_used + 1)))"
                    " div (CAST(2 AS DECIMAL(38,0)) * n_used"
                    " * (n_used + 1) * (2 * n_used + 1)"
                    " - tie_cubes) AS BIGINT)"
                    " ELSE CAST(0 AS BIGINT) END"))
            .select("n_pairs", "n_zero", "n_used", "w2_plus",
                    "tie_cubes", "shift_sign", "z2_micro6"))


def markov_stationary(events: DataFrame, gap_minutes: int = 30,
                      n_iter: int = 5,
                      scale: int = 10**12) -> DataFrame:
    """Fixed-point stationary distribution of the session
    transition chain — the long-run answer to transition_gini's
    one-step read: start uniform over event types and apply the
    row-stochastic transition matrix n_iter times; where the mass
    settles is where user journeys spend their time, and the gap
    between stationary and EMPIRICAL type shares is the standard
    "journeys concentrate somewhere else than raw volume suggests"
    funnel diagnostic.

    Integer fixed-point (the pagerank_fixed discipline): masses
    are BIGINTs in units of 1/scale, every division floors, so the
    result is partition-order-free and a DuckDB oracle unrolling
    the n_iter rounds as chained CTEs reproduces it bit-exactly:

        v0(t)   = scale // m
        flow(j) = sum over i of (v(i) * c_ij) div n_i
        v'(j)   = flow(j) + dang div m     (types with no
                  out-transitions redistribute uniformly)

    Output per event type: (event_type, n_events, emp_micro6,
    mass_u, stat_micro6).

    Scale shape: one user_id shuffle for sessionization, then all
    n_iter rounds run over the bounded (type x type) transition
    matrix — the per-round joins never touch the corpus again.
    The only driver sync is m = |event types| (domain-bounded, the
    pagerank_fixed n-count pattern).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    s = (events.withColumn("_sec", secs)
         .withColumn("_new",
                     (F.lag("_sec").over(w).isNull()
                      | (F.col("_sec") - F.lag("_sec").over(w)
                         > gap_minutes * 60)).cast("int"))
         .withColumn("_sess",
                     F.sum("_new").over(
                         w.rowsBetween(Window.unboundedPreceding, 0))))
    ws = Window.partitionBy("user_id", "_sess").orderBy("ts", "event_id")
    tr = (s.select(F.col("event_type").alias("_prev"),
                   F.lead("event_type").over(ws).alias("_next"))
          .where(F.col("_next").isNotNull()))
    conf = (tr.groupBy("_prev", "_next")
            .agg(F.count(F.lit(1)).cast("long").alias("_c"))
            .localCheckpoint())
    out_n = conf.groupBy("_prev").agg(
        F.sum("_c").cast("long").alias("_n")).localCheckpoint()
    emp = (events.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
           .localCheckpoint())
    m = emp.count()  # bounded: the event-type domain
    if m == 0:
        # ADVICE r05: empty events raised ZeroDivisionError on the
        # driver; return the empty schema-matching frame instead.
        return emp.select(
            "event_type", "n_events",
            F.lit(0).cast("long").alias("emp_micro6"),
            F.lit(0).cast("long").alias("mass_u"),
            F.lit(0).cast("long").alias("stat_micro6"))
    types = emp.select(F.col("event_type").alias("_t"))
    v = types.withColumn("mass_u", F.lit(scale // m).cast("long"))
    for _ in range(n_iter):
        flow = (conf.join(out_n, "_prev")
                .join(v.withColumnRenamed("_t", "_prev"), "_prev")
                .select(F.col("_next").alias("_t"),
                        F.expr("(mass_u * _c) DIV _n").alias("_f"))
                .groupBy("_t")
                .agg(F.sum("_f").cast("long").alias("_in")))
        dang = (v.join(out_n.withColumnRenamed("_prev", "_t"),
                       "_t", "left_anti")
                .agg(F.coalesce(F.sum("mass_u"), F.lit(0))
                     .cast("long").alias("_dang")))
        v = (types.join(flow, "_t", "left")
             .crossJoin(F.broadcast(dang))  # 1-row scalar
             .select("_t",
                     (F.coalesce(F.col("_in"), F.lit(0))
                      + F.expr(f"_dang DIV {m}"))
                     .cast("long").alias("mass_u"))
             ).localCheckpoint()
    tot = emp.agg(F.sum("n_events").cast("long").alias("_nt"))
    return (emp.join(v.withColumnRenamed("_t", "event_type"),
                     "event_type")
            .crossJoin(F.broadcast(tot))  # 1-row scalar
            .select("event_type", "n_events",
                    F.expr("CAST(1000000 * n_events DIV _nt"
                           " AS BIGINT)").alias("emp_micro6"),
                    "mass_u",
                    F.expr(f"CAST(mass_u DIV {scale // 10**6}"
                           " AS BIGINT)").alias("stat_micro6")))


def lead_lag(events: DataFrame, max_lag: int = 3) -> DataFrame:
    """Lead-lag cross-covariance audit between every ordered pair
    of event-type daily series — the multivariate member of the
    time-series family: autocorrelation reads one series against
    itself, this reads type a's volume against type b's ℓ days
    LATER, so "errors spike two days after signups spike" becomes a
    table instead of a war story.  The statistic per (a, b, lag) is
    the exact integer cross-covariance numerator scaled by the
    overlap length, cov_num = n*sum(x*y) - sum(x)*sum(y) (the
    fano_factor variance device, off-diagonal) — positive means
    a-up predicts b-up ℓ days on.

    Output: (type_a, type_b, lag, n_days, sx, sy, sxy, cov_num,
    is_best) — is_best = 1 on each pair's covariance-maximizing
    lag (ties to the smaller lag).  cov_num is computed in
    DECIMAL(38,0)/HUGEINT so billion-event days cannot overflow
    the products.

    Scale shape: the shared _day_grid (bounded types x day-spine
    crossJoin); the lag alignment is an EQUI-join on the shifted
    day index (lags exploded from a bounded literal array), then
    one (a, b, lag) aggregate and one window over the bounded pair
    table.
    """
    grid = _day_grid(events)
    lags = F.array(*[F.lit(l) for l in range(max_lag + 1)])
    b = (grid.select(F.col("etype").alias("type_b"),
                     F.col("day_idx"), F.col("r").alias("_y"))
         .withColumn("lag", F.explode(lags))
         .withColumn("_day_a", (F.col("day_idx") - F.col("lag"))
                     .cast("int"))
         .drop("day_idx"))
    a = grid.select(F.col("etype").alias("type_a"),
                    F.col("day_idx").alias("_day_a"),
                    F.col("r").alias("_x"))
    j = (a.join(b, "_day_a")
         .where(F.col("type_a") != F.col("type_b")))
    per = (j.groupBy("type_a", "type_b", "lag")
           .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                F.sum("_x").cast("long").alias("sx"),
                F.sum("_y").cast("long").alias("sy"),
                F.sum(F.col("_x") * F.col("_y")).cast("long")
                .alias("sxy"))
           .withColumn("cov_num",
                       F.expr("CAST(CAST(n_days AS DECIMAL(38,0))"
                              " * sxy - CAST(sx AS DECIMAL(38,0))"
                              " * sy AS BIGINT)")))
    w = Window.partitionBy("type_a", "type_b").orderBy(
        F.col("cov_num").desc(), F.col("lag").asc())
    return (per.withColumn("is_best",
                           (F.row_number().over(w) == 1).cast("int"))
            .select("type_a", "type_b", "lag", "n_days", "sx",
                    "sy", "sxy", "cov_num", "is_best"))


def ols_trend(events: DataFrame) -> DataFrame:
    """Exact OLS linear trend of each event type's daily volume —
    the CLASSICAL companion to theil_sen_trend over the same
    _day_grid: OLS is the textbook estimate every dashboard draws,
    Theil-Sen is the robust one, and the GAP between the two slopes
    is itself the outlier-day alarm (a single crawler-trap day drags
    OLS, never the median-of-slopes).

    Everything stays in exact integer rationals of the base sums
    (n, Sx, Sy, Sxy, Sxx, Syy over day index x and volume y):

        slope_micro6     = 1e6 * (n*Sxy - Sx*Sy) div (n*Sxx - Sx^2)
        intercept_micro6 = 1e6 * (Sy*Sxx - Sx*Sxy) div (n*Sxx - Sx^2)
        r2_micro6        = 1e6 * (n*Sxy - Sx*Sy)^2
                           div ((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    in DECIMAL(38,0)/HUGEINT (the squared covariance numerator
    overflows BIGINT past ~1e5-event days).  Degenerate cases
    (single day, constant series) emit 0 with the guards visible.

    Output per event type: (etype, n_days, sum_y, slope_micro6,
    intercept_micro6, r2_micro6).

    Scale shape: the shared bounded _day_grid, then ONE aggregate
    per type — no joins, no additional windows.
    """
    grid = _day_grid(events)
    w0 = Window.partitionBy("etype")
    g = grid.withColumn("_x", (F.col("day_idx")
                               - F.min("day_idx").over(w0))
                        .cast("long"))
    per = g.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("r").cast("long").alias("sum_y"),
        F.sum(F.col("_x") * F.col("r")).cast("long").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_sxx"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("_syy"))
    return per.select(
        "etype", "n_days", "sum_y",
        F.expr(
            "CASE WHEN n_days * _sxx - _sx * _sx > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (n_days * _sxy - _sx * sum_y))"
            " div (n_days * _sxx - _sx * _sx) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END").alias("slope_micro6"),
        F.expr(
            "CASE WHEN n_days * _sxx - _sx * _sx > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (sum_y * _sxx - _sx * _sxy))"
            " div (n_days * _sxx - _sx * _sx) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END").alias("intercept_micro6"),
        F.expr(
            "CASE WHEN n_days * _sxx - _sx * _sx > 0 AND"
            " n_days * _syy - sum_y * sum_y > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (n_days * _sxy - _sx * sum_y)"
            " * (n_days * _sxy - _sx * sum_y))"
            " div (CAST(n_days * _sxx - _sx * _sx"
            " AS DECIMAL(38,0))"
            " * (n_days * _syy - sum_y * sum_y)) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END").alias("r2_micro6"))
