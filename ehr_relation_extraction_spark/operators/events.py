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
