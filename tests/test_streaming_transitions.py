"""Stream==batch parity for the session-transition stream
(continuation batch 136: streaming/stateful.incremental_transitions,
twin of the transition table inside operators/events.transition_gini)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F


def _batch_transitions(events):
    """The batch transition table — the same construction
    transition_gini uses internally."""
    secs = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (events.withColumn("_sec", secs)
         .withColumn("_new",
                     (F.lag("_sec").over(w).isNull()
                      | (F.col("_sec") - F.lag("_sec").over(w)
                         > 30 * 60)).cast("int"))
         .withColumn("session_id",
                     F.sum("_new").over(
                         w.rowsBetween(Window.unboundedPreceding, 0))))
    ws = Window.partitionBy("user_id", "session_id") \
        .orderBy("ts", "event_id")
    return (s.select("user_id",
                     F.col("event_type").alias("prev_type"),
                     F.lead("event_type").over(ws).alias("next_type"))
            .where(F.col("next_type").isNotNull())
            .groupBy("user_id", "prev_type", "next_type").count())


def test_incremental_transitions(spark, tmp_path):
    """Streamed transition counts equal the batch construction after
    each in-order feed, across a checkpointed restart; a drained
    re-run adds nothing."""
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_transitions)

    events = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet")
    us = "unix_micros(cast(ts as timestamp))"
    cut = events.agg(
        F.expr(f"percentile_approx({us}, 0.6)")).first()[0]
    a = events.where(F.expr(f"{us} <= {cut}"))
    src = str(tmp_path / "events_src")
    out = str(tmp_path / "tr_out")
    ckpt = str(tmp_path / "tr_ckpt")
    a.repartition(4).write.mode("append").parquet(src)

    q = incremental_transitions(spark, src, out, ckpt)
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.read.parquet(out)
                     .groupBy("user_id", "prev_type", "next_type")
                     .count().collect()))
    assert got == sorted(map(tuple,
                             _batch_transitions(a).collect()))
    assert got

    # the second feed must stitch cross-feed transitions (state
    # carries the last event of feed one into feed two's sessions)
    b = events.where(F.expr(f"{us} > {cut}"))
    b.repartition(3).write.mode("append").parquet(src)
    q2 = incremental_transitions(spark, src, out, ckpt)
    q2.awaitTermination(300)
    got2 = sorted(map(tuple, spark.read.parquet(out)
                      .groupBy("user_id", "prev_type", "next_type")
                      .count().collect()))
    want2 = sorted(map(tuple,
                       _batch_transitions(events).collect()))
    assert got2 == want2

    # drained restart: no new rows
    q3 = incremental_transitions(spark, src, out, ckpt)
    q3.awaitTermination(300)
    assert spark.read.parquet(out).count() == \
        sum(c for *_, c in got2)
