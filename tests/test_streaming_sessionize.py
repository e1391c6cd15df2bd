"""Stream==batch parity for gap-based sessionization
(continuation batch 76: streaming/stateful.incremental_sessionize,
twin of operators/events.sessionize)."""

from __future__ import annotations


def _current_sessions(spark, out_dir):
    """Max-ver row per (user_id, session_id) = the live sessions."""
    from pyspark.sql import Window, functions as F

    df = spark.read.parquet(out_dir)
    w = Window.partitionBy("user_id", "session_id")
    return (df.withColumn("_mx", F.max("ver").over(w))
            .where(F.col("ver") == F.col("_mx"))
            .select("user_id", "session_id", "n_events",
                    F.expr("last_us div 1000000 - first_us div 1000000")
                    .cast("long").alias("duration_sec")))


def _batch_sessions(spark, events):
    from ehr_relation_extraction_spark.operators.events import (
        sessionize)
    from pyspark.sql import functions as F

    return sessionize(events).select(
        "user_id", F.col("session_id").cast("int").alias("session_id"),
        "n_events", "duration_sec")


def test_incremental_sessionize(spark, tmp_path):
    """The max-ver state rows equal batch sessionize after each
    in-order feed and across a checkpointed restart; re-running on a
    drained checkpoint is a no-op."""
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_sessionize)
    from pyspark.sql import functions as F

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    us = "unix_micros(cast(ts as timestamp))"
    cut = events.agg(
        F.expr(f"percentile_approx({us}, 0.6)")).first()[0]
    a = events.where(F.expr(f"{us} <= {cut}"))
    b = events.where(F.expr(f"{us} > {cut}"))
    src = str(tmp_path / "events_src")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    a.repartition(4).write.mode("append").parquet(src)

    q = incremental_sessionize(spark, src, out, ckpt)
    q.awaitTermination(300)
    got = sorted(map(tuple, _current_sessions(spark, out).collect()))
    assert got == sorted(map(tuple,
                             _batch_sessions(spark, a).collect()))
    assert got

    # second feed: later events extend open sessions and open new ones
    b.repartition(3).write.mode("append").parquet(src)
    q2 = incremental_sessionize(spark, src, out, ckpt)
    q2.awaitTermination(300)
    got2 = sorted(map(tuple, _current_sessions(spark, out).collect()))
    want2 = sorted(map(tuple, _batch_sessions(spark, events).collect()))
    assert got2 == want2
    assert len(got2) >= len(got)

    # idempotent restart: nothing new to process, table unchanged
    q3 = incremental_sessionize(spark, src, out, ckpt)
    q3.awaitTermination(300)
    got3 = sorted(map(tuple, _current_sessions(spark, out).collect()))
    assert got3 == want2
