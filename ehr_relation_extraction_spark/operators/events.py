"""Windowed aggregation over the events table (batch form of the
streaming rollup in streaming/stream.py — same grouping logic, so the
batch oracle also validates the foreachBatch path).

Float note: sums are emitted at cent precision (floor(sum * 100));
min/max are raw parquet values (no arithmetic), exact in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    win = F.date_trunc("hour", F.col("ts"))
    return (events.groupBy(
                F.date_format(win, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.floor(F.sum("value") * 100).cast("long").alias("sum_value_x100"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value")))
