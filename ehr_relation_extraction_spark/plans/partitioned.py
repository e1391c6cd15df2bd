"""Day-partitioned triple store writes + partition pruning.

SURVEY §7.0's production layout partitions the triple tables by
``days(warc_ts)`` (Iceberg transform).  The Spark-native parquet form
is a materialized ``day_idx`` column + ``partitionBy("day_idx")``:
a time-ranged query then prunes to the matching directories at scan
planning time — the scan's ``PartitionFilters`` carries the predicate
and untouched days are never opened (asserted in tests/test_plans.py).
At 100 TB with ~daily crawls this is the difference between scanning
one day and scanning three years.

Compaction: a long-running incremental writer accretes small files;
``compact_partitions`` rewrites a day's files to a bounded count —
the parquet stand-in for Iceberg's rewrite_data_files maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: epoch seconds of the synthetic crawl's day-0 (fixtures derive
#: warc_ts as 2024-01-01 + doc_id seconds)
CRAWL_EPOCH = 1704067200


def with_day_idx(df: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """Materialize the integer crawl-day partition key."""
    return df.withColumn(
        "day_idx",
        F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
        .cast("int"))


def write_day_partitioned(df: DataFrame, path: str) -> None:
    """Write a day_idx-partitioned parquet table (one directory per
    crawl day — the pruning unit)."""
    df.write.mode("overwrite").partitionBy("day_idx").parquet(path)


def read_day(spark: SparkSession, path: str, day_idx: int) -> DataFrame:
    """Read one crawl day; the filter becomes a PartitionFilter, so
    only that day's directory is listed/scanned."""
    return spark.read.parquet(path).where(F.col("day_idx") == day_idx)


def compact_partitions(spark: SparkSession, path: str,
                       target_files_per_day: int = 1) -> None:
    """Rewrite each day partition down to a bounded file count (the
    small-files maintenance job).  Data is bit-identical afterwards;
    only the file layout changes.

    Repartitioning hashes on (day_idx, bucket) where bucket spreads
    each day's rows over ``target_files_per_day`` deterministic hash
    buckets — hashing on day_idx alone would land every day in ONE
    task and silently ignore targets > 1.  The swap parks the old tree
    aside before promoting the compacted one, so a crash between the
    two steps leaves a recoverable copy (``._old``) instead of no
    table; object stores would use a manifest/catalog swap instead —
    Iceberg does this natively."""
    df = spark.read.parquet(path)
    bucket = F.pmod(F.xxhash64(*[c for c in df.columns if c != "day_idx"]),
                    F.lit(target_files_per_day))
    n_days = max(df.select("day_idx").distinct().count(), 1)
    (df.repartition(n_days * target_files_per_day, "day_idx", bucket)
     .write.mode("overwrite").partitionBy("day_idx")
     .parquet(path + "._compacted"))
    import shutil

    shutil.move(path, path + "._old")          # park, don't destroy
    shutil.move(path + "._compacted", path)    # promote
    shutil.rmtree(path + "._old")              # cleanup last
