"""Skew hardening: the Zipfian-host fixture (host 0 holds ~half the
pages) must spread evenly after salted repartition, and per-key caps
must bound the pair blow-up deterministically."""

from __future__ import annotations

from pyspark.sql import functions as F

from ehr_relation_extraction_spark.operators.skew import (
    cap_per_key, key_histogram, salted_repartition)
from ehr_relation_extraction_spark.oracle.fixtures import pages_df


def test_fixture_is_skewed(spark):
    pages = pages_df(spark, n_pages=100)
    hist = key_histogram(
        pages.withColumn("host", F.substring_index(
            F.substring_index("url", "//", -1), "/", 1)), "host").collect()
    assert hist[0]["n"] >= 40  # one hot host


def test_salted_repartition_balances(spark):
    pages = pages_df(spark, n_pages=400)
    # cluster by host first (the adversarial input layout)
    clustered = pages.repartition(8, "url")
    salted = salted_repartition(clustered, "url", num_partitions=8)
    sizes = [r["n"] for r in salted.groupBy(F.spark_partition_id().alias("p"))
             .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(sizes) == 8
    mean = sum(sizes) / len(sizes)
    # hot host is ~50% of rows; after salting no partition may hold it
    assert max(sizes) <= 2 * mean and min(sizes) >= mean / 4


def test_salted_repartition_preserves_rows(spark):
    pages = pages_df(spark, n_pages=60)
    assert salted_repartition(pages, "url").count() == 60


def test_cap_per_key_deterministic(spark):
    df = spark.createDataFrame(
        [("u1", i) for i in range(50)] + [("u2", i) for i in range(3)],
        "url string, start int")
    capped = cap_per_key(df, ["url"], ["start"], 10)
    got = {(r["url"], r["start"]) for r in capped.collect()}
    assert got == {("u1", i) for i in range(10)} | {("u2", i) for i in range(3)}
