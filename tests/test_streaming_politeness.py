"""Stream==batch parity for the stateful politeness monitor
(continuation batch 175: streaming/stateful.incremental_politeness,
twin of functions/urls.politeness_audit)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _latest(spark, out_dir):
    df = spark.read.parquet(out_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(F.col("ver").desc())
    return {r.host: (r.n_fetches, r.max_burst, r.min_gap_s,
                     r.max_rate_milli)
            for r in df.withColumn("_r", F.row_number().over(w))
            .where("_r = 1").collect()}


def _batch(pages):
    from ehr_relation_extraction_spark.functions.urls import (
        politeness_audit)

    return {r.host: (r.n_fetches, r.max_burst, r.min_gap_s,
                     r.max_rate_milli)
            for r in politeness_audit(pages).collect()}


def test_incremental_politeness(spark, tmp_path):
    """Event-time-ordered feeds (first half of the crawl clock, then
    the second): after each feed the max-ver snapshot per host
    equals the batch politeness_audit over everything fed so far,
    including bursts that SPAN the feed boundary (the state carries
    the trailing window across the restart)."""
    from ehr_relation_extraction_spark.sources.pages import (
        pages_from_documents)
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_politeness)

    raw = pages_from_documents(spark, "/root/testdata/sf0.001") \
        .select("doc_id", "url", "warc_ts", "html", "lang")
    cut = 250  # doc_id == crawl second: a clean event-time split
    a = raw.where(F.col("doc_id") < cut)
    b = raw.where(F.col("doc_id") >= cut)
    src = str(tmp_path / "pages_src")
    out = str(tmp_path / "polite_out")
    ckpt = str(tmp_path / "polite_ckpt")
    a.coalesce(1).write.mode("append").parquet(src)

    q = incremental_politeness(spark, src, out, ckpt)
    q.awaitTermination(300)
    assert _latest(spark, out) == _batch(a)

    b.coalesce(1).write.mode("append").parquet(src)
    q2 = incremental_politeness(spark, src, out, ckpt)
    q2.awaitTermination(300)
    got = _latest(spark, out)
    assert got == _batch(raw)
    # the boundary matters: some host's max burst grew across feeds
    assert got != _batch(a)
