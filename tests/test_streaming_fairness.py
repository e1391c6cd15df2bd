"""Stream==batch parity for the shard-fairness monitor
(continuation batch 174: streaming/stream.incremental_fairness,
twin of functions/textstats.jain_fairness)."""

from __future__ import annotations


def test_incremental_fairness(spark, tmp_path):
    """The complete-mode count state folded by fairness_from_counts
    equals the batch jain_fairness after each incremental feed, and
    the checkpoint-resumed restart absorbs only the new files
    (additive counts)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        jain_fairness)
    from ehr_relation_extraction_spark.streaming.stream import (
        fairness_from_counts, incremental_fairness)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "fair_ckpt")
    a.repartition(4).write.mode("append").parquet(src)

    q = incremental_fairness(spark, src, ckpt, query_name="fair_t1")
    q.awaitTermination(300)
    got = sorted(map(tuple, fairness_from_counts(
        spark.sql("SELECT * FROM fair_t1").localCheckpoint())
        .collect()))
    assert got == sorted(map(tuple, jain_fairness(a).collect()))
    assert len(got) == 3

    b.repartition(3).write.mode("append").parquet(src)
    q2 = incremental_fairness(spark, src, ckpt, query_name="fair_t2")
    q2.awaitTermination(300)
    got2 = sorted(map(tuple, fairness_from_counts(
        spark.sql("SELECT * FROM fair_t2").localCheckpoint())
        .collect()))
    assert got2 == sorted(map(tuple,
                              jain_fairness(docs).collect()))
    # the full-corpus fold differs from the half-corpus one (the
    # resume genuinely absorbed the second feed)
    assert got2 != got
