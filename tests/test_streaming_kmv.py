"""Stream==batch parity for the per-host KMV sketches
(continuation batch 62: streaming/stateful.incremental_kmv, twin of
functions/sketches.kmv_sketch)."""

from __future__ import annotations


def _current_sketch(spark, out_dir):
    """Latest-version rows per group = the live sketch table."""
    from pyspark.sql import Window, functions as F

    df = spark.read.parquet(out_dir)
    w = Window.partitionBy("grp")
    return (df.withColumn("_mx", F.max("ver").over(w))
            .where(F.col("ver") == F.col("_mx"))
            .select("grp", "rank", "hval"))


def test_incremental_kmv(spark, tmp_path):
    """The max-ver state rows equal the batch kmv_sketch after each
    incremental feed, across a checkpointed restart (bottom-k
    semilattice merge)."""
    from ehr_relation_extraction_spark.functions.sketches import (
        kmv_sketch)
    from ehr_relation_extraction_spark.operators import ner
    from ehr_relation_extraction_spark.operators.linking import (
        gazetteer_df, link_mentions)
    from ehr_relation_extraction_spark.sources.pages import (
        extract_text, pages_from_documents)
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_kmv)
    from pyspark.sql import functions as F

    raw = pages_from_documents(spark, "/root/testdata/sf0.001")
    a = raw.where("doc_id % 2 = 0")
    b = raw.where("doc_id % 2 = 1")
    src = str(tmp_path / "pages_src")
    out = str(tmp_path / "kmv_out")
    ckpt = str(tmp_path / "kmv_ckpt")
    a.repartition(4).write.mode("append").parquet(src)

    def batch_sketch(pages_raw):
        linked = link_mentions(
            ner.detect_mentions_df(extract_text(pages_raw),
                                   with_ids=False),
            gazetteer_df(spark))
        he = linked.select(
            F.regexp_extract("url", r"^https?://([^/]*)", 1)
            .alias("host"), "canonical_id")
        return kmv_sketch(he, "host", "canonical_id")

    q = incremental_kmv(spark, src, out, ckpt)
    q.awaitTermination(300)
    got = sorted(map(tuple, _current_sketch(spark, out).collect()))
    assert got == sorted(map(tuple, batch_sketch(a).collect()))
    assert got

    b.repartition(3).write.mode("append").parquet(src)
    q2 = incremental_kmv(spark, src, out, ckpt)
    q2.awaitTermination(300)
    got2 = sorted(map(tuple, _current_sketch(spark, out).collect()))
    assert got2 == sorted(map(tuple, batch_sketch(raw).collect()))

    # monotone state: the union sketch's k-th min never exceeds the
    # first feed's per-host k-th min (bottom-k only improves)
    kth1 = {}
    for g, _, h in got:
        kth1[g] = max(kth1.get(g, 0), h)
    kth2 = {}
    for g, _, h in got2:
        kth2[g] = max(kth2.get(g, 0), h)
    assert all(kth2.get(g, 0) <= v for g, v in kth1.items()
               if len([1 for x in got2 if x[0] == g]) == 8)


def test_incremental_kmv_idempotent_restart(spark, tmp_path):
    """Re-running on the same checkpoint with no new files emits
    nothing new (the changed-only emission) and leaves the sketch
    identical."""
    from ehr_relation_extraction_spark.sources.pages import (
        pages_from_documents)
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_kmv)

    raw = pages_from_documents(spark, "/root/testdata/sf0.001") \
        .where("doc_id % 7 = 0")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    raw.write.mode("append").parquet(src)

    incremental_kmv(spark, src, out, ckpt).awaitTermination(300)
    first = sorted(map(tuple, _current_sketch(spark, out).collect()))
    n_rows = spark.read.parquet(out).count()

    incremental_kmv(spark, src, out, ckpt).awaitTermination(300)
    assert sorted(map(tuple,
                      _current_sketch(spark, out).collect())) == first
    assert spark.read.parquet(out).count() == n_rows
