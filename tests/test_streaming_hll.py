"""Stream==batch parity for the per-day entity-HLL sketches
(continuation batch 54: streaming/stream.incremental_entity_hll,
twin of functions/sketches.rolling_hll_estimates)."""

from __future__ import annotations


def test_incremental_entity_hll(spark, tmp_path):
    """The streaming register state post-processed by
    rolling_from_registers equals the batch rolling_hll_estimates
    after each incremental feed, and the checkpoint-resumed restart
    stays consistent (MAX-aggregate idempotence)."""
    from ehr_relation_extraction_spark.functions.sketches import (
        rolling_from_registers, rolling_hll_estimates)
    from ehr_relation_extraction_spark.operators import ner
    from ehr_relation_extraction_spark.operators.linking import (
        gazetteer_df, link_mentions)
    from ehr_relation_extraction_spark.sources.pages import (
        extract_text, pages_from_documents)
    from ehr_relation_extraction_spark.streaming.stream import (
        incremental_entity_hll)
    from pyspark.sql import functions as F

    raw = pages_from_documents(spark, "/root/testdata/sf0.001")
    a = raw.where("doc_id % 2 = 0")
    b = raw.where("doc_id % 2 = 1")
    src = str(tmp_path / "pages_src")
    ckpt = str(tmp_path / "hll_ckpt")
    a.repartition(4).write.mode("append").parquet(src)

    def batch_estimates(pages_raw):
        linked = link_mentions(
            ner.detect_mentions_df(extract_text(pages_raw),
                                   with_ids=False),
            gazetteer_df(spark))
        items = linked.select(
            ((F.lit(1704067200) + F.col("doc_id")) / 86400)
            .cast("int").alias("day_idx"), "canonical_id")
        return rolling_hll_estimates(items, "day_idx", "canonical_id")

    q = incremental_entity_hll(spark, src, ckpt, query_name="hll_t1")
    q.awaitTermination(300)
    got = sorted(map(tuple, rolling_from_registers(
        spark.sql("SELECT * FROM hll_t1").localCheckpoint()).collect()))
    assert got == sorted(map(tuple, batch_estimates(a).collect()))
    assert got

    b.repartition(3).write.mode("append").parquet(src)
    q2 = incremental_entity_hll(spark, src, ckpt, query_name="hll_t2")
    q2.awaitTermination(300)
    got2 = sorted(map(tuple, rolling_from_registers(
        spark.sql("SELECT * FROM hll_t2").localCheckpoint()).collect()))
    assert got2 == sorted(map(tuple, batch_estimates(raw).collect()))
    assert got2
    # register-level state must have absorbed the second half: the
    # union sketch dominates the first feed's registers rho-wise
    regs2 = {(r.day, r.register): r.rho
             for r in spark.sql("SELECT * FROM hll_t2").collect()}
    regs1 = {(r.day, r.register): r.rho
             for r in spark.sql("SELECT * FROM hll_t1").collect()}
    assert all(regs2.get(k, 0) >= v for k, v in regs1.items())
