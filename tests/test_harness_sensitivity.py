"""Harness sensitivity: the Spark-vs-DuckDB comparison must actually
FAIL when the engine's semantics drift — otherwise green checks prove
nothing.  We inject three distinct fault classes and assert the
comparator catches each."""

from __future__ import annotations

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


def _oracle(name):
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    return ORACLE[name]


def test_detects_semantic_drift(spark):
    """Perturbed gazetteer vs standard oracle -> value mismatch."""
    from ehr_relation_extraction_spark.config import perturbed_gazetteer
    from ehr_relation_extraction_spark.plans.pipeline import build_from_documents

    con = duck_con(SF)
    wrong = build_from_documents(spark, SF, gazetteer=perturbed_gazetteer()) \
        .mentions.select("doc_id", "url", "ent_id", "ent_type", "start",
                         "end", "ent_text")
    ok, msg = compare(wrong, con.sql(_oracle("mentions")).df())
    assert not ok and ("row count" in msg or "col" in msg)
    con.close()


def test_detects_value_corruption(spark):
    """Same row count, one value off by one -> caught."""
    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark import driver_queries as dq

    con = duck_con(SF)
    df = dq.QUERIES["tokenize"](spark, SF).withColumn(
        "char_end",
        F.when(F.col("tok_idx") == 3, F.col("char_end") + 1)
         .otherwise(F.col("char_end")))
    ok, msg = compare(df, con.sql(_oracle("tokenize")).df())
    assert not ok and "char_end" in msg
    con.close()


def test_detects_parameter_drift(spark):
    """A different shard length must break shard/candidate parity."""
    from ehr_relation_extraction_spark.plans.pipeline import build_from_documents

    con = duck_con(SF)
    wrong = build_from_documents(spark, SF, max_len=8).shards.select(
        "doc_id", "url", "shard_id", "tok_start", "tok_end",
        "char_start", "char_end", "re_start", "re_end", "n_tokens")
    ok, _ = compare(wrong, con.sql(_oracle("shards")).df())
    assert not ok
    con.close()
