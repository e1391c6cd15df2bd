"""Bloom-filter sketch (functions/sketches.bloom_*): cross-engine
parity with the DuckDB oracle, the mergeability law, the
no-false-negative guarantee, and partition invariance."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_bloom_bits_oracle(spark, con, docs):
    from ehr_relation_extraction_spark.functions.sketches import (
        bloom_eval_sketch)
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(bloom_eval_sketch(docs),
                      con.sql(ORACLE["bloom_bits"]).df())
    assert ok, msg


def test_bloom_decontam_oracle(spark, con, docs):
    from ehr_relation_extraction_spark.functions.sketches import (
        bloom_decontaminate)
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(bloom_decontaminate(docs),
                      con.sql(ORACLE["bloom_decontam"]).df())
    assert ok, msg


def test_bloom_merge_law(spark, docs):
    """sketch(A union B) == merge(sketch(A), sketch(B)) exactly —
    bit_or is associative/commutative/idempotent, so the shard-split
    never changes the filter."""
    from ehr_relation_extraction_spark.functions.sketches import (
        bloom_merge, bloom_words)
    from ehr_relation_extraction_spark.operators.dedup import shingles

    sh = shingles(docs).select("shingle")
    full = sorted(map(tuple, bloom_words(sh, "shingle").collect()))
    halves = bloom_merge(
        bloom_words(shingles(docs.where("doc_id % 2 = 0"))
                    .select("shingle"), "shingle"),
        bloom_words(shingles(docs.where("doc_id % 2 = 1"))
                    .select("shingle"), "shingle"))
    assert sorted(map(tuple, halves.collect())) == full


def test_bloom_no_false_negatives(spark, docs):
    """Every item that WAS inserted must test positive, and the
    verdict columns keep n_flagged >= n_true_hits on every doc."""
    from ehr_relation_extraction_spark.functions.sketches import (
        bloom_decontaminate, bloom_eval_sketch, bloom_lookup)
    from ehr_relation_extraction_spark.operators.dedup import shingles

    sketch = bloom_eval_sketch(docs)
    inserted = (shingles(docs.where("doc_id % 17 = 0"))
                .select("shingle").dropDuplicates())
    tested = bloom_lookup(sketch, inserted, "shingle")
    assert tested.where("maybe <> 1").count() == 0
    bad = bloom_decontaminate(docs).where("n_flagged < n_true_hits")
    assert bad.count() == 0


def test_bloom_partition_invariance(spark, docs):
    from ehr_relation_extraction_spark.functions.sketches import (
        bloom_eval_sketch)

    a = sorted(map(tuple, bloom_eval_sketch(docs).collect()))
    b = sorted(map(tuple, bloom_eval_sketch(
        docs.repartition(13, "doc_id")).collect()))
    assert a == b
