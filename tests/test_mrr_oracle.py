"""Cross-engine parity + serial ground truth for continuation
batch 196 (functions/textstats.mrr_eval)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["mrr_eval"](spark, SF),
                      con.sql(ORACLE["mrr_eval"]).df())
    assert ok, msg


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _terms(spark, words):
    return spark.createDataFrame([(w,) for w in words],
                                 "alias string")


def test_length_penalty_demotes_best_attestor(spark):
    """doc 0 has the most 'key' tokens but is padded very long, so
    BM25's length normalization ranks the shorter doc 1 first: the
    ideal head (doc 0) sits at BM25 rank 2 -> rr = 500000,
    hit1 = 0, hit5 = 1."""
    from ehr_relation_extraction_spark.functions.textstats import (
        mrr_eval)

    pad = " ".join(["filler"] * 200)
    texts = ["key key key key " + pad,
             "key key other",
             "other other"]
    r = {x.term: x for x in
         mrr_eval(_docs(spark, texts),
                  _terms(spark, ["key"])).collect()}["key"]
    assert r.best_doc == 0
    assert r.best_rank == 2
    assert r.rr_micro6 == 500000
    assert r.hit1 == 0 and r.hit5 == 1
    assert r.overlap5 == 2  # both matching docs in both top-5 sets
    assert r.n_terms == 1 and r.mrr_micro6 == 500000


def test_agreeing_ranking_is_perfect(spark):
    """Equal-length docs: BM25 order == tf order, so MRR = 1."""
    from ehr_relation_extraction_spark.functions.textstats import (
        mrr_eval)

    texts = ["w w w a b", "w w a b c", "w a b c d"]
    r = mrr_eval(_docs(spark, texts),
                 _terms(spark, ["w"])).collect()[0]
    assert r.best_rank == 1 and r.rr_micro6 == 1000000
    assert r.hit1 == 1 and r.hits1_micro6 == 1000000


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        mrr_eval)

    texts = ["key key pad pad pad", "key other", "pad key key key",
             "other other key"]
    d = _docs(spark, texts)
    t = _terms(spark, ["key", "other"])
    one = mrr_eval(d.coalesce(1), t).collect()
    many = mrr_eval(d.repartition(5), t).collect()
    key = lambda r: r.term
    assert sorted(one, key=key) == sorted(many, key=key)
