"""Cross-engine parity + serial ground truth for continuation
batch 193 (functions/textstats.chao1_richness)."""

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

    ok, msg = compare(QUERIES["chao1_richness"](spark, SF),
                      con.sql(ORACLE["chao1_richness"]).df())
    assert ok, msg


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def test_hand_checked_estimate(spark):
    """Corpus 'a a b b c d' (two docs): V=4, F1=2 (c, d), F2=2
    (a, b), N=6.  chao1 = 4 + 2*1/(2*3) = 4.333 -> 4333 milli3;
    coverage = 1 - 2/6 -> 666666 micro6."""
    from ehr_relation_extraction_spark.functions.textstats import (
        chao1_richness)

    r = chao1_richness(
        _docs(spark, ["a a b", "b c d"])).collect()[0]
    assert r.n_tokens == 6 and r.vocab == 4
    assert r.f1 == 2 and r.f2 == 2
    assert r.chao1_milli3 == 4000 + 2000 // 6
    assert r.coverage_micro6 == 666666


def test_no_singletons_means_full_coverage(spark):
    """Every type seen twice: F1=0 -> chao1 == V exactly and
    coverage == 1."""
    from ehr_relation_extraction_spark.functions.textstats import (
        chao1_richness)

    r = chao1_richness(_docs(spark, ["x y", "y x"])).collect()[0]
    assert r.vocab == 2 and r.f1 == 0
    assert r.chao1_milli3 == 2000
    assert r.coverage_micro6 == 1000000


def test_case_folding_merges_types(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        chao1_richness)

    r = chao1_richness(_docs(spark, ["Foo foo FOO"])).collect()[0]
    assert r.vocab == 1 and r.n_tokens == 3 and r.f1 == 0


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        chao1_richness)

    texts = ["a b c d e", "a a f g", "h h h i", "j k l a b"]
    one = chao1_richness(_docs(spark, texts).coalesce(1)).collect()
    many = chao1_richness(_docs(spark, texts).repartition(5)).collect()
    assert sorted(one) == sorted(many)
