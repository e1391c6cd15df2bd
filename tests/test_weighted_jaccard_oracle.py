"""Cross-engine parity + serial ground truth for continuation
batch 214 (operators/dedup.weighted_jaccard)."""

from __future__ import annotations

import collections

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

    ok, msg = compare(QUERIES["weighted_jaccard"](spark, SF),
                      con.sql(ORACLE["weighted_jaccard"]).df())
    assert ok, msg


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _pairs(spark, ps):
    return spark.createDataFrame(ps, "doc_a long, doc_b long")


def test_bag_semantics_separate_emphasis(spark):
    """Same vocabulary, different counts: the SET Jaccard would be
    1.0, the weighted form must charge the emphasis gap exactly:
    a = 3x'w' + 1x'q', b = 1x'w' + 3x'q' -> min-sum 2, max-sum 6."""
    from ehr_relation_extraction_spark.operators.dedup import (
        weighted_jaccard)

    d = _docs(spark, ["w w w q", "w q q q"])
    r = weighted_jaccard(_pairs(spark, [(0, 1)]), d).collect()[0]
    assert r.inter_w == 1 + 1  # min(3,1) + min(1,3)
    assert r.union_w == 3 + 3
    assert r.wjaccard_micro6 == 1000000 * 2 // 6


def test_python_replica(spark):
    from ehr_relation_extraction_spark.operators.dedup import (
        weighted_jaccard)

    t0 = "a b b c c c d"
    t1 = "b c c e e a a a"
    d = _docs(spark, [t0, t1])
    r = weighted_jaccard(_pairs(spark, [(0, 1)]), d).collect()[0]
    ca, cb = collections.Counter(t0.split()), \
        collections.Counter(t1.split())
    inter = sum(min(ca[w], cb[w]) for w in set(ca) & set(cb))
    union = sum(ca.values()) + sum(cb.values()) - inter
    assert (r.inter_w, r.union_w) == (inter, union)
    assert r.wjaccard_micro6 == 1000000 * inter // union


def test_disjoint_pair_zero(spark):
    from ehr_relation_extraction_spark.operators.dedup import (
        weighted_jaccard)

    d = _docs(spark, ["x y z", "p q r"])
    r = weighted_jaccard(_pairs(spark, [(0, 1)]), d).collect()[0]
    assert r.inter_w == 0 and r.wjaccard_micro6 == 0
    assert r.union_w == 6


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.operators.dedup import (
        weighted_jaccard)

    texts = ["a a b c", "a b b c c", "c c c d", "a a b c"]
    d = _docs(spark, texts)
    ps = _pairs(spark, [(0, 1), (0, 3), (2, 3), (1, 2)])
    one = weighted_jaccard(ps, d.coalesce(1)).collect()
    many = weighted_jaccard(ps.repartition(3),
                            d.repartition(5)).collect()
    key = lambda r: (r.doc_a, r.doc_b)
    assert sorted(one, key=key) == sorted(many, key=key)
