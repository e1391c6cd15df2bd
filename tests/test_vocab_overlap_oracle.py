"""Cross-engine parity + serial ground truth for continuation
batch 169 (functions/textstats.lang_vocab_overlap)."""

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

    ok, msg = compare(QUERIES["lang_vocab_overlap"](spark, SF),
                      con.sql(ORACLE["lang_vocab_overlap"]).df())
    assert ok, msg


def test_engineered_overlap(spark):
    """en vocab {the, cat, dog, house}, de vocab {the, Cat, haus}
    (lowercased -> {the, cat, haus}): intersection {the, cat} = 2,
    union = 5, Jaccard 0.4; containment 2/4 vs 2/3.  A disjoint
    lang pair emits NO row (inner join semantics)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        lang_vocab_overlap)

    rows = [
        (0, "the cat dog house", "en", "s", 17),
        (1, "the Cat haus", "de", "s", 12),
        (2, "xyz qqq", "zh", "s", 7),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {(r.lang_a, r.lang_b): (r.v_a, r.v_b, r.n_common,
                                  r.jaccard_micro6,
                                  r.contain_a_micro6,
                                  r.contain_b_micro6)
           for r in lang_vocab_overlap(df).collect()}
    assert got == {("de", "en"): (3, 4, 2, 400_000, 666_666,
                                  500_000)}
