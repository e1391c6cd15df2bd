"""Cross-engine parity + serial ground truth for continuation
batch 109 (functions/textstats.roc_auc)."""

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

    ok, msg = compare(QUERIES["quality_auc"](spark, SF),
                      con.sql(ORACLE["quality_auc"]).df())
    assert ok, msg


def _serial_auc(pairs):
    """O(n_pos * n_neg) definition: mean over positive x negative
    pairs of 1/0.5/0 — scaled to u2 integers."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    u2 = 0
    for p in pos:
        for n in neg:
            if p > n:
                u2 += 2
            elif p == n:
                u2 += 1
    return (len(pos), len(neg), u2,
            (1000000 * u2) // (2 * len(pos) * len(neg)))


@pytest.mark.parametrize("pairs,expect_auc", [
    # perfect separation
    ([(10, 1), (9, 1), (2, 0), (1, 0)], 1000000),
    # perfect inversion
    ([(1, 1), (2, 1), (9, 0), (10, 0)], 0),
    # all tied -> chance level
    ([(5, 1), (5, 1), (5, 0), (5, 0)], 500000),
])
def test_known_auc_values(spark, pairs, expect_auc):
    from ehr_relation_extraction_spark.functions.textstats import roc_auc

    df = spark.createDataFrame(pairs, ["score", "pos"])
    row = roc_auc(df).collect()[0]
    assert row.auc_micro6 == expect_auc
    assert (row.n_pos, row.n_neg, row.u2, row.auc_micro6) == \
        _serial_auc(pairs)


def test_matches_quadratic_definition(spark):
    """Deterministic mixed fixture with heavy ties: the histogram
    rank-sum must equal the O(n^2) pairwise definition exactly."""
    from ehr_relation_extraction_spark.functions.textstats import roc_auc

    pairs = [((i * 7919) % 23, 1 if (i * 104729) % 3 == 0 else 0)
             for i in range(200)]
    df = spark.createDataFrame(pairs, ["score", "pos"])
    row = roc_auc(df).collect()[0]
    assert (row.n_pos, row.n_neg, row.u2, row.auc_micro6) == \
        _serial_auc(pairs)
