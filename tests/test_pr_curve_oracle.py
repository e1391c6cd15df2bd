"""Cross-engine parity + serial ground truth for continuation
batch 159 (functions/textstats.pr_curve)."""

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

    ok, msg = compare(QUERIES["pr_curve"](spark, SF),
                      con.sql(ORACLE["pr_curve"]).df())
    assert ok, msg


def _curve(spark, labels_by_rank):
    """labels_by_rank: y values in descending-score order (scores
    are 100, 99, 98, ... so the ranking is exactly this order)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        pr_curve)

    rows = [(i, 100 - i, y) for i, y in enumerate(labels_by_rank)]
    df = spark.createDataFrame(rows, ["doc_id", "score", "pos"])
    return {r.recall_decile: (r.k, r.prec_num, r.prec_den,
                              r.prec_micro6)
            for r in pr_curve(df).collect()}


def test_engineered_interpolation(spark):
    """Ranking +,-,+,- (P=2): recall 0.5 is first reached at k=1
    with precision 1/1; recall 1.0 at k=3 with precision 2/3 — and
    the INTERPOLATED precision at deciles 6..10 is 2/3 (the max over
    later cutoffs), while deciles 0..5 take the k=1 perfect hit."""
    got = _curve(spark, [1, 0, 1, 0])
    for j in range(0, 6):
        assert got[j] == (1, 1, 1, 1_000_000), j
    for j in range(6, 11):
        assert got[j] == (3, 2, 3, 666_666), j


def test_sawtooth_max_not_running(spark):
    """Ranking -,+,+ (P=2): precision at k=2 is 1/2, at k=3 is 2/3 —
    interpolation must take the LATER, HIGHER point for every
    decile (max over qualifying cutoffs, not first-qualifying):
    even decile 1 (recall 0.1) reports 2/3, never 1/2."""
    got = _curve(spark, [0, 1, 1])
    for j in range(11):
        assert got[j] == (3, 2, 3, 666_666), j


def test_all_positive(spark):
    """All-positive ranking: precision 1 at every decile, k minimal
    for each recall requirement (ties on the key pick smallest k)."""
    got = _curve(spark, [1, 1])
    assert got[0] == (1, 1, 1, 1_000_000)
    assert got[10] == (2, 2, 2, 1_000_000)
    assert got[5] == (1, 1, 1, 1_000_000)
