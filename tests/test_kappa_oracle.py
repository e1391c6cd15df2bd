"""Cross-engine parity + serial ground truth for continuation
batch 110 (functions/textstats.cohen_kappa)."""

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

    ok, msg = compare(QUERIES["langid_kappa"](spark, SF),
                      con.sql(ORACLE["langid_kappa"]).df())
    assert ok, msg


def _serial_kappa(pairs):
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    labels = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    pe_num = sum(
        sum(1 for a, _ in pairs if a == c)
        * sum(1 for _, b in pairs if b == c) for c in labels)
    if n * n == pe_num:
        k = 1000000
    else:
        num = 1000000 * (n * agree - pe_num)
        den = n * n - pe_num
        k = int(num / den) if num < 0 else num // den  # trunc to zero
    return n, agree, pe_num, k


@pytest.mark.parametrize("pairs", [
    # perfect agreement, 3 labels
    [("x", "x")] * 4 + [("y", "y")] * 3 + [("z", "z")] * 2,
    # systematic disagreement (kappa < 0)
    [("x", "y")] * 5 + [("y", "x")] * 5,
    # skewed marginals: high raw accuracy, modest kappa
    [("x", "x")] * 90 + [("x", "y")] * 5 + [("y", "x")] * 3
    + [("y", "y")] * 2,
    # both raters constant -> pe == 1 -> sentinel 1e6
    [("x", "x")] * 7,
])
def test_matches_serial_kappa(spark, pairs):
    from ehr_relation_extraction_spark.functions.textstats import (
        cohen_kappa)

    df = spark.createDataFrame(pairs, ["a", "b"])
    row = cohen_kappa(df).collect()[0]
    assert (row.n_items, row.n_agree, row.pe_num,
            row.kappa_micro6) == _serial_kappa(pairs)


def test_kappa_below_accuracy_on_skew(spark):
    """The reason kappa exists: with a dominant class, chance
    agreement is high, so kappa must land well under raw accuracy."""
    from ehr_relation_extraction_spark.functions.textstats import (
        cohen_kappa)

    pairs = [("x", "x")] * 90 + [("x", "y")] * 5 + [("y", "x")] * 3 \
        + [("y", "y")] * 2
    row = cohen_kappa(spark.createDataFrame(pairs, ["a", "b"])) \
        .collect()[0]
    acc_micro6 = 1000000 * row.n_agree // row.n_items
    assert row.kappa_micro6 < acc_micro6 - 400000
