"""Cross-engine parity + serial ground truth for continuation
batch 163 (functions/textstats.spearman_check)."""

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

    ok, msg = compare(QUERIES["spearman_check"](spark, SF),
                      con.sql(ORACLE["spearman_check"]).df())
    assert ok, msg


def _rho(spark, pairs):
    from ehr_relation_extraction_spark.functions.textstats import (
        spearman_check)

    df = spark.createDataFrame(pairs, "x long, y long")
    return spearman_check(df).collect()[0]


def test_perfect_and_reversed(spark):
    """Strictly monotone pairs give rho = +1 / -1 exactly (rho2 =
    1e6 and the matching sign), regardless of the raw spacing —
    rank correlation ignores the magnitudes."""
    up = _rho(spark, [(1, 10), (2, 1000), (3, 1001), (7, 99999)])
    assert (up.rho_sign, up.rho2_micro6) == (1, 1_000_000)
    dn = _rho(spark, [(1, 99999), (2, 1001), (3, 1000), (7, 10)])
    assert (dn.rho_sign, dn.rho2_micro6) == (-1, 1_000_000)


def test_ties_average_ranks(spark):
    """Scipy-checkable tie case: x = (1,2,2,3), y = (10,20,30,40).
    Doubled average ranks: x -> 2,5,5,8; y -> 2,4,6,8.  Serial
    moments: sum(xy)=118, cov = 4*118 - 20*20 = 72, var_x = 72,
    var_y = 80 => rho^2 = 72^2/(72*80) = 0.9 (scipy's spearmanr
    gives rho = 0.94868... whose square is exactly 0.9)."""
    r = _rho(spark, [(1, 10), (2, 20), (2, 30), (3, 40)])
    assert (r.cov_num, r.var_x, r.var_y) == (72, 72, 80)
    assert r.rho_sign == 1
    assert r.rho2_micro6 == 900_000


def test_zero_variance_guard(spark):
    """A constant column has var 0: rho2 falls to the guarded 0."""
    r = _rho(spark, [(5, 1), (5, 2), (5, 3)])
    assert r.var_x == 0 and r.rho2_micro6 == 0
