"""Cross-engine parity + serial ground truth for continuation
batch 150 (operators/events.runs_test)."""

from __future__ import annotations

import datetime as dt

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

    ok, msg = compare(QUERIES["runs_test"](spark, SF),
                      con.sql(ORACLE["runs_test"]).df())
    assert ok, msg


def _series(spark, counts, etype="x"):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + dt.timedelta(days=i), 1, etype,
                         0.0, ""))
            eid += 1
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])


def test_engineered_runs(spark):
    """Counts 1,1,3,3,7,7: lower median = 3 drops the two 3-days,
    leaving signs 0,0,1,1 in day order => 2 runs, n1=n2=2,
    E[R] = 1 + 8/4 = 3.0 exactly, Var[R] = 8*(8-4)/(16*3) = 2/3."""
    from ehr_relation_extraction_spark.operators.events import (
        runs_test)

    got = runs_test(_series(spark, [1, 1, 3, 3, 7, 7])).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n1, r.n2, r.n_runs) == (2, 2, 2)
    assert r.exp_runs_micro6 == 3_000_000
    assert r.var_runs_micro6 == 666_666  # floor(2/3 * 1e6)


def test_alternating_vs_clumped(spark):
    """Alternating 1,7,1,7,1,7 (+ a trailing median-4 day that
    drops) maximizes runs (6 runs of n1=3,n2=3); the clumped
    permutation minimizes them (2 runs) — same margins, so identical
    null moments, opposite extremes of the statistic."""
    from ehr_relation_extraction_spark.operators.events import (
        runs_test)

    alt = runs_test(
        _series(spark, [1, 7, 1, 7, 1, 7, 4])).collect()[0]
    clp = runs_test(
        _series(spark, [1, 1, 1, 7, 7, 7, 4])).collect()[0]
    assert (alt.n1, alt.n2, clp.n1, clp.n2) == (3, 3, 3, 3)
    assert alt.n_runs == 6 and clp.n_runs == 2
    assert alt.exp_runs_micro6 == clp.exp_runs_micro6 == 4_000_000
    assert alt.var_runs_micro6 == clp.var_runs_micro6
