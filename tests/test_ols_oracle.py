"""Cross-engine parity + serial ground truth for continuation
batch 205 (operators/events.ols_trend)."""

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

    ok, msg = compare(QUERIES["ols_trend"](spark, SF),
                      con.sql(ORACLE["ols_trend"]).df())
    assert ok, msg


def _mk_events(spark, series):
    t0 = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for et, counts in series.items():
        for day, c in enumerate(counts):
            for j in range(c):
                rows.append((eid, t0 + dt.timedelta(days=day,
                                                    seconds=j),
                             1, et, 0.0, ""))
                eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_perfect_line(spark):
    """y = 2x + 3 over days 0..4: slope exactly 2, intercept 3,
    R^2 exactly 1."""
    from ehr_relation_extraction_spark.operators.events import (
        ols_trend)

    r = {x.etype: x for x in ols_trend(_mk_events(spark, {
        "a": [3, 5, 7, 9, 11]})).collect()}["a"]
    assert r.n_days == 5 and r.sum_y == 35
    assert r.slope_micro6 == 2000000
    assert r.intercept_micro6 == 3000000
    assert r.r2_micro6 == 1000000


def test_flat_series_zero_slope(spark):
    from ehr_relation_extraction_spark.operators.events import (
        ols_trend)

    r = ols_trend(_mk_events(spark, {"a": [4, 4, 4, 4]})).collect()[0]
    assert r.slope_micro6 == 0
    assert r.intercept_micro6 == 4000000
    assert r.r2_micro6 == 0  # Syy degenerate guard


def test_outlier_day_drags_ols(spark):
    """A flat series with one spike day: OLS slope moves away from
    0 (the gap-to-Theil-Sen alarm this operator exists for)."""
    from ehr_relation_extraction_spark.operators.events import (
        ols_trend)

    r = ols_trend(_mk_events(spark, {
        "a": [5, 5, 5, 5, 5, 40]})).collect()[0]
    assert r.slope_micro6 > 1000000


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.operators.events import (
        ols_trend)

    ev = _mk_events(spark, {"a": [2, 9, 4, 7], "b": [1, 1, 8, 2]})
    one = ols_trend(ev.coalesce(1)).collect()
    many = ols_trend(ev.repartition(7)).collect()
    key = lambda r: r.etype
    assert sorted(one, key=key) == sorted(many, key=key)
