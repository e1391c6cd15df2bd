"""Cross-engine parity + serial ground truth for continuation
batch 126 (operators/events.autocorrelation)."""

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

    ok, msg = compare(QUERIES["autocorrelation"](spark, SF),
                      con.sql(ORACLE["autocorrelation"]).df())
    assert ok, msg


def _serial_acf(series, lag):
    n = len(series)
    s = sum(series)
    c = [n * x - s for x in series]
    num = sum(c[t] * c[t + lag] for t in range(n - lag))
    den = sum(x * x for x in c)
    q = abs(1000000 * num) // den
    return (num, den, q if num >= 0 else -q)


def test_matches_serial_acf(spark):
    """Alternating period-2 series: strong negative lag-1, strong
    positive lag-2; every emitted number equals the quadratic
    definition."""
    from ehr_relation_extraction_spark.operators.events import (
        autocorrelation)

    series = [10, 2] * 7              # 14 days, period 2
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for day, cval in enumerate(series):
        for k in range(cval):
            rows.append((eid, base + dt.timedelta(days=day,
                                                  seconds=k),
                         1, "alt", 0.0, ""))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])
    got = {r.lag: (r.num, r.den, r.acf_micro6)
           for r in autocorrelation(df).collect()}
    for lag in (1, 2, 7):
        assert got[lag] == _serial_acf(series, lag)
    assert got[1][2] < -800000        # strong anti-correlation
    assert got[2][2] > 800000         # strong period-2 correlation
