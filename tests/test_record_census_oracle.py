"""Cross-engine parity + serial ground truth for continuation
batch 187 (operators/events.record_census)."""

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

    ok, msg = compare(QUERIES["record_census"](spark, SF),
                      con.sql(ORACLE["record_census"]).df())
    assert ok, msg


def _mk_events(spark, daily_counts):
    """One event type, daily_counts[i] events on day i."""
    t0 = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for day, c in enumerate(daily_counts):
        for j in range(c):
            rows.append((eid, t0 + dt.timedelta(days=day, seconds=j),
                         1, "x", 0.0, ""))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_engineered_series(spark):
    """Volumes [3, 5, 5, 2, 7, 1]: highs on days 1, 2, 5 (ties are
    NOT records); lows on days 1, 4, 6.  H_6 per-term-floored =
    1000000 + 500000 + 333333 + 250000 + 200000 + 166666."""
    from ehr_relation_extraction_spark.operators.events import (
        record_census)

    ev = _mk_events(spark, [3, 5, 5, 2, 7, 1])
    r = record_census(ev).collect()[0]
    assert r.n_days == 6
    assert r.n_record_highs == 3
    assert r.n_record_lows == 3
    assert r.expected_micro6 == (1000000 + 500000 + 333333
                                 + 250000 + 200000 + 166666)


def test_monotone_series_is_all_records(spark):
    """Strictly rising volumes: every day is a record high, only
    day 1 a record low — the trend signature the census exists
    to expose (n_highs = n >> H_n)."""
    from ehr_relation_extraction_spark.operators.events import (
        record_census)

    ev = _mk_events(spark, [1, 2, 3, 4, 5, 6, 7, 8])
    r = record_census(ev).collect()[0]
    assert r.n_record_highs == 8
    assert r.n_record_lows == 1
    assert r.n_record_highs * 10**6 > 2 * r.expected_micro6
