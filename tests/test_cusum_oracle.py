"""Cross-engine parity + serial ground truth for continuation
batch 99 (operators/events.cusum_drift)."""

from __future__ import annotations

import datetime

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

    ok, msg = compare(QUERIES["cusum_drift"](spark, SF),
                      con.sql(ORACLE["cusum_drift"]).df())
    assert ok, msg


def test_closed_form_equals_recurrence_and_alarm_resets(spark):
    """A planted level shift: steady days, a 5-day surge, then back
    to base.  The window closed form must equal the serial
    max(0, S + dev) recurrence day by day; the alarm fires during
    the surge and RESETS after the excess drains."""
    from ehr_relation_extraction_spark.operators.events import (
        cusum_drift)

    counts = [3, 3, 3, 3, 3, 12, 12, 12, 12, 12,
              3, 3, 3, 3, 0, 0, 3, 3, 3, 3]
    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    for day, n in enumerate(counts):
        for i in range(n):
            rows.append((eid, base + datetime.timedelta(
                days=day, minutes=i), 1, "surge", 0.0, "{}"))
            eid += 1
    # a steady control type so mu differs per type
    for day in range(len(counts)):
        rows.append((eid, base + datetime.timedelta(days=day),
                     2, "steady", 0.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])
    got = {(r.etype, r.day_idx): r for r in cusum_drift(df).collect()}

    day0 = min(d for (_, d) in got)
    for etype, series in (("surge", counts),
                          ("steady", [1] * len(counts))):
        mu = sum(series) // len(series)
        k = max(1, mu // 4)
        s = 0
        for day, r in enumerate(series):
            s = max(0, s + r - mu - k)
            row = got[(etype, day0 + day)]
            assert (row.r, row.mu, row.cusum) == (r, mu, s), (
                etype, day)
            assert row.alarm == int(s > 3 * mu + 5)
    surge_alarms = [d for (t, d) in got
                    if t == "surge" and got[(t, d)].alarm]
    assert surge_alarms, "surge must trip the alarm"
    assert max(surge_alarms) < day0 + len(counts) - 1  # it resets
    assert all(not got[("steady", d)].alarm
               for (t, d) in got if t == "steady")
