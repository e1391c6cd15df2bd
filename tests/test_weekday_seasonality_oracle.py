"""Cross-engine parity + serial ground truth for continuation
batch 132 (operators/events.weekday_seasonality)."""

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

    ok, msg = compare(QUERIES["weekday_seasonality"](spark, SF),
                      con.sql(ORACLE["weekday_seasonality"]).df())
    assert ok, msg


def _mk_events(spark, day_counts):
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)   # epoch day 19723
    for etype, counts in day_counts.items():
        for day, c in enumerate(counts):
            for k in range(c):
                rows.append((eid, base + dt.timedelta(days=day,
                                                      seconds=k),
                             1, etype, 0.0, ""))
                eid += 1
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])


def _serial(series, base_day=19723):
    n = len(series)
    s = sum(series)
    sst = sum((n * r - s) ** 2 for r in series)
    groups = {}
    for i, r in enumerate(series):
        groups.setdefault((base_day + i) % 7, []).append(r)
    ssb = sum(((n * sum(g) - len(g) * s) ** 2) // len(g)
              for g in groups.values())
    peak = min(groups,
               key=lambda w: (-((sum(groups[w]) * 10080)
                                // len(groups[w])), w))
    return (n, ssb, sst, (1000000 * ssb) // sst, peak)


def test_matches_serial_anova(spark):
    """A strict weekly pattern (strength near 1e6) vs an aperiodic
    ramp over the SAME 14-day spine — both must equal the serial
    ANOVA replay, and the weekly one must dominate."""
    from ehr_relation_extraction_spark.operators.events import (
        weekday_seasonality)

    weekly = [40, 5, 5, 5, 5, 5, 5] * 2       # spike every 7th day
    ramp = list(range(1, 15))                  # no weekly structure
    df = _mk_events(spark, {"weekly": weekly, "ramp": ramp})
    got = {r.etype: (r.n_days, r.ssb_scaled, r.sst_scaled,
                     r.strength_micro6, r.peak_weekday)
           for r in weekday_seasonality(df).collect()}
    assert got["weekly"] == _serial(weekly)
    assert got["ramp"] == _serial(ramp)
    assert got["weekly"][3] == 1000000   # pure weekly: SSB == SST
    assert got["ramp"][3] < 300000
