"""Cross-engine parity + serial ground truth for continuation
batch 119 (operators/events.fano_factor)."""

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

    ok, msg = compare(QUERIES["fano_factor"](spark, SF),
                      con.sql(ORACLE["fano_factor"]).df())
    assert ok, msg


def _mk_events(spark, day_counts):
    """day_counts: {etype: [count per day]} over a shared spine."""
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
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


def test_matches_serial_dispersion(spark):
    """Constant series -> F = 0; bursty one-day spike -> F >> 1;
    both must equal the exact integer formula on the SHARED
    zero-filled spine (the constant type sees the burst type's days
    as zeros only if those days exist in the spine — here both series
    span the same 8 days)."""
    from ehr_relation_extraction_spark.operators.events import (
        fano_factor)

    day_counts = {"steady": [5] * 8,
                  "bursty": [0, 0, 0, 40, 0, 0, 0, 0]}
    df = _mk_events(spark, day_counts)
    got = {r.etype: r for r in fano_factor(df).collect()}

    for etype, series in day_counts.items():
        n = 8
        s1 = sum(series)
        s2 = sum(x * x for x in series)
        f = (1000000 * (n * s2 - s1 * s1)) // (n * s1)
        r = got[etype]
        assert (r.n_days, r.total, r.fano_micro6) == (n, s1, f)
    assert got["steady"].fano_micro6 == 0          # no dispersion
    assert got["bursty"].fano_micro6 == 35 * 10**6  # var/mean = 35
