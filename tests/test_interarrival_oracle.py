"""Cross-engine parity + serial ground truth for continuation
batch 116 (operators/events.interarrival_stats)."""

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

    ok, msg = compare(QUERIES["interarrival_stats"](spark, SF),
                      con.sql(ORACLE["interarrival_stats"]).df())
    assert ok, msg


def test_matches_serial_gaps(spark):
    """Hand-built stream with known gaps, a duplicate timestamp
    (event_id tie-break), and a single-event type that must drop out
    (no gaps)."""
    from ehr_relation_extraction_spark.operators.events import (
        interarrival_stats)

    base = dt.datetime(2024, 1, 1)
    us = [0, 100, 300, 300, 1000, 5000]   # gaps: 100,200,0,700,4000
    rows = [(i, base + dt.timedelta(microseconds=u), 1, "a", 0.0, "")
            for i, u in enumerate(us)]
    rows.append((99, base, 1, "lonely", 0.0, ""))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])
    got = {r.etype: r for r in interarrival_stats(df).collect()}

    gaps = sorted([100, 200, 0, 700, 4000])
    n = len(gaps)
    a = got["a"]
    assert a.n_gaps == n
    assert a.mean_us == sum(gaps) // n
    assert a.p50_us == gaps[((n - 1) * 50) // 100]
    assert a.p90_us == gaps[((n - 1) * 90) // 100]
    assert a.max_us == 4000
    assert "lonely" not in got            # single event -> no gaps
