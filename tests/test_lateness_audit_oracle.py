"""Cross-engine parity + serial ground truth for continuation
batch 146 (operators/events.lateness_audit)."""

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

    ok, msg = compare(QUERIES["lateness_audit"](spark, SF),
                      con.sql(ORACLE["lateness_audit"]).df())
    assert ok, msg


def test_engineered_lateness(spark):
    """Arrival order (event_id) deliberately disordered: one event
    70 s late, one 700 s late, one in order — the per-watermark
    discard counts must match a serial high-water-mark replay, and
    lateness is keyed per user (the other user's clock does not
    leak)."""
    from ehr_relation_extraction_spark.operators.events import (
        lateness_audit)

    base = dt.datetime(2024, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    rows = [
        # user 1: arrival order 0,1,2,3 with event times 0, 1000,
        # 930 (70 s late), 300 (700 s late)
        (0, ts(0), 1, "x", 0.0, ""),
        (1, ts(1000), 1, "x", 0.0, ""),
        (2, ts(930), 1, "x", 0.0, ""),
        (3, ts(300), 1, "x", 0.0, ""),
        # user 2: in order, and far ahead of user 1's clock
        (4, ts(5000), 2, "x", 0.0, ""),
        (5, ts(6000), 2, "x", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])
    got = {r.watermark_s: (r.n_events, r.n_out_of_order,
                           r.max_lateness_s, r.n_late)
           for r in lateness_audit(df).collect()}
    # latenesses: user1 -> 0, 0, 70, 700; user2 -> 0, 0
    assert got[60] == (6, 2, 700, 2)     # 70 and 700 exceed 60
    assert got[600] == (6, 2, 700, 1)    # only 700 exceeds 600
    assert got[3600] == (6, 2, 700, 0)
