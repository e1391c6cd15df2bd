"""Cross-engine parity + serial ground truth for continuation
batch 161 (functions/urls.politeness_audit)."""

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

    ok, msg = compare(QUERIES["politeness_audit"](spark, SF),
                      con.sql(ORACLE["politeness_audit"]).df())
    assert ok, msg


def _pages(spark, fetches):
    """fetches: list of (host, sec)."""
    base = dt.datetime(2024, 1, 1)
    rows = [(f"http://{h}/p{i}", base + dt.timedelta(seconds=s))
            for i, (h, s) in enumerate(fetches)]
    return spark.createDataFrame(rows, ["url", "warc_ts"])


def test_engineered_bursts(spark):
    """Host A fires 3 fetches inside one 10 s window (secs 0, 4, 9
    => burst 3 at sec 9) then a polite one at 30; host B is a
    same-second double-fire (burst 2, gap 0); host C fetches once
    (min_gap defaults to the window)."""
    from ehr_relation_extraction_spark.functions.urls import (
        politeness_audit)

    got = {r.host: (r.n_fetches, r.max_burst, r.min_gap_s,
                    r.max_rate_milli)
           for r in politeness_audit(_pages(spark, [
               ("a.com", 0), ("a.com", 4), ("a.com", 9),
               ("a.com", 30),
               ("b.com", 100), ("b.com", 100),
               ("c.com", 7),
           ])).collect()}
    assert got["a.com"] == (4, 3, 4, 300)
    assert got["b.com"] == (2, 2, 0, 200)
    assert got["c.com"] == (1, 1, 10, 100)


def test_window_boundary(spark):
    """The range frame is [t-9, t]: fetches exactly 9 s apart share
    a window (burst 2); 10 s apart do not (burst stays 1)."""
    from ehr_relation_extraction_spark.functions.urls import (
        politeness_audit)

    got = {r.host: r.max_burst
           for r in politeness_audit(_pages(spark, [
               ("in.com", 0), ("in.com", 9),
               ("out.com", 0), ("out.com", 10),
           ])).collect()}
    assert got == {"in.com": 2, "out.com": 1}
