"""Cross-engine parity + serial ground truth for continuation
batch 156 (operators/events.lis_trend)."""

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

    ok, msg = compare(QUERIES["lis_trend"](spark, SF),
                      con.sql(ORACLE["lis_trend"]).df())
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


def test_engineered_lis(spark):
    """Textbook pi-digit sequence 3,1,4,1,5,9,2,6: LIS = 4 (e.g.
    3,4,5,9) and LDS = 2 (no strictly-falling triple exists — every
    descent of two has only rises after it).  Both the hand count
    and the serial O(n^2) DP pin the distributed answer."""
    from ehr_relation_extraction_spark.operators.events import (
        lis_trend, _lis_len)

    counts = [3, 1, 4, 1, 5, 9, 2, 6]
    r = lis_trend(_series(spark, counts)).collect()[0]
    want_lis = _lis_len(counts)
    want_lds = _lis_len([-x for x in counts])
    assert want_lis == 4          # e.g. 3,4,5,9
    assert want_lds == 2          # e.g. 9,6
    assert (r.n_days, r.lis_len, r.lds_len) == (8, want_lis, want_lds)
    assert r.lis_share_micro6 == (1_000_000 * want_lis) // 8


def test_monotone_extremes(spark):
    """Strictly rising series: LIS = n, LDS = 1; constant series:
    both 1 (strict inequalities)."""
    from ehr_relation_extraction_spark.operators.events import (
        lis_trend)

    up = lis_trend(_series(spark, [1, 2, 3, 4, 5])).collect()[0]
    assert (up.lis_len, up.lds_len) == (5, 1)
    assert up.lis_share_micro6 == 1_000_000

    flat = lis_trend(_series(spark, [2, 2, 2, 2])).collect()[0]
    assert (flat.lis_len, flat.lds_len) == (1, 1)
