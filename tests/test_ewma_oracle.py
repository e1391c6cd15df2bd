"""Cross-engine parity + serial ground truth for continuation
batch 155 (operators/events.ewma_forecast)."""

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

    ok, msg = compare(QUERIES["ewma_forecast"](spark, SF),
                      con.sql(ORACLE["ewma_forecast"]).df())
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


def test_engineered_constant_series(spark):
    """17 days of constant volume 3: the EWMA weighted mean of a
    constant IS the constant (W = 3 * 65535, D = 65535), so the
    forecast is exactly 3.0 and the error is 0."""
    from ehr_relation_extraction_spark.operators.events import (
        ewma_forecast)

    r = ewma_forecast(_series(spark, [3] * 17)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.n_days, row.last_v) == (17, 3)
    assert row.ewma_micro6 == 3_000_000
    assert row.abs_err_micro6 == 0


def test_engineered_weights_and_gate(spark):
    """16 days of 1 then a 2-day spike (2, 2): yesterday (v=2)
    carries weight 2^15, the other 15 window days are all 1 =>
    W = 2*2^15 + (2^15 - 1), ewma = floor(1e6 * W / 65535)
    = 1500007 (replayed serially below); a 16-day series is dropped
    by the n_days >= 17 gate."""
    from ehr_relation_extraction_spark.operators.events import (
        ewma_forecast)

    counts = [1] * 16 + [2, 2]   # 18 days; window = days 2..17 back
    r = ewma_forecast(_series(spark, counts)).collect()[0]
    # serial replay: reversed series, index 0 = today
    rev = list(reversed(counts))
    w = sum(rev[i] * (1 << (16 - i)) for i in range(1, 17))
    want = (1_000_000 * w) // 65535
    assert r.last_v == 2
    assert r.ewma_micro6 == want
    assert r.abs_err_micro6 == abs(2_000_000 - want)

    assert ewma_forecast(_series(spark, [1] * 16)).count() == 0
