"""Cross-engine parity + serial ground truth for continuation
batch 102 (operators/events.theil_sen_trend)."""

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

    ok, msg = compare(QUERIES["theil_sen_trend"](spark, SF),
                      con.sql(ORACLE["theil_sen_trend"]).df())
    assert ok, msg


def _floor_div(a, b):
    # truncation toward zero — what Spark DIV and DuckDB // both do
    # (python // floors, so negate-divide-negate)
    return -((-a) // b) if a < 0 else a // b


def _serial_slope(series):
    slopes = sorted(
        _floor_div((series[j] - series[i]) * 10**6, j - i)
        for i in range(len(series)) for j in range(i + 1, len(series)))
    return slopes[(len(slopes) - 1) // 2], len(slopes)


def test_median_slope_resists_outliers_and_handles_negatives(spark):
    """Three planted series on one spine: rising with one massive
    outlier day (the outlier must NOT drag the slope), falling
    (negative slopes — the floor-division parity case), flat.
    Every value equals the serial replica."""
    from ehr_relation_extraction_spark.operators.events import (
        theil_sen_trend)

    plan = {
        "rising": [10, 12, 14, 16, 99, 20, 22, 24],   # outlier day 4
        "falling": [40, 35, 31, 26, 22, 17, 13, 8],
        "flat": [7, 7, 7, 7, 7, 7, 7, 7],
    }
    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    for etype, counts in plan.items():
        for day, n in enumerate(counts):
            for i in range(n):
                rows.append((eid, base + datetime.timedelta(
                    days=day, minutes=i), 1, etype, 0.0, "{}"))
                eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])
    got = {r.etype: r for r in theil_sen_trend(df).collect()}

    for etype, counts in plan.items():
        slope, n_pairs = _serial_slope(counts)
        r = got[etype]
        assert (r.n_days, r.n_pairs, r.slope_micro6) == (
            len(counts), n_pairs, slope), etype
    assert got["flat"].slope_micro6 == 0
    assert got["falling"].slope_micro6 < 0
    # robustness: despite day 4's spike to 99, the rising slope stays
    # near the true +2/day, nowhere near the LSQ-dragged value
    assert 1_900_000 <= got["rising"].slope_micro6 <= 2_600_000
