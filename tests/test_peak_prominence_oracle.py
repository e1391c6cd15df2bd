"""Cross-engine parity + serial ground truth for continuation
batch 149 (operators/events.peak_prominence)."""

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

    ok, msg = compare(QUERIES["peak_prominence"](spark, SF),
                      con.sql(ORACLE["peak_prominence"]).df())
    assert ok, msg


def _series(spark, counts):
    """One event_type 'x'; day i carries counts[i] events."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + dt.timedelta(days=i), 1, "x",
                         0.0, ""))
            eid += 1
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])


def test_engineered_prominence(spark):
    """Textbook two-peak ridge 1,5,2,8,1: the minor peak (v=5) is
    separated from higher terrain by the col at 2 => prominence 3;
    the global peak (v=8) has no higher terrain, so both side cols
    fall to the side minima (1, 1) and prominence = 8 - 1 = 7."""
    from ehr_relation_extraction_spark.operators.events import (
        peak_prominence)

    got = {r.day_idx: (r.peak_v, r.saddle_v, r.prominence)
           for r in peak_prominence(
               _series(spark, [1, 5, 2, 8, 1])).collect()}
    assert got == {1: (5, 2, 3), 3: (8, 1, 7)}


def test_plateau_and_ties(spark):
    """Plateau shoulders (equal neighbors) are NOT peaks (strict >
    both sides), and a wiggle on a high plateau gets LOW prominence:
    series 9,8,9 around the wiggle gives prominence 1 even though
    the absolute height is 9."""
    from ehr_relation_extraction_spark.operators.events import (
        peak_prominence)

    # 2,7,7,2: no strict peak anywhere
    assert peak_prominence(_series(spark, [2, 7, 7, 2])).count() == 0
    # 1,9,8,9,... second 9 never strictly exceeds; first 9 is global
    got = {r.day_idx: r.prominence
           for r in peak_prominence(
               _series(spark, [1, 9, 8, 9, 8, 10, 1])).collect()}
    # idx1 v=9: higher at idx5; col between = 8 -> prom 1
    # idx3 v=9: same -> prom 1; idx5 v=10 global: cols 1,1 -> prom 9
    assert got == {1: 1, 3: 1, 5: 9}
