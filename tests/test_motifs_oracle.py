"""Cross-engine parity + serial ground truth for continuation
batch 164 (operators/events.series_motifs)."""

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

    ok, msg = compare(QUERIES["series_motifs"](spark, SF),
                      con.sql(ORACLE["series_motifs"]).df())
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


def test_engineered_symbols_and_motifs(spark):
    """8 distinct counts 1..8 symbolize into exact quartiles
    (1,2->a 3,4->b 5,6->c 7,8->d).  A repeating ramp
    1,3,5,7,2,4,6,8 yields motifs abc,bcd,cda,dab,abc,bcd — 'abc'
    and 'bcd' recur (2 of 6 windows each)."""
    from ehr_relation_extraction_spark.operators.events import (
        series_motifs)

    got = {r.motif: (r.n_windows, r.share_micro6)
           for r in series_motifs(
               _series(spark, [1, 3, 5, 7, 2, 4, 6, 8])).collect()}
    assert got == {"abc": (2, 333_333), "bcd": (2, 333_333),
                   "cda": (1, 166_666), "dab": (1, 166_666)}


def test_ties_and_short_series(spark):
    """A constant series is all one symbol ('aaa' everywhere: ties
    share the lowest quartile), and a 2-day series emits nothing."""
    from ehr_relation_extraction_spark.operators.events import (
        series_motifs)

    const = {r.motif: r.n_windows
             for r in series_motifs(
                 _series(spark, [5, 5, 5, 5])).collect()}
    assert const == {"aaa": 2}
    assert series_motifs(_series(spark, [3, 9])).count() == 0
