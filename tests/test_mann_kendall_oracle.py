"""Cross-engine parity + serial ground truth for continuation
batch 121 (operators/events.mann_kendall)."""

from __future__ import annotations

import datetime as dt
import itertools
from collections import Counter

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

    ok, msg = compare(QUERIES["mann_kendall"](spark, SF),
                      con.sql(ORACLE["mann_kendall"]).df())
    assert ok, msg


def _mk_events(spark, day_counts):
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


def _serial_mk(series):
    n = len(series)
    s = sum((b > a) - (b < a)
            for a, b in itertools.combinations(series, 2))
    ties = Counter(series).values()
    var18 = n * (n - 1) * (2 * n + 5) \
        - sum(t * (t - 1) * (2 * t + 5) for t in ties)
    return n, s, var18, len(set(series))


def test_matches_serial_mann_kendall(spark):
    """Strictly rising, strictly falling, and tie-heavy series on a
    shared 6-day spine — S, var18, and tie groups must equal the
    textbook formulas exactly."""
    from ehr_relation_extraction_spark.operators.events import (
        mann_kendall)

    day_counts = {"up": [1, 2, 3, 4, 5, 6],
                  "down": [6, 5, 4, 3, 2, 1],
                  "flatish": [3, 3, 3, 5, 5, 3]}
    df = _mk_events(spark, day_counts)
    got = {r.etype: (r.n_days, r.s_stat, r.var18, r.n_tie_groups)
           for r in mann_kendall(df).collect()}
    for etype, series in day_counts.items():
        assert got[etype] == _serial_mk(series)
    # extremes: S = +-n(n-1)/2 with no ties, full variance
    assert got["up"][1] == 15 and got["down"][1] == -15
    assert got["up"][2] == 6 * 5 * 17          # no tie correction
    # heavy ties shrink the variance numerator
    assert got["flatish"][2] < got["up"][2]
