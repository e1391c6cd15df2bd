"""Cross-engine parity + serial ground truth for continuation
batch 194 (operators/events.lead_lag)."""

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

    ok, msg = compare(QUERIES["lead_lag"](spark, SF),
                      con.sql(ORACLE["lead_lag"]).df())
    assert ok, msg


def _mk_events(spark, series):
    """series: dict etype -> list of daily counts (day 0..n-1)."""
    t0 = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for et, counts in series.items():
        for day, c in enumerate(counts):
            for j in range(c):
                rows.append((eid, t0 + dt.timedelta(days=day,
                                                    seconds=j),
                             1, et, 0.0, ""))
                eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_shifted_copy_detected_at_its_lag(spark):
    """b is a copy of a shifted 2 days later: the (a, b) pair must
    flag lag 2 as best (perfect alignment), and the lag-2
    covariance numerator must be exactly n*sxy - sx*sy of the
    aligned windows."""
    from ehr_relation_extraction_spark.operators.events import (
        lead_lag)

    a = [5, 1, 4, 1, 9, 2, 6, 3]
    b = [1, 1] + a[:-2]  # b[d] = a[d-2], padded with 1s
    out = lead_lag(_mk_events(spark, {"a": a, "b": b})).collect()
    ab = {r.lag: r for r in out
          if r.type_a == "a" and r.type_b == "b"}
    best = [l for l, r in ab.items() if r.is_best]
    assert best == [2]
    r2 = ab[2]
    xs = a[:-2]
    ys = b[2:]
    n = len(xs)
    assert r2.n_days == n
    assert r2.cov_num == (n * sum(x * y for x, y in zip(xs, ys))
                          - sum(xs) * sum(ys))


def test_exactly_one_best_per_pair(spark):
    from ehr_relation_extraction_spark.operators.events import (
        lead_lag)

    out = lead_lag(_mk_events(spark, {
        "a": [3, 1, 4, 1, 5], "b": [2, 7, 1, 8, 2],
        "c": [1, 1, 2, 1, 1]})).collect()
    import collections
    per = collections.Counter()
    for r in out:
        if r.is_best:
            per[(r.type_a, r.type_b)] += 1
    assert all(v == 1 for v in per.values())
    assert len(per) == 6  # 3*2 ordered pairs


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.operators.events import (
        lead_lag)

    ev = _mk_events(spark, {"a": [2, 0, 3, 1], "b": [1, 4, 0, 2]})
    one = lead_lag(ev.coalesce(1)).collect()
    many = lead_lag(ev.repartition(7)).collect()
    key = lambda r: (r.type_a, r.type_b, r.lag)
    assert sorted(one, key=key) == sorted(many, key=key)
