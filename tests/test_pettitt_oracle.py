"""Cross-engine parity + brute-force ground truth for continuation
batch 107 (operators/events.pettitt_change)."""

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

    ok, msg = compare(QUERIES["pettitt_change"](spark, SF),
                      con.sql(ORACLE["pettitt_change"]).df())
    assert ok, msg


def _brute_pettitt(series):
    """U_t straight from the pairwise definition, per type."""
    out = {}
    for etype, xs in series.items():
        T = len(xs)
        curve = []
        for t in range(1, T + 1):
            u = sum((xs[j] > xs[i]) - (xs[j] < xs[i])
                    for i in range(t) for j in range(t, T))
            curve.append(u)
        k = max(abs(u) for u in curve[:-1]) if T >= 2 else None
        change = next(i for i, u in enumerate(curve[:-1])
                      if abs(u) == k) if T >= 2 else None
        out[etype] = (curve, k, change)
    return out


def _mk_events(spark, day_counts):
    """day_counts: {etype: {day_idx: n_events}} -> events DF with n
    rows per (etype, day)."""
    rows = []
    for etype, days in day_counts.items():
        for d, n in days.items():
            ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
                days=d, hours=3)
            rows.extend((ts, etype) for _ in range(n))
    return spark.createDataFrame(rows, "ts timestamp, event_type string")


def test_matches_brute_force_definition(spark):
    """Planted level shift: type 'a' drops 5 -> 1 after day 4; the
    change day must be day 4 (2024-01-05's index) and every U_t must
    equal the O(T^2) pairwise definition.  Type 'b' is flat except a
    day it skips entirely — pinning the shared-spine zero-fill."""
    from ehr_relation_extraction_spark.operators.events import (
        pettitt_change)

    a = {d: (5 if d < 5 else 1) for d in range(10)}
    b = {d: 3 for d in range(10) if d != 7}  # day 7 zero-filled
    df = _mk_events(spark, {"a": a, "b": b})
    got = {(r.etype, r.day_idx): r
           for r in pettitt_change(df).collect()}

    base_day = sorted(d for (_, d) in got)[0]
    series = {"a": [a[d] for d in range(10)],
              "b": [3 if d != 7 else 0 for d in range(10)]}
    brute = _brute_pettitt(series)
    for etype, (curve, k, change) in brute.items():
        for t, u in enumerate(curve):
            row = got[(etype, base_day + t)]
            assert row.u_t == u, (etype, t)
            assert row.k_stat == k
            assert row.change_day == base_day + change
        assert got[(etype, base_day)].n_days == 10
    # the planted shift localizes at the last high day (index 4)
    assert brute["a"][2] == 4
    # flat-with-one-hole series: the zero day dominates the split
    assert got[("b", base_day + 7)].r == 0


def test_single_day_spine_excluded(spark):
    from ehr_relation_extraction_spark.operators.events import (
        pettitt_change)

    df = _mk_events(spark, {"a": {0: 4}})
    assert pettitt_change(df).count() == 0
