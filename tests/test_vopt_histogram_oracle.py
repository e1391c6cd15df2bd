"""Cross-engine parity + brute-force optimality for continuation
batch 65 (functions/sketches.v_optimal_histogram)."""

from __future__ import annotations

from itertools import combinations

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

    ok, msg = compare(QUERIES["vopt_histogram"](spark, SF),
                      con.sql(ORACLE["vopt_histogram"]).df())
    assert ok, msg


def _sse(vals, cnts, j, i):
    a = sum(c * v * v for v, c in zip(vals[j:i + 1], cnts[j:i + 1]))
    b = sum(c * v for v, c in zip(vals[j:i + 1], cnts[j:i + 1]))
    c = sum(cnts[j:i + 1])
    return ((a * c - b * b) * 10**6) // c


def _brute(vals, cnts, n_b):
    """Enumerate every bucketization (split points = combinations) —
    the exponential ground truth the DP must equal."""
    n = len(vals)
    best, best_parts = None, None
    for splits in combinations(range(1, n), n_b - 1):
        bounds = [0, *splits, n]
        cost = sum(_sse(vals, cnts, bounds[k], bounds[k + 1] - 1)
                   for k in range(n_b))
        if best is None or cost < best:
            best, best_parts = cost, bounds
    return best, best_parts


def test_dp_equals_brute_force(spark):
    """On a 12-value synthetic domain with 4 buckets the DP's total
    cost and boundaries equal exhaustive enumeration, and beat the
    equi-width bucketization."""
    from ehr_relation_extraction_spark.functions.sketches import (
        v_optimal_histogram)

    vals = [1, 2, 3, 10, 11, 12, 50, 55, 60, 200, 210, 900]
    cnts = [5, 3, 8, 2, 7, 1, 4, 4, 2, 3, 3, 1]
    rows = [(v,) for v, c in zip(vals, cnts) for _ in range(c)]
    df = spark.createDataFrame(rows, ["x"])
    got = sorted(v_optimal_histogram(df, "x", 4).collect(),
                 key=lambda r: r.bucket)
    got_cost = sum(r.sse_micro6 for r in got)
    want_cost, bounds = _brute(vals, cnts, 4)
    assert got_cost == want_cost
    want_buckets = [(vals[bounds[k]], vals[bounds[k + 1] - 1])
                    for k in range(4)]
    assert [(r.lo_val, r.hi_val) for r in got] == want_buckets

    # strictly better than equi-width on this skewed domain
    eq_bounds = [0, 3, 6, 9, 12]
    eq_cost = sum(_sse(vals, cnts, eq_bounds[k], eq_bounds[k + 1] - 1)
                  for k in range(4))
    assert got_cost <= eq_cost

    # buckets tile the domain: contiguous, exhaustive, counts add up
    assert got[0].lo_val == vals[0] and got[-1].hi_val == vals[-1]
    assert sum(r.n_items for r in got) == sum(cnts)


def test_fixture_histogram_properties(spark):
    from ehr_relation_extraction_spark import driver_queries as dq

    got = sorted(dq.QUERIES["vopt_histogram"](spark, SF).collect(),
                 key=lambda r: r.bucket)
    assert [r.bucket for r in got] == list(range(1, 7))
    for a, b in zip(got, got[1:]):
        assert a.hi_val < b.lo_val
    assert sum(r.n_items for r in got) == 500
