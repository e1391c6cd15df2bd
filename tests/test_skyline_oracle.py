"""Cross-engine parity + serial ground truth + partition invariance
for continuation batch 92 (operators/skyline)."""

from __future__ import annotations

import itertools

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

    ok, msg = compare(QUERIES["skyline_3d"](spark, SF),
                      con.sql(ORACLE["skyline_3d"]).df())
    assert ok, msg


def _brute(points):
    out = []
    for k, v in points:
        dominated = any(
            all(w[i] >= v[i] for i in range(len(v)))
            and any(w[i] > v[i] for i in range(len(v)))
            for _, w in points)
        if not dominated:
            out.append((k, v))
    return out


def test_skyline_matches_brute_force_and_partition_invariant(spark):
    """Dense 3-D grid plus duplicates and an all-max corner: the
    two-phase skyline equals the O(n^2) dominance definition, at
    several partition counts (merge-closure is the property the
    distributed shape rides on)."""
    from ehr_relation_extraction_spark.operators.skyline import skyline

    pts = [("p%d%d%d" % (a, b, c), (a, b, c))
           for a, b, c in itertools.product(range(4), repeat=3)]
    pts += [("dupA", (3, 3, 3)), ("dupB", (0, 3, 2)),
            ("lone", (5, 0, 0))]
    want = {k for k, _ in _brute(pts)}
    rows = [(k, *v) for k, v in pts]
    for n_parts in (1, 3, 17):
        df = spark.createDataFrame(rows, ["key", "x", "y", "z"]) \
                  .repartition(n_parts)
        got = {r.key for r in skyline(df, ["x", "y", "z"]).collect()}
        assert got == want, n_parts
    # the all-max corner and its duplicate BOTH survive; lone's
    # single-axis extreme survives; interior points do not
    assert {"p333", "dupA", "lone"} <= want
    assert "p000" not in want and "p222" not in want
