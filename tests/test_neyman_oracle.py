"""Cross-engine parity + serial ground truth for continuation
batch 179 (operators/sampling.neyman_allocation)."""

from __future__ import annotations

import math

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

    ok, msg = compare(QUERIES["neyman_allocation"](spark, SF),
                      con.sql(ORACLE["neyman_allocation"]).df())
    assert ok, msg


def test_engineered_allocation(spark):
    """Three strata with hand-computable variances.  A: [10,20]
    (N=2, ss = 2*500-900 = 100, w = 10); B: [5,5,5] (constant,
    w = 0); C: [0,30] (ss = 2*900-900 = 900, w = 30).  Budget 7:
    floors = [7*10//40, 0, 7*30//40] = [1, 0, 5], remainders
    [30, 0, 10] -> leftover 1 seat goes to A. Sum == budget."""
    from ehr_relation_extraction_spark.operators.sampling import (
        neyman_allocation)

    docs = spark.createDataFrame(
        [("A", 10), ("A", 20), ("B", 5), ("B", 5), ("B", 5),
         ("C", 0), ("C", 30)],
        "lang string, n_chars long")
    got = {r.stratum: r for r in
           neyman_allocation(docs, budget=7).collect()}
    assert got["A"].ss == 100 and got["A"].w == 10
    assert got["B"].ss == 0 and got["B"].w == 0
    assert got["C"].ss == 900 and got["C"].w == 30
    assert (got["A"].alloc_floor, got["B"].alloc_floor,
            got["C"].alloc_floor) == (1, 0, 5)
    assert (got["A"].alloc, got["B"].alloc, got["C"].alloc) == (2, 0, 5)
    assert sum(r.alloc for r in got.values()) == 7


def test_all_constant_strata_allocates_zero(spark):
    from ehr_relation_extraction_spark.operators.sampling import (
        neyman_allocation)

    docs = spark.createDataFrame(
        [("A", 5), ("A", 5), ("B", 9)], "lang string, n_chars long")
    rows = neyman_allocation(docs, budget=100).collect()
    assert all(r.alloc == 0 for r in rows)


def test_isqrt_correction_is_exact(spark):
    """Perfect squares and near-squares where naive floor(sqrt())
    could round wrong: w must be the true integer sqrt floor of ss."""
    from ehr_relation_extraction_spark.operators.sampling import (
        neyman_allocation)

    # build strata whose ss values land on/near perfect squares:
    # N=2, values (0, v) -> ss = 2*v^2 - v^2 = v^2 (exact square).
    vals = [3, 1000, 99991]
    rows = [(f"s{v}", x) for v in vals for x in (0, v)]
    docs = spark.createDataFrame(rows, "lang string, n_chars long")
    got = {r.stratum: r for r in neyman_allocation(docs).collect()}
    for v in vals:
        r = got[f"s{v}"]
        assert r.ss == v * v
        assert r.w == v == math.isqrt(r.ss)
