"""Cross-engine parity + serial ground truth for continuation
batch 192 (graph_algos.resource_allocation)."""

from __future__ import annotations

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

    ok, msg = compare(QUERIES["resource_allocation"](spark, SF),
                      con.sql(ORACLE["resource_allocation"]).df())
    assert ok, msg


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src string, dst string")


def test_rare_pivot_beats_hub(spark):
    """x-y share hub h (deg 4) AND rare pivot r (deg 2); u-v share
    only the hub.  CN is 2 vs 1, and RA separates further:
    ra(x,y) = 1e6//4 + 1e6//2 = 750000, ra(u,v) = 250000."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        resource_allocation)

    e = _edges(spark, [("h", "x"), ("h", "y"), ("h", "u"),
                       ("h", "v"), ("r", "x"), ("r", "y")])
    out = {(r.src, r.dst): r for r in
           resource_allocation(e).collect()}
    assert out[("x", "y")].cn == 2
    assert out[("x", "y")].ra_micro6 == 750000
    assert out[("u", "v")].cn == 1
    assert out[("u", "v")].ra_micro6 == 250000
    # h's neighbors also pair through x/y pivots etc.; but existing
    # edges must never appear
    assert ("h", "x") not in out


def test_existing_edges_excluded(spark):
    """In a triangle every 2-hop pair is already an edge — empty."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        resource_allocation)

    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert resource_allocation(e).count() == 0


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.operators.graph_algos import (
        resource_allocation)

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("e", "a"), ("b", "e"), ("c", "e")]
    one = resource_allocation(_edges(spark, pairs).coalesce(1)).collect()
    many = resource_allocation(
        _edges(spark, pairs).repartition(5)).collect()
    key = lambda r: (r.src, r.dst)
    assert sorted(one, key=key) == sorted(many, key=key)
