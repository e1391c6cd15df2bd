"""Cross-engine parity + serial ground truth for continuation
batch 197 (graph_algos.clustering_coeffs)."""

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

    ok, msg = compare(QUERIES["clustering_coeffs"](spark, SF),
                      con.sql(ORACLE["clustering_coeffs"]).df())
    assert ok, msg


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src string, dst string")


def test_kite_graph_hand_check(spark):
    """Triangle a-b-c plus pendant d on a: cc(b) = cc(c) = 1
    (deg-2, one triangle), cc(a) = 2*1/(3*2) = 1/3, cc(d) = 0.
    Transitivity = 3*1/wedges, wedges = (3*2 + 2*1*2 + 0)/2 = 5."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        clustering_coeffs)

    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"),
                       ("a", "d")])
    out = {r.node: r for r in clustering_coeffs(e).collect()}
    assert out["b"].cc_micro6 == 1000000
    assert out["c"].cc_micro6 == 1000000
    assert out["a"].cc_micro6 == 333333
    assert out["d"].cc_micro6 == 0
    assert out["a"].degree == 3 and out["d"].degree == 1
    assert out["a"].trans_micro6 == 3000000 // 5
    assert out["a"].n_nodes == 4


def test_clique_is_fully_transitive(spark):
    from ehr_relation_extraction_spark.operators.graph_algos import (
        clustering_coeffs)

    nodes = ["a", "b", "c", "d"]
    e = _edges(spark, [(x, y) for i, x in enumerate(nodes)
                       for y in nodes[i + 1:]])
    out = clustering_coeffs(e).collect()
    assert all(r.cc_micro6 == 1000000 for r in out)
    assert all(r.trans_micro6 == 1000000 for r in out)


def test_star_has_zero_transitivity(spark):
    from ehr_relation_extraction_spark.operators.graph_algos import (
        clustering_coeffs)

    e = _edges(spark, [("h", x) for x in ["a", "b", "c", "d"]])
    out = clustering_coeffs(e).collect()
    assert all(r.cc_micro6 == 0 for r in out)
    assert all(r.trans_micro6 == 0 for r in out)


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.operators.graph_algos import (
        clustering_coeffs)

    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
             ("d", "e"), ("c", "e"), ("e", "a")]
    one = clustering_coeffs(_edges(spark, pairs).coalesce(1)).collect()
    many = clustering_coeffs(
        _edges(spark, pairs).repartition(5)).collect()
    key = lambda r: r.node
    assert sorted(one, key=key) == sorted(many, key=key)
