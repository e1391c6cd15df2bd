"""Cross-engine parity + semantics for continuation batch 6: the
typed schema quotient graph, per-predicate KG churn between two
point-in-time cuts, and the hapax-object noise indicator."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"
T1 = 1704672000
T2 = T1 + 604800

KEYS = ["schema_graph", "kg_churn", "hapax_objects"]


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", KEYS)
def test_oracle_parity(spark, con, name):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[name](spark, SF),
                      con.sql(ORACLE[name]).df())
    assert ok, f"{name}: {msg}"


def test_schema_graph_totals_cover_all_edges(spark):
    """Every node-level edge lands in exactly one type-level row:
    n_edges and w_sum sum to the edge-table totals."""
    from ehr_relation_extraction_spark import driver_queries as dq

    ge = dq.q_graph_edges(spark, SF)
    n_edges = ge.count()
    w_sum = sum(r.weight for r in ge.select("weight").collect())
    rows = dq.QUERIES["schema_graph"](spark, SF).collect()
    assert rows
    assert sum(r.n_edges for r in rows) == n_edges
    assert sum(r.w_sum for r in rows) == w_sum


def test_kg_churn_consistent_with_asof_cuts(spark):
    """added+stable per pred equals the T2 as-of fact count, and
    removed+stable equals the T1 count (fact = distinct url,subj,
    pred,obj)."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.operators.triples import kg_asof

    iv = dq.q_triple_snapshots(spark, SF)

    def cut(ts):
        out = {}
        for r in kg_asof(iv, ts).dropDuplicates(
                ["url", "subj", "pred", "obj"]).collect():
            out[r.pred] = out.get(r.pred, 0) + 1
        return out

    c1, c2 = cut(T1), cut(T2)
    rows = dq.QUERIES["kg_churn"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_removed + r.n_stable == c1.get(r.pred, 0)
        assert r.n_added + r.n_stable == c2.get(r.pred, 0)


def test_hapax_objects_bounds(spark):
    """hapax counts are bounded by the object vocabulary and the
    share is the exact floored ratio."""
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    rows = QUERIES["hapax_objects"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.n_objs
        assert r.hapax_share_micro6 == r.n_hapax * 1_000_000 // r.n_objs
