"""Cross-engine parity + serial ground truth for continuation
batch 170 (operators/graph_algos.pagerank_delta)."""

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

    ok, msg = compare(QUERIES["pagerank_delta"](spark, SF),
                      con.sql(ORACLE["pagerank_delta"]).df())
    assert ok, msg


def test_consistency_with_fixed(spark):
    """The delta equals a direct recomputation from pagerank_fixed
    at depths 4 and 5 on a small asymmetric graph, and a perfectly
    symmetric cycle is ALREADY converged (delta exactly 0 — the
    uniform vector is the cycle's fixed point at every depth)."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        pagerank_delta, pagerank_fixed)

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")],
        ["src", "dst"])
    r = pagerank_delta(edges, n_iter=5).collect()[0]
    r4 = {x.node: x.rank_u
          for x in pagerank_fixed(edges, n_iter=4).collect()}
    r5 = {x.node: x.rank_u
          for x in pagerank_fixed(edges, n_iter=5).collect()}
    want_l1 = sum(abs(r4[n] - r5[n]) for n in r4)
    assert r.n_nodes == 4
    assert r.l1_delta_u == want_l1
    assert r.max_delta_u == max(abs(r4[n] - r5[n]) for n in r4)
    assert r.l1_share_micro6 == (1_000_000 * want_l1) // sum(
        r5.values())
    assert want_l1 > 0  # the asymmetric graph is NOT yet converged

    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"])
    rc = pagerank_delta(cyc, n_iter=5).collect()[0]
    assert (rc.l1_delta_u, rc.max_delta_u, rc.l1_share_micro6) \
        == (0, 0, 0)
