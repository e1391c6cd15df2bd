"""Cross-engine parity + serial ground truth for continuation
batch 122 (operators/graph_algos.bipartite_check)."""

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

    ok, msg = compare(QUERIES["bipartite_check"](spark, SF),
                      con.sql(ORACLE["bipartite_check"]).df())
    assert ok, msg


def test_known_graphs(spark):
    """Even cycle (bipartite), odd cycle (one violation), complete
    K4 (two violations: the two odd edges under BFS layering), and a
    path — exact counts per component."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        bipartite_check)

    edges = (
        # C4: even cycle, bipartite
        [("c0", "c1"), ("c1", "c2"), ("c2", "c3"), ("c3", "c0")]
        # C5: odd cycle, exactly one same-parity edge under BFS
        + [("o0", "o1"), ("o1", "o2"), ("o2", "o3"), ("o3", "o4"),
           ("o4", "o0")]
        # P3 path: trivially bipartite
        + [("p0", "p1"), ("p1", "p2")]
        # K4: every node distance <=1 from min -> 3 same-parity edges
        + [("k0", "k1"), ("k0", "k2"), ("k0", "k3"), ("k1", "k2"),
           ("k1", "k3"), ("k2", "k3")])
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.component: (r.n_nodes, r.n_edges, r.n_violations,
                         r.is_bipartite)
           for r in bipartite_check(df).collect()}
    assert got["c0"] == (4, 4, 0, 1)
    assert got["p0"] == (3, 2, 0, 1)
    assert got["o0"] == (5, 5, 1, 0)
    # K4 from k0: k1,k2,k3 all at dist 1 -> edges among them (3) are
    # same-parity violations
    assert got["k0"] == (4, 6, 3, 0)


def test_converged_at_driver_rounds(spark):
    """On the driver's co-mention graph, 8 rounds is past every
    component's eccentricity: 8 and 11 rounds give identical
    results (the truncation caveat never bites)."""
    from ehr_relation_extraction_spark.driver_queries import (
        _comention_graph)
    from ehr_relation_extraction_spark.operators.graph_algos import (
        bipartite_check)

    edges, _ = _comention_graph(spark, SF)
    a = sorted(map(tuple, bipartite_check(edges, 8).collect()))
    b = sorted(map(tuple, bipartite_check(edges, 11).collect()))
    assert a == b
