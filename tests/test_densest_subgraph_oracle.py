"""Cross-engine parity + serial ground truth for continuation
batch 90 (operators/graph_algos.densest_subgraph)."""

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

    ok, msg = compare(QUERIES["densest_subgraph"](spark, SF),
                      con.sql(ORACLE["densest_subgraph"]).df())
    assert ok, msg


def _peel_serial(edges, nodes, eps_num=11, eps_den=10, max_rounds=8):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    cur_n, cur_e = set(nodes), set(und)
    best = None
    for r in range(max_rounds):
        n, e = len(cur_n), len(cur_e)
        if n == 0:
            break
        dens = e * 10**6 // n
        if best is None or dens > best[0]:
            best = (dens, r, set(cur_n), n, e)
        deg = {v: 0 for v in cur_n}
        for a, b in cur_e:
            deg[a] += 1
            deg[b] += 1
        cur_n = {v for v in cur_n
                 if deg[v] * n * eps_den > 2 * eps_num * e}
        cur_e = {(a, b) for a, b in cur_e
                 if a in cur_n and b in cur_n}
    return best


def test_peel_matches_serial_and_finds_planted_clique(spark):
    """A planted 5-clique attached to a long sparse path: the peel
    must strip the path and return exactly the clique, and every
    (round, density) decision must match the serial replica."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        densest_subgraph)

    clique = [f"c{i}" for i in range(5)]
    edges = [(a, b) for i, a in enumerate(clique)
             for b in clique[i + 1:]]
    path = [f"p{i}" for i in range(12)]
    edges += list(zip(path, path[1:]))
    edges.append(("c0", "p0"))  # bridge
    nodes = clique + path

    best = _peel_serial(edges, nodes)
    edf = spark.createDataFrame(edges, ["src", "dst"])
    ndf = spark.createDataFrame([(n,) for n in nodes], ["node"])
    rows = densest_subgraph(edf, ndf).collect()

    assert {r.node for r in rows} == best[2] == set(clique)
    r0 = rows[0]
    assert (r0.round, r0.n_nodes, r0.n_edges) == (best[1], best[3],
                                                  best[4])
    assert r0.density_micro6 == best[0] == 10 * 10**6 // 5


def test_duplicate_and_reversed_edges_collapse(spark):
    """Symmetrization dedups: an edge supplied in both orientations
    (the ADVICE.md label_propagation hazard class) must count once
    in every degree and density."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        densest_subgraph)

    edges = [("a", "b"), ("b", "a"), ("a", "b"),  # one real edge
             ("b", "c"), ("c", "a")]              # triangle
    edf = spark.createDataFrame(edges, ["src", "dst"])
    ndf = spark.createDataFrame([("a",), ("b",), ("c",)], ["node"])
    rows = densest_subgraph(edf, ndf).collect()
    assert {r.node for r in rows} == {"a", "b", "c"}
    assert rows[0].n_edges == 3                   # not 5
    assert rows[0].density_micro6 == 10**6
