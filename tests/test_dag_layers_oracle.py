"""Cross-engine parity + serial ground truth for continuation
batch 79 (operators/graph_algos.dag_layers)."""

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

    ok, msg = compare(QUERIES["dag_layers"](spark, SF),
                      con.sql(ORACLE["dag_layers"]).df())
    assert ok, msg


def test_matches_serial_longest_path(spark):
    """Whole-table equality against serial longest-path DP on the
    condensation of a graph with a 2-cycle SCC, a diamond, and an
    isolated node — the endpoints: cycle members share one condensed
    node whose n_nodes is 2, diamond depth is the LONGEST arm, and
    sources/isolates sit at level 0."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        dag_layers)

    # SCC {a,b} (2-cycle); diamond s -> {a-b SCC, x} -> t; chain
    # t -> u; isolated z.  Longest chain: s -> ab -> t -> u (3 hops).
    edges = [("s", "a"), ("a", "b"), ("b", "a"), ("b", "t"),
             ("s", "x"), ("x", "t"), ("t", "u")]
    nodes = ["s", "a", "b", "t", "u", "x", "z"]
    scc_of = {"s": "s", "a": "a", "b": "a", "t": "t", "u": "u",
              "x": "x", "z": "z"}
    edf = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame(
        [(n, scc_of[n]) for n in nodes], ["node", "scc_id"])
    got = {r.scc_id: (r.n_nodes, r.level, r.indeg, r.outdeg)
           for r in dag_layers(edf, sdf).collect()}

    # serial longest path on the condensation
    cedges = {(scc_of[a], scc_of[b]) for a, b in edges
              if scc_of[a] != scc_of[b]}
    comps = sorted(set(scc_of.values()))
    level = {c: 0 for c in comps}
    for _ in range(10):
        for a, b in sorted(cedges):
            level[b] = max(level[b], level[a] + 1)
    n_nodes = {c: sum(1 for v in scc_of.values() if v == c)
               for c in comps}
    want = {c: (n_nodes[c], level[c],
                sum(1 for e in cedges if e[1] == c),
                sum(1 for e in cedges if e[0] == c))
            for c in comps}
    assert got == want
    assert got["a"] == (2, 1, 1, 1)      # the 2-cycle condensed
    assert got["t"][1] == 2 and got["u"][1] == 3
    assert got["z"] == (1, 0, 0, 0)      # isolated at level 0
