"""Cross-engine parity + serial-peeling ground truth for
continuation batch 55: full k-core decomposition by H-index
iteration (graph_algos.core_numbers)."""

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

    ok, msg = compare(QUERIES["core_numbers"](spark, SF),
                      con.sql(ORACLE["core_numbers"]).df())
    assert ok, msg


def test_matches_serial_peeling(spark):
    """The 8-sweep H-index fixpoint equals textbook min-degree
    peeling — i.e. the iteration actually CONVERGED on this graph
    and the value is the true coreness, not an upper bound."""
    from ehr_relation_extraction_spark import driver_queries as dq

    edges, nodes = dq._comention_graph(spark, SF)
    adj: dict[str, set] = {}
    for r in edges.collect():
        adj.setdefault(r.src, set()).add(r.dst)
        adj.setdefault(r.dst, set()).add(r.src)
    allnodes = [r.node for r in nodes.collect()]
    deg = {n: len(adj.get(n, ())) for n in allnodes}
    core = {}
    live = set(allnodes)
    k = 0
    while live:
        n = min(live, key=lambda x: (deg[x], x))
        k = max(k, deg[n])
        core[n] = k
        live.discard(n)
        for m in adj.get(n, ()):
            if m in live:
                deg[m] -= 1

    got = {r.node: r.coreness
           for r in dq.QUERIES["core_numbers"](spark, SF).collect()}
    assert got == core
    assert max(got.values()) >= 2, "fixture should have a 2-core"
