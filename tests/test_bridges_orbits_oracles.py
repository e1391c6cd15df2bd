"""Cross-engine parity + brute-force semantics for continuation
batches 46 (edge triangle support / local bridges) and 47 (3-node
graphlet orbit counts)."""

from __future__ import annotations

from itertools import combinations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.fixture(scope="module")
def graph(spark):
    from ehr_relation_extraction_spark import driver_queries as dq

    edges, nodes = dq._comention_graph(spark, SF)
    adj: dict[str, set] = {}
    pairs = set()
    for r in edges.collect():
        adj.setdefault(r.src, set()).add(r.dst)
        adj.setdefault(r.dst, set()).add(r.src)
        pairs.add((r.src, r.dst))
    return adj, pairs, [r.node for r in nodes.collect()]


@pytest.mark.parametrize("key", ["local_bridges", "orbit_counts"])
def test_oracle_parity(spark, con, key):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[key](spark, SF),
                      con.sql(ORACLE[key]).df())
    assert ok, msg


def test_support_brute_force(spark, graph):
    """Edge support equals the common-neighbor set intersection; the
    bridge flag is exactly support == 0."""
    from ehr_relation_extraction_spark import driver_queries as dq

    adj, pairs, _ = graph
    rows = dq.QUERIES["local_bridges"](spark, SF).collect()
    assert {(r.src, r.dst) for r in rows} == pairs
    for r in rows:
        cn = len(adj[r.src] & adj[r.dst])
        assert r.support == cn, (r.src, r.dst)
        assert r.is_local_bridge == (1 if cn == 0 else 0)


def test_orbits_brute_force(spark, graph):
    """Orbit counts equal direct induced-graphlet enumeration over
    all 3-node subsets of the collected graph."""
    from ehr_relation_extraction_spark import driver_queries as dq

    adj, _, nodes = graph
    deg = {n: len(adj.get(n, ())) for n in nodes}
    o1 = {n: 0 for n in nodes}
    o2 = {n: 0 for n in nodes}
    o3 = {n: 0 for n in nodes}
    for trio in combinations(sorted(nodes), 3):
        a, b, c = trio
        e = [(x, y) for x, y in combinations(trio, 2)
             if y in adj.get(x, ())]
        if len(e) == 3:
            for n in trio:
                o3[n] += 1
        elif len(e) == 2:
            ctr = (set(e[0]) & set(e[1])).pop()
            for n in trio:
                if n == ctr:
                    o2[n] += 1
                else:
                    o1[n] += 1

    got = {r.node: (r.deg, r.orbit1, r.orbit2, r.n_triangles)
           for r in dq.QUERIES["orbit_counts"](spark, SF).collect()}
    assert got == {n: (deg[n], o1[n], o2[n], o3[n]) for n in nodes}
    assert any(v[3] > 0 for v in got.values())
