"""Cross-engine parity + serial ground truth for continuation
batch 182 (operators/graph_algos.stress_centrality)."""

from __future__ import annotations

from collections import defaultdict, deque

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


def _brute_stress(edges: list[tuple[str, str]]) -> dict[str, int]:
    """Independent serial truth: BFS dist from every source, then
    count, for each unordered pair (s, t), the geodesics through v
    by full enumeration of shortest paths (DFS over the BFS DAG)."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    nodes = sorted(adj)

    def bfs(src):
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        return dist

    dists = {n: bfs(n) for n in nodes}

    def paths(s, t):
        """All shortest s->t paths as node lists."""
        d = dists[s]
        if t not in d:
            return []
        out = []

        def go(u, acc):
            if u == t:
                out.append(acc)
                return
            for w in adj[u]:
                if d.get(w) == d[u] + 1 and d.get(w, 1 << 30) <= d[t]:
                    go(w, acc + [w])

        go(s, [s])
        return [p for p in out if len(p) - 1 == d[t]]

    stress = {n: 0 for n in nodes}
    for i, s in enumerate(nodes):
        for t in nodes[i + 1:]:
            for p in paths(s, t):
                for v in p[1:-1]:
                    stress[v] += 1
    return stress


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["stress_centrality"](spark, SF),
                      con.sql(ORACLE["stress_centrality"]).df())
    assert ok, msg


def test_path_and_cycle(spark):
    """Path a-b-c: stress(b) = 1.  4-cycle w-x-y-z: each node sits
    on exactly one geodesic (the opposite pair's two shortest paths
    split, one through each side)."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        stress_centrality)

    ed = spark.createDataFrame(
        [("a", "b"), ("b", "c"),
         ("w", "x"), ("x", "y"), ("y", "z"), ("z", "w")],
        "src string, dst string")
    got = {r.node: (r.stress, r.n_geodesic_pairs)
           for r in stress_centrality(ed).collect()}
    assert got["b"] == (1, 1)
    assert got["a"] == (0, 0) and got["c"] == (0, 0)
    for n in "wxyz":
        assert got[n] == (1, 1)


def test_matches_brute_force_enumeration(spark):
    """A denser graph with multiple geodesics per pair (diamond +
    tail + triangle): the operator must equal full shortest-path
    enumeration."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        stress_centrality)

    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
             ("d", "e"), ("e", "f"), ("f", "g"), ("e", "g"),
             ("g", "h")]
    truth = _brute_stress(edges)
    ed = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.stress for r in stress_centrality(ed).collect()}
    assert got == truth
    # sanity on the fixture itself: the diamond midpoint pair (a,d)
    # has two geodesics, so b and c each carry one
    assert truth["b"] >= 1 and truth["c"] >= 1
