"""Cross-engine parity + serial-BFS ground truth for continuation
batch 56: landmark-based closeness/harmonic centrality
(graph_algos.landmark_centrality)."""

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

    ok, msg = compare(QUERIES["landmark_centrality"](spark, SF),
                      con.sql(ORACLE["landmark_centrality"]).df())
    assert ok, msg


def test_matches_serial_bfs(spark):
    """Landmark pick + per-landmark BFS + integer scoring replicated
    serially in Python — proves the multi-source frontier fused the
    right per-landmark distances, not an artifact both engines share."""
    from collections import deque

    from ehr_relation_extraction_spark import driver_queries as dq

    edges, nodes = dq._comention_graph(spark, SF)
    adj: dict[str, set] = {}
    for r in edges.collect():
        adj.setdefault(r.src, set()).add(r.dst)
        adj.setdefault(r.dst, set()).add(r.src)
    allnodes = sorted(r.node for r in nodes.collect())
    lms = sorted(adj, key=lambda n: (-len(adj[n]), n))[:4]

    score = {n: [0, 0, 0] for n in allnodes}  # n_lm, sum_dist, harmonic
    for lm in lms:
        dist = {lm: 0}
        dq_ = deque([lm])
        while dq_:
            u = dq_.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq_.append(v)
        for n, d in dist.items():
            if d > 0:
                score[n][0] += 1
                score[n][1] += d
                score[n][2] += 1000000 // d

    got = {r.node: (r.n_lm, r.sum_dist, r.harmonic_micro6,
                    r.closeness_micro6)
           for r in dq.QUERIES["landmark_centrality"](spark, SF).collect()}
    assert set(got) == set(allnodes)
    for n in allnodes:
        n_lm, sd, hm = score[n]
        cl = (1000000 * n_lm) // sd if sd > 0 else 0
        assert got[n] == (n_lm, sd, hm, cl), n
    assert any(v[0] > 0 for v in score.values()), \
        "fixture should have reachable nodes"
