"""Cross-engine parity + serial ground truth for continuation
batch 74 (operators/graph_algos.jp_coloring)."""

from __future__ import annotations

import hashlib

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


def _prio(node: str) -> int:
    return int(hashlib.md5(f"jp:{node}".encode()).hexdigest()[:6], 16)


def _serial_jp(edges, nodes, n_rounds=8):
    """Reference Jones-Plassmann: local-min static priorities, mex of
    the already-colored neighborhood, fixed rounds."""
    adj = {n: set() for n in nodes}
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    active = set(nodes)
    color, rnd = {}, {}
    for r in range(1, n_rounds + 1):
        winners = [n for n in active
                   if all((_prio(n), n) < (_prio(m), m)
                          for m in adj[n] & active)]
        for n in winners:
            used = {color[m] for m in adj[n] if m in color}
            c = 0
            while c in used:
                c += 1
            color[n], rnd[n] = c, r
        active -= set(winners)
        if not active:
            break
    for n in active:
        color[n], rnd[n] = -1, 0
    return {n: (color[n], rnd[n]) for n in nodes}


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["graph_coloring"](spark, SF),
                      con.sql(ORACLE["graph_coloring"]).df())
    assert ok, msg


def test_matches_serial_and_proper(spark):
    """Whole-table equality against the serial JP replica on a graph
    with a triangle, a path, an isolated node, and a star — plus the
    property the operator exists for: the coloring is PROPER (no edge
    joins two equal colors) and the triangle needs >= 3 colors."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        jp_coloring)

    nodes = [f"n{i}" for i in range(9)]
    edges = [("n0", "n1"), ("n1", "n2"), ("n0", "n2"),   # triangle
             ("n3", "n4"), ("n4", "n5"),                 # path
             # star: n6 center
             ("n6", "n7"), ("n6", "n8"), ("n6", "n0")]
    edf = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], ["src", "dst"])
    ndf = spark.createDataFrame([(n,) for n in nodes], ["node"])
    got = {r.node: (r.color, r.decided_round)
           for r in jp_coloring(edf, ndf).collect()}

    assert got == _serial_jp(edges, nodes)

    colors = {n: c for n, (c, _) in got.items()}
    assert all(c >= 0 for c in colors.values())          # all decided
    for a, b in edges:
        assert colors[a] != colors[b]                    # proper
    assert len({colors[n] for n in ("n0", "n1", "n2")}) == 3
    # isolated node colors 0 in round 1
    iso = [n for n in nodes
           if not any(n in e for e in edges)]
    assert all(got[n] == (0, 1) for n in iso)
