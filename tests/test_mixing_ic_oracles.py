"""Cross-engine parity + brute-force semantics for continuation
batches 50 (type-mixing matrix) and 51 (deterministic independent-
cascade spread)."""

from __future__ import annotations

import hashlib

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("key", ["type_mixing", "ic_spread"])
def test_oracle_parity(spark, con, key):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[key](spark, SF),
                      con.sql(ORACLE[key]).df())
    assert ok, msg


def test_mixing_brute_force(spark):
    """Matrix counts equal direct tallying over the collected edges
    and elected types; shares sum to <= 1e6 and use the global
    typed-edge total."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.operators import linking as lk

    _, linked, _ = dq._linked(spark, SF)
    edges, _ = dq._comention_graph(spark, SF)
    types = {r.canonical_id: r.major_type
             for r in lk.entity_type_election(linked).collect()}
    cnt: dict[tuple, int] = {}
    for r in edges.collect():
        if r.src in types and r.dst in types:
            k = tuple(sorted((types[r.src], types[r.dst])))
            cnt[k] = cnt.get(k, 0) + 1
    tot = sum(cnt.values())
    got = {(r.type_a, r.type_b): (r.n_edges, r.share_micro6)
           for r in dq.QUERIES["type_mixing"](spark, SF).collect()}
    assert got == {k: (v, v * 1000000 // tot) for k, v in cnt.items()}
    assert got and sum(s for _, s in got.values()) <= 1000000


def _hex6(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)


def test_ic_brute_force(spark):
    """Activation rounds equal BFS over the md5-coin live subgraph
    from the smallest node, replicated in plain Python."""
    from ehr_relation_extraction_spark import driver_queries as dq

    edges, nodes = dq._comention_graph(spark, SF)
    live: dict[str, set] = {}
    for r in edges.collect():
        a, b = sorted((r.src, r.dst))
        if _hex6(f"ic:{a}:{b}") % 100 < 35:
            live.setdefault(a, set()).add(b)
            live.setdefault(b, set()).add(a)
    seed = min(r.node for r in nodes.collect())
    dist = {seed: 0}
    frontier = [seed]
    d = 0
    while frontier and d < 25:
        d += 1
        nxt = []
        for n in frontier:
            for m in live.get(n, ()):
                if m not in dist:
                    dist[m] = d
                    nxt.append(m)
        frontier = nxt

    got = {r.node: r.activated_round
           for r in dq.QUERIES["ic_spread"](spark, SF).collect()}
    assert got == dist
    assert len(got) > 1, "cascade should spread beyond the seed"
