"""Cross-engine parity + semantics for continuation batch 31: the
directed mention-precedence graph (precedence_edges), its strongly
connected components via forward-backward min-label peeling
(scc_components), and the Broder-style bowtie decomposition
(bowtie_structure).  The DuckDB oracle derives SCC membership from
the transitive closure (mutual reachability), a completely different
algorithm from the Spark side's peeling loop — plus a third,
pure-Python Tarjan check below, so three independent algorithms must
agree.  Same compare as the driver replica, at sf0.001."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

KEYS = ["precedence_edges", "scc_components", "bowtie_structure"]


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", KEYS)
def test_oracle_parity(spark, con, name):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[name](spark, SF),
                      con.sql(ORACLE[name]).df())
    assert ok, f"{name}: {msg}"


def _tarjan_sccs(nodes, edges):
    """Iterative Tarjan — the third, driver-side SCC algorithm."""
    adj = {n: [] for n in nodes}
    for a, b in edges:
        adj[a].append(b)
    index, low, onstk, stk, sccs = {}, {}, {}, [], []
    cnt = [0]
    for root in nodes:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            n, i = work.pop()
            if i == 0:
                index[n] = low[n] = cnt[0]
                cnt[0] += 1
                stk.append(n)
                onstk[n] = True
            descend = False
            for j in range(i, len(adj[n])):
                w = adj[n][j]
                if w not in index:
                    work.append((n, j + 1))
                    work.append((w, 0))
                    descend = True
                    break
                if onstk.get(w):
                    low[n] = min(low[n], index[w])
            if descend:
                continue
            for w in adj[n]:
                if onstk.get(w):
                    low[n] = min(low[n], low[w])
            if low[n] == index[n]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk[w] = False
                    comp.append(w)
                    if w == n:
                        break
                sccs.append(comp)
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[n])
    return sccs


def _graph(spark):
    from ehr_relation_extraction_spark import driver_queries as dq

    edges = [(r.src, r.dst)
             for r in dq.QUERIES["precedence_edges"](spark, SF).collect()]
    scc = {r.node: r.scc_id
           for r in dq.QUERIES["scc_components"](spark, SF).collect()}
    return edges, scc


def test_scc_matches_tarjan(spark):
    """The peeling result equals Tarjan's partition with min-member
    component ids — algorithm #3 agreeing with #1 (Spark peeling)
    and #2 (closure oracle)."""
    edges, scc = _graph(spark)
    expect = {}
    for comp in _tarjan_sccs(sorted(scc), edges):
        m = min(comp)
        for n in comp:
            expect[n] = m
    assert scc == expect and scc


def test_scc_nontrivial_at_test_scale(spark):
    """The precedence graph genuinely cycles at sf0.001 — at least
    one multi-node SCC exists, so the parity above is not vacuous."""
    _, scc = _graph(spark)
    from collections import Counter

    assert max(Counter(scc.values()).values()) >= 2


def test_bowtie_classes_sound(spark):
    """CORE is exactly the largest SCC (ties -> min id); every IN
    node reaches the core and no core reaches it back; every OUT node
    is reached by the core and reaches nothing in it; OTHER touches
    the core in neither direction (checked by Python BFS)."""
    from collections import Counter

    from ehr_relation_extraction_spark import driver_queries as dq

    edges, scc = _graph(spark)
    cls = {r.node: r.bowtie_class
           for r in dq.QUERIES["bowtie_structure"](spark, SF).collect()}
    sizes = Counter(scc.values())
    core_id = min(sorted(sizes), key=lambda s: (-sizes[s], s))
    core = {n for n, s in scc.items() if s == core_id}

    fwd, bwd = {}, {}
    for a, b in edges:
        fwd.setdefault(a, set()).add(b)
        bwd.setdefault(b, set()).add(a)

    def bfs(seed, adj):
        seen = set(seed)
        frontier = list(seed)
        while frontier:
            nxt = [w for v in frontier for w in adj.get(v, ()) if w not in seen]
            seen.update(nxt)
            frontier = nxt
        return seen

    reaches_core = bfs(core, bwd)
    core_reaches = bfs(core, fwd)
    for n in scc:
        expect = ("CORE" if n in core
                  else "IN" if n in reaches_core
                  else "OUT" if n in core_reaches
                  else "OTHER")
        assert cls[n] == expect, (n, cls[n], expect)
    assert set(cls) == set(scc)
