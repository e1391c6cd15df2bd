"""Cross-engine parity + the MIS invariants for continuation batch
34: Luby's maximal independent set over the entity co-mention graph
(graph_algos.luby_mis, derandomized md5-hex6 priorities, 6 rounds)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.fixture(scope="module")
def result(spark):
    from ehr_relation_extraction_spark import driver_queries as dq

    rows = dq.QUERIES["mis_nodes"](spark, SF).collect()
    edges, nodes = dq._comention_graph(spark, SF)
    adj = [(r.src, r.dst) for r in edges.collect()]
    return rows, adj, {r.node for r in nodes.collect()}


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["mis_nodes"](spark, SF),
                      con.sql(ORACLE["mis_nodes"]).df())
    assert ok, msg


def test_partition_of_nodes(result):
    """Every node is decided exactly once (or reported undecided)."""
    rows, _, nodes = result
    got = [r.node for r in rows]
    assert sorted(got) == sorted(nodes)
    assert all(r.in_mis in (1, 0, -1) for r in rows)
    assert all((r.in_mis == -1) == (r.decided_round == 0) for r in rows)


def test_independence(result):
    """No two selected nodes share a co-mention edge — the defining
    MIS property, checked against the raw edge list."""
    rows, adj, _ = result
    sel = {r.node for r in rows if r.in_mis == 1}
    assert sel, "MIS should be non-empty on a non-empty graph"
    for a, b in adj:
        assert not (a in sel and b in sel), (a, b)


def test_excluded_have_selected_neighbor(result):
    """Every excluded node retired because a neighbor won in the SAME
    round (Luby's exclusion rule), so each excluded node must have a
    selected neighbor with decided_round == its own."""
    rows, adj, _ = result
    round_of = {r.node: (r.in_mis, r.decided_round) for r in rows}
    nbrs: dict[str, set] = {}
    for a, b in adj:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for r in rows:
        if r.in_mis == 0:
            assert any(round_of[m] == (1, r.decided_round)
                       for m in nbrs.get(r.node, ())), r.node


def test_maximality_if_converged(result):
    """If no node is undecided (6 rounds converged at this scale),
    the set is MAXIMAL: every non-selected node has a selected
    neighbor, so no node can be added without breaking independence."""
    rows, adj, _ = result
    undecided = [r.node for r in rows if r.in_mis == -1]
    assert not undecided, "Luby did not converge in 6 rounds at sf0.001"
    sel = {r.node for r in rows if r.in_mis == 1}
    nbrs: dict[str, set] = {}
    for a, b in adj:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for r in rows:
        if r.in_mis == 0:
            assert nbrs.get(r.node, set()) & sel, r.node
