"""Cross-engine parity + semantics for continuation batch 7:
per-batch trending entities, fixed-round weighted shortest paths
(Bellman-Ford min-plus), and reciprocal-best-match alignment."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

KEYS = ["trending_entities", "graph_distances", "jaccard_best_match"]


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


def test_trending_entities_topk_shape(spark):
    """Per batch: at most 3 rows, ranks are 1..k dense, counts are
    non-increasing with rank."""
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    by_batch = {}
    for r in QUERIES["trending_entities"](spark, SF).collect():
        by_batch.setdefault(r.batch, []).append(r)
    assert by_batch
    for rows in by_batch.values():
        rows.sort(key=lambda r: r.rank)
        assert 1 <= len(rows) <= 3
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a.n_mentions >= b.n_mentions
        for r in rows:
            assert r.lift_micro6 >= 0


def test_graph_distances_vs_serial_bellman_ford(spark):
    """The distributed min-plus relaxation equals a serial replica of
    the same 5-round recurrence on the same weighted graph."""
    from ehr_relation_extraction_spark import driver_queries as dq

    ge = dq.q_graph_edges(spark, SF)
    w = {}
    for r in ge.collect():
        k = (r.subj_node, r.obj_node)
        w[k] = w.get(k, 0) + r.weight
    cost = {k: 1_000_000 // v for k, v in w.items()}
    nodes = {a for a, _ in cost} | {b for _, b in cost}
    source = min(nodes)
    inf = 1 << 60
    dist = {n: (0 if n == source else inf) for n in nodes}
    for _ in range(5):
        nd = dict(dist)
        for (a, b), c in cost.items():
            if dist[a] < inf and dist[a] + c < nd[b]:
                nd[b] = dist[a] + c
        dist = nd
    expect = {n: d for n, d in dist.items() if d < inf}
    got = {r.node: r.dist_cost
           for r in dq.QUERIES["graph_distances"](spark, SF).collect()}
    assert got == expect and got


def test_jaccard_best_match_is_mutual_argmax(spark):
    """Every returned pair is each side's single best match under
    (jac desc, name asc), recomputed driver-side."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.operators.triples import (
        entity_attr_jaccard)

    tri = dq._frames(spark, SF).triples
    sym = {}
    for r in entity_attr_jaccard(tri).collect():
        sym.setdefault(r.subj_a, []).append((r.subj_b, r.jac_micro6))
        sym.setdefault(r.subj_b, []).append((r.subj_a, r.jac_micro6))
    best = {me: min(cands, key=lambda c: (-c[1], c[0]))
            for me, cands in sym.items()}
    expect = {(a, best[a][0], best[a][1]) for a in best
              if a < best[a][0] and best[best[a][0]][0] == a}
    got = {(r.subj_a, r.subj_b, r.jac_micro6)
           for r in dq.QUERIES["jaccard_best_match"](spark, SF).collect()}
    assert got == expect and got
