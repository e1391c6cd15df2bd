"""Cross-engine parity + brute-force semantics for continuation
batches 40 (co-citation / bibliographic coupling) and 41 (Boruvka
minimum spanning forest)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("key", ["cocitation", "msf_edges"])
def test_oracle_parity(spark, con, key):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[key](spark, SF),
                      con.sql(ORACLE[key]).df())
    assert ok, msg


def test_cocitation_brute_force(spark):
    """Pair counts equal common-in-neighbor / common-out-neighbor
    set intersections on the collected precedence graph."""
    from ehr_relation_extraction_spark import driver_queries as dq

    edges, _ = dq._prec_graph(spark, SF)
    ins: dict[str, set] = {}
    outs: dict[str, set] = {}
    for r in edges.collect():
        ins.setdefault(r.dst, set()).add(r.src)
        outs.setdefault(r.src, set()).add(r.dst)
    nodes = sorted(set(ins) | set(outs))
    expect = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            co = len(ins.get(a, set()) & ins.get(b, set()))
            cp = len(outs.get(a, set()) & outs.get(b, set()))
            if co or cp:
                expect[(a, b)] = (co, cp)
    got = {(r.node_a, r.node_b): (r.n_cocite, r.n_coupling)
           for r in dq.QUERIES["cocitation"](spark, SF).collect()}
    assert got == expect and got


class _DSU:
    def __init__(self):
        self.p: dict[str, str] = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        self.p[ra] = rb
        return True


def test_msf_matches_kruskal(spark):
    """Under the (cost, src, dst) total order the MSF is unique, so
    Boruvka's edge set must equal Kruskal's exactly — same edges,
    same total cost, forest size = n_nodes - n_components."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.operators import triples as tri_op
    from pyspark.sql import functions as F

    ej = tri_op.entity_attr_jaccard(
        dq._frames(spark, SF).triples)
    edges = sorted(
        ((1000000 - r.jac_micro6, r.subj_a, r.subj_b)
         for r in ej.collect()))
    dsu = _DSU()
    kruskal = set()
    for cost, a, b in edges:
        if dsu.union(a, b):
            kruskal.add((a, b, cost))

    rows = dq.QUERIES["msf_edges"](spark, SF).collect()
    got = {(r.subj_a, r.subj_b, r.cost) for r in rows}
    assert len(got) == len(rows), "forest edge duplicated"
    assert got == kruskal and got
    nodes = {a for _, a, _ in edges} | {b for _, _, b in edges}
    n_components = len({dsu.find(n) for n in nodes})
    assert len(got) == len(nodes) - n_components
