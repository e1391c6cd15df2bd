"""Cross-engine parity + serial ground truth for continuation
batch 118 (operators/graph_algos.salsa_scores)."""

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

    ok, msg = compare(QUERIES["salsa_scores"](spark, SF),
                      con.sql(ORACLE["salsa_scores"]).df())
    assert ok, msg


def _serial_salsa(edges):
    indeg = {}
    for _, d in edges:
        indeg[d] = indeg.get(d, 0) + 1
    # authority components: authorities connected through shared hubs
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    by_hub = {}
    for s, d in edges:
        by_hub.setdefault(s, []).append(d)
    for ds in by_hub.values():
        for d in ds[1:]:
            union(ds[0], d)
    comp = {a: find(a) for a in indeg}
    # normalize component label to min member (authority) id
    label = {}
    for a, r in comp.items():
        label.setdefault(r, a)
        label[r] = min(label[r], a)
    cw = {}
    for a in indeg:
        cw[label[comp[a]]] = cw.get(label[comp[a]], 0) + indeg[a]
    k = len(cw)
    return {a: (indeg[a], label[comp[a]], cw[label[comp[a]]], k,
                (10**9 * indeg[a]) // (k * cw[label[comp[a]]]))
            for a in indeg}


def test_matches_serial_salsa(spark):
    """Two disconnected authority communities plus a multi-edge: the
    closed form must equal a union-find + in-degree replay, and total
    mass must split equally between components."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        salsa_scores)

    edges = [("h1", "a1"), ("h1", "a2"), ("h2", "a2"), ("h2", "a1"),
             ("h3", "a1"),                 # community 1: a1, a2
             ("h4", "b1"), ("h4", "b2"), ("h5", "b2"), ("h5", "b2")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: (r.in_deg, r.component, r.comp_in_w,
                    r.n_components, r.salsa_nano)
           for r in salsa_scores(df).collect()}
    assert got == _serial_salsa(edges)
    # component-weighted convention: each component's scores sum to
    # ~1e9 / k (floor truncation aside)
    for cid in {v[1] for v in got.values()}:
        tot = sum(v[4] for v in got.values() if v[1] == cid)
        assert abs(tot - 10**9 // 2) <= len(got)


def test_hub_blowup_free_components(spark):
    """A single hub pointing at 30 authorities: all 30 land in ONE
    component without any pairwise expansion, each with equal
    score."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        salsa_scores)

    edges = [("hub", f"a{i:02d}") for i in range(30)]
    rows = salsa_scores(
        spark.createDataFrame(edges, ["src", "dst"])).collect()
    assert len(rows) == 30
    assert {r.component for r in rows} == {"a00"}
    assert {r.salsa_nano for r in rows} == {10**9 // 30}
