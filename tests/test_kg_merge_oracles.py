"""Cross-engine parity + semantics for continuation batch 5:
attribute-based entity merge clusters (CC over the thresholded
Jaccard graph) and Weisfeiler-Lehman structural-role labels."""

from __future__ import annotations

import hashlib

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

KEYS = ["attr_merge_clusters", "wl_labels"]


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


def test_attr_merge_clusters_vs_union_find(spark):
    """The distributed CC equals a driver-side union-find over the
    same thresholded Jaccard edges."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.operators.triples import (
        entity_attr_jaccard)

    tri = dq._frames(spark, SF).triples
    edges = [(r.subj_a, r.subj_b)
             for r in entity_attr_jaccard(tri).collect()
             if r.jac_micro6 >= 500000]
    got = {r.subj: r.cluster
           for r in dq.QUERIES["attr_merge_clusters"](spark, SF).collect()}
    parent = {n: n for n in got}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical rep = min node id per component
    comp = {}
    for n in got:
        comp.setdefault(find(n), []).append(n)
    expect = {n: min(ms) for r, ms in comp.items() for n in ms}
    assert got == expect and got


def test_attr_merge_edges_within_one_cluster(spark):
    """Every thresholded edge's endpoints share a cluster, and every
    cluster id is a member of its own cluster."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.operators.triples import (
        entity_attr_jaccard)

    got = {r.subj: r.cluster
           for r in dq.QUERIES["attr_merge_clusters"](spark, SF).collect()}
    tri = dq._frames(spark, SF).triples
    for r in entity_attr_jaccard(tri).collect():
        if r.jac_micro6 >= 500000:
            assert got[r.subj_a] == got[r.subj_b]
    for subj, cl in got.items():
        assert got[cl] == cl


def test_wl_labels_vs_serial_replica(spark):
    """The distributed WL refinement bit-equals a serial Python
    replica of the same recurrence on the same graph."""
    from ehr_relation_extraction_spark import driver_queries as dq

    edges, nodes_df = dq._comention_graph(spark, SF)
    und = {(min(r.src, r.dst), max(r.src, r.dst))
           for r in edges.collect() if r.src != r.dst}
    nodes = [r.node for r in nodes_df.collect()]
    nbrs = {n: set() for n in nodes}
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lbl = {n: str(len(nbrs[n])) for n in nodes}
    for _ in range(3):
        lbl = {n: hashlib.md5(
            (lbl[n] + "|" + ",".join(sorted(lbl[m] for m in nbrs[n])))
            .encode()).hexdigest() for n in nodes}
    hist = {}
    for v in lbl.values():
        hist[v] = hist.get(v, 0) + 1
    expect = {n: (v, hist[v]) for n, v in lbl.items()}
    got = {r.node: (r.wl_label, r.n_role)
           for r in dq.QUERIES["wl_labels"](spark, SF).collect()}
    assert got == expect and got


def test_wl_labels_refine_degree_classes(spark):
    """WL labels only refine: nodes sharing a final label must share
    a degree (round-0 label)."""
    from ehr_relation_extraction_spark import driver_queries as dq

    edges, _ = dq._comention_graph(spark, SF)
    deg = {}
    for r in edges.collect():
        if r.src != r.dst:
            deg[r.src] = deg.get(r.src, 0) + 1
            deg[r.dst] = deg.get(r.dst, 0) + 1
    by_label = {}
    for r in dq.QUERIES["wl_labels"](spark, SF).collect():
        by_label.setdefault(r.wl_label, set()).add(deg.get(r.node, 0))
    assert by_label
    for degs in by_label.values():
        assert len(degs) == 1
