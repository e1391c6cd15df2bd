"""Cross-engine parity + serial ground truth for continuation
batch 86 (operators/graph_algos.single_linkage_clusters)."""

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

    ok, msg = compare(QUERIES["single_linkage"](spark, SF),
                      con.sql(ORACLE["single_linkage"]).df())
    assert ok, msg


def test_msf_cut_equals_direct_single_linkage(spark):
    """The identity the operator rides: clusters from the MSF cut
    equal SINGLE-LINKAGE clusters computed directly (connected
    components of ALL edges with cost <= T) — verified on a weighted
    graph where the MSF drops intra-cluster edges, plus a chain that
    merges only at the looser cut."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        single_linkage_clusters)

    # cluster {a,b,c}: cheap triangle (MSF drops one edge of it);
    # chain c -200- d: above the tight cut, below the loose one;
    # {d,e}: cheap pair; isolated f.
    edges = [("a", "b", 10), ("b", "c", 20), ("a", "c", 30),
             ("c", "d", 200), ("d", "e", 15)]
    nodes = ["a", "b", "c", "d", "e", "f"]
    edf = spark.createDataFrame(edges, ["src", "dst", "cost"])
    ndf = spark.createDataFrame([(n,) for n in nodes], ["node"])

    def direct(cut):
        adj = {n: set() for n in nodes}
        for s, d, c in edges:
            if c <= cut:
                adj[s].add(d)
                adj[d].add(s)
        seen, out = {}, {}
        for n in sorted(nodes):
            if n in seen:
                continue
            stack, comp = [n], []
            while stack:
                x = stack.pop()
                if x in seen:
                    continue
                seen[x] = True
                comp.append(x)
                stack.extend(adj[x])
            cid = min(comp)
            for x in comp:
                out[x] = (cid, len(comp))
        return out

    for cut, merged in ((100, False), (500, True)):
        got = {r.node: (r.cluster_id, r.cluster_size)
               for r in single_linkage_clusters(
                   edf, ndf, cut_cost=cut).collect()}
        assert got == direct(cut)
        assert (got["a"][0] == got["d"][0]) == merged
    tight = {r.node: r.cluster_id
             for r in single_linkage_clusters(
                 edf, ndf, cut_cost=100).collect()}
    assert tight["f"] == "f"          # singleton kept
    assert tight["a"] == tight["c"] != tight["d"]
