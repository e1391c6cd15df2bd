"""Connected-components correctness on random graphs vs union-find."""

from __future__ import annotations

import random


def union_find_components(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # representative = min node id in component
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min.setdefault(r, n if n < r else r)
        comp_min[r] = min(comp_min[r], n)
    return {n: comp_min[find(n)] for n in nodes}


def run_cc(spark, nodes, edges):
    from ehr_relation_extraction_spark.operators.linking import connected_components

    e_df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [("__x__", "__x__")], "src string, dst string")
    n_df = spark.createDataFrame([(n,) for n in nodes], "node string")
    got = {r["node"]: r["component"]
           for r in connected_components(e_df, n_df).collect()
           if r["node"] != "__x__"}
    return got


def test_cc_chain(spark):
    nodes = [f"n{i:02d}" for i in range(10)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(9)]
    got = run_cc(spark, nodes, edges)
    assert set(got.values()) == {"n00"}


def test_cc_random_graphs(spark):
    rng = random.Random(7)
    nodes = [f"v{i:03d}" for i in range(60)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(45)]
    expected = union_find_components(nodes, edges)
    got = run_cc(spark, nodes, edges)
    assert got == expected


def test_cc_isolated_nodes(spark):
    got = run_cc(spark, ["a", "b", "c"], [("a", "b")])
    assert got == {"a": "a", "b": "a", "c": "c"}
