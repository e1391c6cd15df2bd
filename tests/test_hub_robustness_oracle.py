"""Cross-engine parity + serial ground truth for continuation
batch 97 (operators/graph_algos.hub_robustness)."""

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

    ok, msg = compare(QUERIES["hub_robustness"](spark, SF),
                      con.sql(ORACLE["hub_robustness"]).df())
    assert ok, msg


def _serial(edges, k=3):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    hubs = sorted(nodes, key=lambda n: (-len(adj[n]), n))[:k]

    def comps(ns, blocked):
        seen, out = set(), {}
        for n in ns:
            if n in seen or n in blocked:
                continue
            stack, comp = [n], []
            while stack:
                x = stack.pop()
                if x in seen or x in blocked:
                    continue
                seen.add(x)
                comp.append(x)
                stack.extend(adj[x] - blocked)
            out[min(comp)] = len(comp)
        return out

    return ({h: len(adj[h]) for h in hubs},
            comps(nodes, set()), comps(nodes, set(hubs)))


def test_star_of_stars_shatters_without_hubs(spark):
    """A hub-and-spoke topology: three stars chained through their
    centers plus one separate triangle.  Removing the 3 centers must
    shatter the big component into singletons while the triangle
    survives untouched — phases equal the serial replica exactly."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        hub_robustness)

    edges = []
    for c in ("h1", "h2", "h3"):
        edges += [(c, f"{c}_leaf{i}") for i in range(4)]
    edges += [("h1", "h2"), ("h2", "h3")]          # chain the centers
    edges += [("t1", "t2"), ("t2", "t3"), ("t1", "t3")]
    hubs, before, after = _serial(edges)

    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = hub_robustness(df, k=3).collect()
    got_h = {r.node: r.size for r in rows if r.phase == "hub"}
    got_b = {r.node: r.size for r in rows if r.phase == "before"}
    got_a = {r.node: r.size for r in rows if r.phase == "after"}
    assert got_h == hubs == {"h1": 5, "h2": 6, "h3": 5}
    assert got_b == before
    assert max(before.values()) == 15              # the chained stars
    assert got_a == after
    assert max(got_a.values()) == 3                # only the triangle
    assert sum(1 for s in got_a.values() if s == 1) == 12
