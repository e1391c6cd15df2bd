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


# ---------------------------------------------------------------------------
# fuzzy alias discovery (long-tail linking, trigram posting-list join)
# ---------------------------------------------------------------------------

def test_fuzzy_alias_candidates_hand_computed(spark):
    from ehr_relation_extraction_spark.operators.linking import (
        fuzzy_alias_candidates)

    gaz = (("slow merge", "Event", "event:slowmerge"),
           ("spark", "Topic", "topic:spark"))
    toks = spark.createDataFrame(
        [("merge",), ("merge",), ("sparks",), ("spark",), ("ab",), ("xyz",)],
        "token string")
    got = {(r["surface"], r["alias"]):
           (r["n_occur"], r["n_inter"], r["n_union"],
            r["jaccard_micro6"], r["cand_rank"])
           for r in fuzzy_alias_candidates(toks, gazetteer=gaz,
                                           min_jaccard_pct=25).collect()}
    # "merge" {mer,erg,rge} vs "slow merge" (8 trigrams): 3/8 = 0.375
    assert got[("merge", "slow merge")] == (2, 3, 8, 375000, 1)
    # "sparks" {spa,par,ark,rks} vs "spark" {spa,par,ark}: 3/4 = 0.75
    assert got[("sparks", "spark")] == (1, 3, 4, 750000, 1)
    # exact aliases excluded (long tail only); len<3 and no-overlap dropped
    assert set(got) == {("merge", "slow merge"), ("sparks", "spark")}


def test_fuzzy_alias_candidates_rank_and_threshold(spark):
    from ehr_relation_extraction_spark.operators.linking import (
        fuzzy_alias_candidates)

    gaz = (("abcd", "Topic", "t:abcd"), ("abce", "Topic", "t:abce"))
    toks = spark.createDataFrame([("abcdx",)], "token string")
    rows = (fuzzy_alias_candidates(toks, gazetteer=gaz, min_jaccard_pct=25)
            .orderBy("cand_rank").collect())
    # abcdx {abc,bcd,cdx} vs abcd {abc,bcd}: 2/3; vs abce {abc,bce}: 1/4
    assert [(r["alias"], r["jaccard_micro6"], r["cand_rank"])
            for r in rows] == [("abcd", 666666, 1), ("abce", 250000, 2)]
