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


# ---------------------------------------------------------------------------
# as-of join / PMI co-occurrence / hash-stable corpus split
# ---------------------------------------------------------------------------

def test_asof_attribution_semantics(spark):
    from ehr_relation_extraction_spark.operators.events import (
        asof_attribution)

    rows = [
        # user 1: click @10, purchase @20 (attributed), click @30 (after,
        # ignored), purchase @40 (attributed to @30)
        (1, "2024-01-01 00:00:10", 1, "click"),
        (2, "2024-01-01 00:00:20", 1, "purchase"),
        (3, "2024-01-01 00:00:30", 1, "click"),
        (4, "2024-01-01 00:00:40", 1, "purchase"),
        # user 2: purchase with NO prior click -> NULLs
        (5, "2024-01-01 00:00:15", 2, "purchase"),
        # user 3: tie at the same ts — click has LOWER event_id, counts
        (6, "2024-01-01 00:00:50", 3, "click"),
        (7, "2024-01-01 00:00:50", 3, "purchase"),
        # other types never interfere
        (8, "2024-01-01 00:00:05", 1, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
                 "event_type")
    got = {r["purchase_id"]: (r["click_id"], r["lag_us"])
           for r in asof_attribution(ev).collect()}
    assert got[2] == (1, 10_000_000)
    assert got[4] == (3, 10_000_000)
    assert got[5] == (None, None)
    assert got[7] == (6, 0)


def test_cooccurrence_pmi_hand_computed(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        cooccurrence_pmi)

    # 4 docs; (aaa,bbb) together in 2, aaa in 3, bbb in 3
    docs = spark.createDataFrame(
        [(1, "aaa bbb xx"), (2, "aaa bbb"), (3, "aaa ccc"), (4, "bbb ccc")],
        "doc_id long, text string")
    got = {(r["tok_a"], r["tok_b"]): r
           for r in cooccurrence_pmi(docs, min_docs_ab=1).collect()}
    r = got[("aaa", "bbb")]
    # ratio = 2*4 / (3*3) = 0.888...; floor-scaled and token 'xx' (len<3)
    # never appears
    assert (r["n_docs_a"], r["n_docs_b"], r["n_docs_ab"],
            r["pmi_ratio_micro6"]) == (3, 3, 2, 888888)
    assert not any("xx" in k for k in got)
    # support filter prunes the long tail
    assert ("aaa", "ccc") in got
    docs2 = cooccurrence_pmi(docs, min_docs_ab=2).collect()
    assert {(r["tok_a"], r["tok_b"]) for r in docs2} == {("aaa", "bbb")}


def test_corpus_split_stable_and_bounded(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        train_dev_test_split)

    docs = spark.createDataFrame([(i, "t") for i in range(400)],
                                 "doc_id long, text string")
    rows = train_dev_test_split(docs).collect()
    assert all(0 <= r["bucket"] < 256 for r in rows)
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "dev", "test"}
    # hash split is partition-stable: same assignment at any layout
    rows2 = train_dev_test_split(docs.repartition(13)).collect()
    assert {(r["doc_id"], r["split"]) for r in rows} == \
           {(r["doc_id"], r["split"]) for r in rows2}


def test_bigram_lm_hand_computed(spark):
    from ehr_relation_extraction_spark.functions.textstats import bigram_lm

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b")], "doc_id long, text string")
    got = {(r["w1"], r["w2"]): (r["c_bigram"], r["c_w1"], r["p_micro6"])
           for r in bigram_lm(docs, min_count=1).collect()}
    # 'a b' x3 of c(a)=3; 'b' precedes something twice (doc2's trailing
    # 'b' has no successor; doc boundaries never pair)
    assert got[("a", "b")] == (3, 3, 1_000_000)
    assert got[("b", "a")] == (1, 2, 500_000)
    assert got[("b", "c")] == (1, 2, 500_000)
    assert set(got) == {("a", "b"), ("b", "a"), ("b", "c")}


def test_corpus_curation_reasons(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        corpus_curation)

    long_ok = " ".join(
        ["the", "a", "of", "and"] * 2 + [f"w{i}" for i in range(16)])
    dup = "the a of w1 w2 w3 " * 4  # 24 tokens but only 6 distinct (25%)
    docs = spark.createDataFrame(
        [(1, long_ok), (2, long_ok),      # 2 = exact duplicate of 1
         (3, "short doc here"),           # too_short
         (4, dup),                        # low_diversity
         (5, " ".join(f"u{i}" for i in range(30)))],  # not_english
        "doc_id long, text string")
    got = {r["doc_id"]: (r["keep"], r["reason"])
           for r in corpus_curation(docs).collect()}
    assert got[1] == (1, "ok")
    assert got[2] == (0, "duplicate")
    assert got[3] == (0, "too_short")
    assert got[4] == (0, "low_diversity")
    assert got[5] == (0, "not_english")


def test_balance_classes_cap_and_stability(spark):
    from ehr_relation_extraction_spark.operators.pairs import balance_classes

    rows = [(f"u{i}", f"R{i}", "Money-Topic", i % 2) for i in range(40)]
    df = spark.createDataFrame(
        rows, "url string, rel_id string, rel_type string, label int")
    kept = balance_classes(df, per_class=5).collect()
    by_class = {}
    for r in kept:
        by_class.setdefault((r["rel_type"], r["label"]), []).append(r)
    assert all(len(v) == 5 for v in by_class.items() and by_class.values())
    # deterministic under repartition
    kept2 = balance_classes(df.repartition(7), per_class=5).collect()
    assert {(r["url"], r["rel_id"]) for r in kept} == \
           {(r["url"], r["rel_id"]) for r in kept2}
