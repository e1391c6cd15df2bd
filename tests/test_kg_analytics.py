"""Round-5 continuation KG analytics: BM25 entity retrieval, entity
salience, predicate co-occurrence lift — hand-checked semantics +
cross-engine oracle parity + partition invariance."""

from __future__ import annotations

import math

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("key", ["bm25_entities", "entity_salience",
                                 "pred_lift"])
def test_kg_analytics_oracles(spark, con, key):
    from ehr_relation_extraction_spark.driver_queries import (
        ORACLE, QUERIES)

    ok, msg = compare(QUERIES[key](spark, SF), con.sql(ORACLE[key]).df())
    assert ok, msg


def test_bm25_hand_checked(spark):
    """Two docs, one probe term: the shorter doc with equal tf ranks
    first (length normalization), and score_micro6 matches the exact
    rational formula recomputed in plain Python."""
    from ehr_relation_extraction_spark.functions.textstats import (
        bm25_entity_retrieval)

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "cat dog mouse fish bird lion")],
        "doc_id long, text string")
    terms = spark.createDataFrame([("cat",)], "alias string")
    rows = {r.doc_id: r for r in
            bm25_entity_retrieval(docs, terms, k=10).collect()}
    # doc 1: tf=2 dl=3; doc 2: tf=1 dl=6; T=9, N=2, df=2
    T, N = 9, 2
    idf = math.floor(math.log((2 * N + 2) / (2 * 2 + 1)) * 1_000_000)
    exp1 = idf * (44 * T * 2) // (20 * T * 2 + 6 * T + 18 * 3 * N)
    exp2 = idf * (44 * T * 1) // (20 * T * 1 + 6 * T + 18 * 6 * N)
    assert rows[1].score_micro6 == exp1
    assert rows[2].score_micro6 == exp2
    assert rows[1].rank == 1 and rows[2].rank == 2


def test_salience_hand_checked(spark):
    """An entity holding 2 of a doc's 4 mentions starting at char 0 of
    a 100-char page scores exactly 500000 (half the mentions, maximal
    earliness)."""
    from ehr_relation_extraction_spark.operators.linking import (
        entity_salience)

    linked = spark.createDataFrame(
        [(1, "u", "e1", "T", 0, 5, "x", "c1"),
         (1, "u", "e2", "T", 50, 55, "x", "c1"),
         (1, "u", "e3", "T", 20, 25, "y", "c2"),
         (1, "u", "e4", "T", 80, 85, "z", "c3")],
        "doc_id long, url string, ent_id string, ent_type string, "
        "start int, end int, ent_text string, canonical_id string")
    pages = spark.createDataFrame([(1, "a" * 100)],
                                  "doc_id long, text string")
    got = {r.canonical_id: r.salience_micro6
           for r in entity_salience(linked, pages).collect()}
    assert got["c1"] == 2 * 100 * 1_000_000 // (4 * 100)  # 500000
    assert got["c2"] == 1 * 80 * 1_000_000 // (4 * 100)   # 200000
    assert got["c3"] == 1 * 20 * 1_000_000 // (4 * 100)   # 50000


def test_pred_lift_hand_checked(spark):
    """Perfectly co-occurring predicate pair over 2 of 2 subjects has
    lift exactly 1.0 (1000000 scaled); a pair seen on 1 of 2 subjects
    where each pred covers both has lift 0.5."""
    from ehr_relation_extraction_spark.operators.triples import (
        pred_cooccurrence)

    t = spark.createDataFrame(
        [("u1", "s", "A", "o"), ("u1", "s", "B", "o"),
         ("u2", "s", "A", "o"), ("u2", "s", "B", "o"),
         ("u1", "s", "C", "o")],
        "url string, subj string, pred string, obj string")
    got = {(r.pred_a, r.pred_b): r.lift_micro6
           for r in pred_cooccurrence(t).collect()}
    assert got[("A", "B")] == 2 * 2 * 1_000_000 // (2 * 2)  # 1.0
    assert got[("A", "C")] == 1 * 2 * 1_000_000 // (2 * 1)  # 1.0
    assert got[("B", "C")] == 1 * 2 * 1_000_000 // (2 * 1)


def test_kg_analytics_partition_invariance(spark):
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    df = QUERIES["bm25_entities"](spark, SF)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df.repartition(13).collect()))
    assert a == b


def test_pred_signatures_oracle(spark, con):
    from ehr_relation_extraction_spark.driver_queries import (
        ORACLE, QUERIES)

    ok, msg = compare(QUERIES["pred_signatures"](spark, SF),
                      con.sql(ORACLE["pred_signatures"]).df())
    assert ok, msg


def test_pred_signatures_hand_checked(spark):
    """A predicate split 3-to-1 across two subject types carries
    shares 750000/250000; a single-type predicate carries 1000000."""
    from ehr_relation_extraction_spark.operators.triples import (
        pred_signatures)

    triples = spark.createDataFrame(
        [("u1", "e1", "P", "o1"), ("u1", "e1", "P", "o2"),
         ("u2", "e1", "P", "o3"), ("u2", "e2", "P", "o4"),
         ("u1", "e1", "Q", "o5")],
        "url string, subj_id string, pred string, obj string")
    linked = spark.createDataFrame(
        [("u1", "e1", "A"), ("u2", "e1", "A"), ("u2", "e2", "B")],
        "url string, ent_id string, ent_type string")
    got = {(r.pred, r.subj_type): (r.n_triples, r.share_micro6)
           for r in pred_signatures(triples, linked).collect()}
    assert got[("P", "A")] == (3, 750000)
    assert got[("P", "B")] == (1, 250000)
    assert got[("Q", "A")] == (1, 1000000)


def test_pred_obj_linkage_oracle(spark, con):
    from ehr_relation_extraction_spark.driver_queries import (
        ORACLE, QUERIES)

    ok, msg = compare(QUERIES["pred_obj_linkage"](spark, SF),
                      con.sql(ORACLE["pred_obj_linkage"]).df())
    assert ok, msg


def test_pred_obj_linkage_hand_checked(spark):
    """A predicate whose objects link 1-of-4 into the dictionary
    carries share 250000; matching is case-folded."""
    from ehr_relation_extraction_spark.operators.triples import (
        pred_obj_linkage)

    triples = spark.createDataFrame(
        [("P", "Spark"), ("P", "12mg"), ("P", "42"), ("P", "blue"),
         ("Q", "TABLE")],
        "pred string, obj string")
    gaz = spark.createDataFrame(
        [("spark", "Topic", "topic:spark"), ("table", "Org", "org:table")],
        "alias string, ent_type string, canonical_id string")
    got = {r.pred: (r.n_triples, r.n_linked_obj, r.linked_share_micro6)
           for r in pred_obj_linkage(triples, gaz).collect()}
    assert got["P"] == (4, 1, 250000)
    assert got["Q"] == (1, 1, 1000000)


def test_entity_assoc_oracle(spark, con):
    from ehr_relation_extraction_spark.driver_queries import (
        ORACLE, QUERIES)

    ok, msg = compare(QUERIES["entity_assoc"](spark, SF),
                      con.sql(ORACLE["entity_assoc"]).df())
    assert ok, msg


def test_entity_assoc_hand_checked(spark):
    """Two entities sharing both their docs in a 4-doc corpus carry
    lift 4/(2*2) = 1.0; a pair sharing 1 doc where one entity covers
    all 4 docs carries lift 4/(4*1) = 1.0; support filter prunes."""
    from ehr_relation_extraction_spark.operators.linking import (
        entity_associations)

    rows = []
    for d in (1, 2, 3, 4):
        rows.append((d, "everywhere"))
    for d in (1, 2):
        rows.append((d, "pair1"))
        rows.append((d, "pair2"))
    linked = spark.createDataFrame(
        [(d, e) for d, e in rows],
        "doc_id long, canonical_id string")
    got = {(r.ent_a, r.ent_b): r.lift_micro6
           for r in entity_associations(linked, min_docs_ab=2).collect()}
    assert got[("pair1", "pair2")] == 4 * 2 * 1_000_000 // (2 * 2)  # 2.0
    assert got[("everywhere", "pair1")] == 4 * 2 * 1_000_000 // (4 * 2)
    # support filter: nothing with n_docs_ab < 2 appears
    assert all(k in {("pair1", "pair2"), ("everywhere", "pair1"),
                     ("everywhere", "pair2")} for k in got)


def test_walk_centrality_oracle(spark, con):
    from ehr_relation_extraction_spark.driver_queries import (
        ORACLE, QUERIES)

    ok, msg = compare(QUERIES["walk_centrality"](spark, SF),
                      con.sql(ORACLE["walk_centrality"]).df())
    assert ok, msg


def test_walk_centrality_hand_checked(spark):
    """On a path a-b-c, b is on every walk that moves (the bridge):
    visit counts follow directly from the deterministic hops, and
    n_starts is walks_per_node for every node."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        random_walks, walk_centrality)

    edges = spark.createDataFrame([("a", "b"), ("b", "c")],
                                  "src string, dst string")
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)],
                                  "node string")
    walks = random_walks(edges, nodes, walk_len=2, walks_per_node=1)
    got = {r.node: (r.n_visits, r.n_walks_through, r.n_starts)
           for r in walk_centrality(walks).collect()}
    # every node starts exactly 1 walk; totals must be conserved
    assert all(v[2] == 1 for v in got.values())
    assert sum(v[0] for v in got.values()) == walks.count()
    # b is adjacent to both ends, so every moving walk passes it:
    # all 3 walks touch b (its own + both neighbors' first hop)
    assert got["b"][1] == 3


def test_degree_dist_oracle(spark, con):
    from ehr_relation_extraction_spark.driver_queries import (
        ORACLE, QUERIES)

    ok, msg = compare(QUERIES["degree_dist"](spark, SF),
                      con.sql(ORACLE["degree_dist"]).df())
    assert ok, msg


def test_degree_dist_hand_checked(spark):
    """A star K1,3 plus a duplicate-orientation edge: the hub has
    degree 3, the three leaves degree 1, and the reversed duplicate
    edge counts ONCE (canonical orientation before symmetrize)."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        degree_distribution)

    edges = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c"), ("a", "h")],
        "src string, dst string")
    got = {r.degree: r.n_nodes
           for r in degree_distribution(edges).collect()}
    assert got == {3: 1, 1: 3}


def test_rrf_fusion_oracle(spark, con):
    from ehr_relation_extraction_spark.driver_queries import (
        ORACLE, QUERIES)

    ok, msg = compare(QUERIES["rrf_fusion"](spark, SF),
                      con.sql(ORACLE["rrf_fusion"]).df())
    assert ok, msg


def test_rrf_fusion_hand_checked(spark):
    """A candidate ranked 2nd by BOTH lists outranks the candidates
    each list put 1st (the consensus property RRF exists for), and
    the contributions are the exact integer divisions."""
    from ehr_relation_extraction_spark.operators.similarity import (
        rrf_fusion)

    a = spark.createDataFrame([(0, 1, "x"), (0, 2, "c")],
                              "query_id long, rank int, neighbor_id string")
    b = spark.createDataFrame([(0, 1, "y"), (0, 2, "c")],
                              "query_id long, rank int, neighbor_id string")
    got = {r.neighbor_id: (r.rank, r.rrf_micro6, r.n_lists)
           for r in rrf_fusion([a, b], k=5).collect()}
    assert got["c"] == (1, 2 * (1_000_000 // 62), 2)
    assert got["x"] == (2, 1_000_000 // 61, 1)   # tie with y -> id order
    assert got["y"] == (3, 1_000_000 // 61, 1)
