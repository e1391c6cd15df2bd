"""Cross-engine parity + semantics for continuation batch 3: the
predicate cardinality profile, AMIE-style shared-object rules, exact
attribute-set Jaccard, and integer fixed-point HITS.  Same compare as
the driver replica, at sf0.001."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

KEYS = ["pred_cardinality", "object_rules", "entity_jaccard",
        "hits_scores"]


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


def test_pred_cardinality_invariants(spark):
    """Every predicate row respects the cardinality algebra:
    n_subjs <= n_facts, n_objs <= n_facts, max >= avg (floored), and
    is_functional iff max == 1 iff n_facts == n_subjs."""
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    rows = QUERIES["pred_cardinality"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_subjs <= r.n_facts
        assert r.n_objs <= r.n_facts
        assert r.avg_objs_micro6 >= 1_000_000  # >= 1 obj per subj
        assert r.max_objs_per_subj * 1_000_000 >= r.avg_objs_micro6
        assert (r.is_functional == 1) == (r.max_objs_per_subj == 1)
        if r.is_functional:
            assert r.n_facts == r.n_subjs


def test_object_rules_confidence_is_a_fraction(spark):
    """support <= body and conf_micro6 = floor(1e6 * support/body)."""
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    rows = QUERIES["object_rules"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_supported <= r.n_body
        assert r.conf_micro6 == r.n_supported * 1_000_000 // r.n_body
        assert r.pred_a <= r.pred_b


def test_entity_jaccard_vs_brute_force(spark):
    """The blocked-join Jaccard equals a driver-side brute force over
    the same fanout-pruned attribute universe (small fixture)."""
    from ehr_relation_extraction_spark import driver_queries as dq

    tri = dq._frames(spark, SF).triples
    facts = {(r.subj, r.pred, r.obj)
             for r in tri.select("subj", "pred", "obj").collect()}
    fan = {}
    for s, p, o in facts:
        fan.setdefault((p, o), set()).add(s)
    pruned = {(s, p, o) for s, p, o in facts
              if len(fan[(p, o)]) <= 50}
    attrs = {}
    for s, p, o in pruned:
        attrs.setdefault(s, set()).add((p, o))
    expect = {}
    subs = sorted(attrs)
    for i, a in enumerate(subs):
        for b in subs[i + 1:]:
            inter = len(attrs[a] & attrs[b])
            if inter:
                union = len(attrs[a] | attrs[b])
                expect[(a, b)] = (inter, union,
                                  inter * 1_000_000 // union)
    got = {(r.subj_a, r.subj_b): (r.n_inter, r.n_union, r.jac_micro6)
           for r in dq.QUERIES["entity_jaccard"](spark, SF).collect()}
    assert got == expect and got


def test_hits_normalization_and_support(spark):
    """Post-normalization the max score per column is exactly scale,
    all scores are in [0, scale], and a node with no in-edges has
    authority 0."""
    from ehr_relation_extraction_spark import driver_queries as dq

    ge = dq.q_graph_edges(spark, SF)
    dsts = {r.obj_node for r in ge.select("obj_node").collect()}
    rows = dq.QUERIES["hits_scores"](spark, SF).collect()
    assert rows
    assert max(r.auth_u for r in rows) == 10**6
    assert max(r.hub_u for r in rows) == 10**6
    for r in rows:
        assert 0 <= r.auth_u <= 10**6 and 0 <= r.hub_u <= 10**6
        if r.node not in dsts:
            assert r.auth_u == 0
