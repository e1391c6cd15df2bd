"""Cross-engine parity + semantics for continuation batch 23: the
SPARQL-algebra read paths — directed 2-hop property-path (chain)
profile, OPTIONAL (left-outer BGP), and NOT-EXISTS gap profile.
Same compare as the driver replica, at sf0.001."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

KEYS = ["chain_patterns", "optional_query", "negation_query"]


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


def test_chain_patterns_vs_brute_force(spark):
    """The hub-capped chain join equals a driver-side brute force over
    the collected edge table (small fixture)."""
    from collections import defaultdict

    from ehr_relation_extraction_spark import driver_queries as dq

    fwd = [(r.subj_node, r.pred, r.obj_node)
           for r in dq.q_graph_edges(spark, SF)
           .select("subj_node", "pred", "obj_node").collect()]
    edges = fwd + [(o, "^" + p, s) for s, p, o in fwd]
    ind, outd = defaultdict(set), defaultdict(set)
    for s, _p, o in edges:
        ind[o].add(s)
        outd[s].add(o)
    mids = {n for n in set(ind) & set(outd)
            if len(ind[n]) <= 1000 and len(outd[n]) <= 1000}
    agg = defaultdict(lambda: [0, set(), set()])
    for s1, p1, o1 in edges:
        if o1 not in mids:
            continue
        for s2, p2, o2 in edges:
            if s2 != o1:
                continue
            a = agg[(p1, p2)]
            a[0] += 1
            a[1].add((s1, o2))
            a[2].add(o1)
    expect = {k: (v[0], len(v[1]), len(v[2])) for k, v in agg.items()}
    got = {(r.pred_a, r.pred_b): (r.n_chains, r.n_paths, r.n_mids)
           for r in dq.QUERIES["chain_patterns"](spark, SF).collect()}
    assert got == expect and got


def test_optional_query_semantics(spark):
    """has_opt is 0 iff n_opt is 0; every subject carries >= 1
    required fact; the required predicate is the global argmax."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from pyspark.sql import functions as F

    rows = dq.QUERIES["optional_query"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_req >= 1
        assert (r.has_opt == 0) == (r.n_opt == 0)
    facts = (dq._frames(spark, SF).triples
             .select("subj", "pred", "obj").dropDuplicates())
    cnt = {r.pred: r.n for r in
           facts.groupBy("pred").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    p_req = min(cnt, key=lambda p: (-cnt[p], p))
    n_req_subjects = facts.where(F.col("pred") == p_req) \
        .select("subj").distinct().count()
    assert len(rows) == n_req_subjects


def test_negation_query_semantics(spark):
    """The anchor predicate's own row has zero missing subjects, and
    miss_micro6 is the floored fraction."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from pyspark.sql import functions as F

    facts = (dq._frames(spark, SF).triples
             .select("subj", "pred", "obj").dropDuplicates())
    cnt = {r.pred: r.n for r in
           facts.groupBy("pred").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    anchor = min(cnt, key=lambda p: (-cnt[p], p))
    rows = dq.QUERIES["negation_query"](spark, SF).collect()
    assert rows
    by_pred = {r.pred: r for r in rows}
    assert by_pred[anchor].n_without_anchor == 0
    for r in rows:
        assert 0 <= r.n_without_anchor <= r.n_subj
        assert r.miss_micro6 == r.n_without_anchor * 10**6 // r.n_subj
