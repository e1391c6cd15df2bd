"""Cross-engine parity + semantics for continuation batch 9:
predicate subject-set Jaccard and degree-assortativity sufficient
statistics."""

from __future__ import annotations

import math

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

KEYS = ["pred_jaccard", "degree_assortativity"]


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


def test_pred_jaccard_vs_brute_force(spark):
    """The blocked Jaccard equals a driver-side set computation."""
    from ehr_relation_extraction_spark import driver_queries as dq

    subs = {}
    for r in (dq._frames(spark, SF).triples
              .select("subj", "pred").dropDuplicates().collect()):
        subs.setdefault(r.pred, set()).add(r.subj)
    preds = sorted(subs)
    expect = {}
    for i, a in enumerate(preds):
        for b in preds[i + 1:]:
            inter = len(subs[a] & subs[b])
            if inter:
                union = len(subs[a] | subs[b])
                expect[(a, b)] = (inter, union,
                                  inter * 1_000_000 // union)
    got = {(r.pred_a, r.pred_b): (r.n_inter, r.n_union, r.jac_micro6)
           for r in dq.QUERIES["pred_jaccard"](spark, SF).collect()}
    assert got == expect and got


def test_assortativity_moments_vs_serial(spark):
    """The distributed moments equal a serial computation, the
    symmetric-orientation convention makes sx == sy and sxx == syy,
    and the derived r is a valid correlation."""
    from ehr_relation_extraction_spark import driver_queries as dq

    edges, _ = dq._comention_graph(spark, SF)
    und = {(min(r.src, r.dst), max(r.src, r.dst))
           for r in edges.collect() if r.src != r.dst}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = [(deg[a], deg[b]) for a, b in und] + \
         [(deg[b], deg[a]) for a, b in und]
    n = len(xs)
    sx = sum(x for x, _ in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs)
    row = dq.QUERIES["degree_assortativity"](spark, SF).collect()[0]
    assert (row.n, row.sx, row.sy, row.sxy, row.sxx, row.syy) == \
        (n, sx, sx, sxy, sxx, sxx)
    var = row.n * row.sxx - row.sx * row.sx
    if var > 0:
        r = (row.n * row.sxy - row.sx * row.sy) / math.sqrt(
            (row.n * row.sxx - row.sx ** 2)
            * (row.n * row.syy - row.sy ** 2))
        assert -1.0 - 1e-9 <= r <= 1.0 + 1e-9
