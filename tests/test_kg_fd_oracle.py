"""Cross-engine parity + semantics for continuation batch 29: the
approximate functional-dependency profile between predicates."""

from __future__ import annotations

from collections import defaultdict

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

    ok, msg = compare(QUERIES["pred_fds"](spark, SF),
                      con.sql(ORACLE["pred_fds"]).df())
    assert ok, f"pred_fds: {msg}"


def test_pred_fds_vs_brute_force(spark):
    """The two-level aggregate equals the quadratic g3 definition on
    collected facts."""
    from ehr_relation_extraction_spark import driver_queries as dq

    vals = {}
    for r in dq._frames(spark, SF).triples \
            .select("subj", "pred", "obj").collect():
        k = (r.subj, r.pred)
        v = r.obj.lower()
        vals[k] = min(vals[k], v) if k in vals else v
    by_subj = defaultdict(dict)
    for (s, p), v in vals.items():
        by_subj[s][p] = v
    agg = defaultdict(lambda: defaultdict(lambda: defaultdict(int)))
    for s, pv in by_subj.items():
        for pa, va in pv.items():
            for pb, vb in pv.items():
                if pa != pb:
                    agg[(pa, pb)][va][vb] += 1
    expect = {}
    for pp, groups in agg.items():
        n = sum(sum(g.values()) for g in groups.values())
        kept = sum(max(g.values()) for g in groups.values())
        expect[pp] = (n, kept, kept * 10**6 // n, int(kept == n))
    got = {(r.pred_a, r.pred_b): (r.n_common, r.n_kept,
                                  r.conf_micro6, r.is_exact)
           for r in dq.QUERIES["pred_fds"](spark, SF).collect()}
    assert got == expect and got


def test_fd_detects_planted_dependency(spark):
    """A planted exact FD (city -> country) scores 1e6/is_exact=1
    while the broken reverse direction scores below."""
    from ehr_relation_extraction_spark.operators.triples import pred_fds

    rows = []
    cities = {"s1": ("paris", "france"), "s2": ("paris", "france"),
              "s3": ("lyon", "france"), "s4": ("berlin", "germany")}
    for s, (city, country) in cities.items():
        rows.append(("d", s, "City", city))
        rows.append(("d", s, "Country", country))
    tri = spark.createDataFrame(rows,
                                ["doc_id", "subj", "pred", "obj"])
    got = {(r.pred_a, r.pred_b): (r.conf_micro6, r.is_exact)
           for r in pred_fds(tri).collect()}
    assert got[("City", "Country")] == (10**6, 1)
    # Country -> City: france maps to {paris x2, lyon} -> keep 2 of 3
    assert got[("Country", "City")] == (3 * 10**6 // 4, 0)
