"""Cross-engine parity + serial ground truth for continuation
batch 133 (operators/triples.pred_transitivity)."""

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

    ok, msg = compare(QUERIES["pred_transitivity"](spark, SF),
                      con.sql(ORACLE["pred_transitivity"]).df())
    assert ok, msg


def test_transitive_vs_intransitive(spark):
    """'ancestorOf' fully closed (every chain has its closing edge),
    'parentOf' on the same family tree has zero closures, and a
    half-closed predicate lands exactly at 500000."""
    from ehr_relation_extraction_spark.operators.triples import (
        pred_transitivity)

    # chain a -> b -> c -> d with full transitive closure asserted
    anc = [("a", "b"), ("b", "c"), ("c", "d"),
           ("a", "c"), ("a", "d"), ("b", "d")]
    par = [("a", "b"), ("b", "c"), ("c", "d")]
    half = [("x", "y"), ("y", "z"), ("x", "z"),   # closed chain
            ("p", "q"), ("q", "r")]                # open chain
    rows = ([(s, "ancestorOf", o) for s, o in anc]
            + [(s, "parentOf", o) for s, o in par]
            + [(s, "rel", o) for s, o in half])
    df = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    got = {r.pred: (r.n_edges, r.n_chains, r.n_closed,
                    r.closure_micro6)
           for r in pred_transitivity(df).collect()}
    # ancestorOf chains: distinct (x1, y2) composable pairs
    # a->{c,d}, b->d via 2-step paths, plus a->d via a->c->d etc.
    assert got["ancestorOf"][3] == 1000000        # fully closed
    assert got["parentOf"] == (3, 2, 0, 0)        # a->c, b->d open
    assert got["rel"] == (5, 2, 1, 500000)
