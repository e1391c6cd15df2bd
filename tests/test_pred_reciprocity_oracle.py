"""Cross-engine parity + serial ground truth for continuation
batch 124 (operators/triples.pred_reciprocity)."""

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

    ok, msg = compare(QUERIES["pred_reciprocity"](spark, SF),
                      con.sql(ORACLE["pred_reciprocity"]).df())
    assert ok, msg


def test_symmetric_vs_directional_predicates(spark):
    """Engineered KG: 'marriedTo' fully symmetric (reciprocity 1.0),
    'parentOf' strictly directional (0), 'knows' half mutual; case
    folding must merge 'Alice'/'alice', duplicates and self-loops
    must not inflate edges."""
    from ehr_relation_extraction_spark.operators.triples import (
        pred_reciprocity)

    rows = [
        ("Alice", "marriedTo", "bob"), ("Bob", "marriedTo", "alice"),
        ("carol", "marriedTo", "dan"), ("dan", "marriedTo", "Carol"),
        ("carol", "marriedTo", "dan"),            # dup collapses
        ("eve", "parentOf", "frank"), ("eve", "parentOf", "gina"),
        ("x", "knows", "y"), ("y", "knows", "x"),
        ("x", "knows", "z"), ("z", "knows", "w"),
        ("v", "knows", "v"),                       # self-loop dropped
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    got = {r.pred: (r.n_edges, r.n_mutual_pairs, r.reciprocity_micro6)
           for r in pred_reciprocity(df).collect()}
    assert got["marriedTo"] == (4, 2, 1000000)
    assert got["parentOf"] == (2, 0, 0)
    assert got["knows"] == (4, 1, 500000)
