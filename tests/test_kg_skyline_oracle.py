"""Cross-engine parity + semantics for continuation batch 27: the
exact 2-D Pareto skyline of entities over (n_docs, n_facts)."""

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

    ok, msg = compare(QUERIES["entity_skyline"](spark, SF),
                      con.sql(ORACLE["entity_skyline"]).df())
    assert ok, f"entity_skyline: {msg}"


def _dominates(a, b):
    """a dominates b: >= on both coords, > on at least one."""
    return (a[0] >= b[0] and a[1] >= b[1]
            and (a[0] > b[0] or a[1] > b[1]))


def test_skyline_vs_brute_force_dominance(spark):
    """The running-max skyline equals the quadratic dominance
    definition on the collected point set."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from pyspark.sql import functions as F

    pts = {r.subj: (r.n_docs, r.n_facts)
           for r in dq._frames(spark, SF).triples
           .groupBy("subj")
           .agg(F.countDistinct("doc_id").alias("n_docs"),
                F.countDistinct("pred", "obj").alias("n_facts"))
           .collect()}
    expect = {s for s, p in pts.items()
              if not any(_dominates(q, p) for t, q in pts.items()
                         if t != s)}
    got = {r.subj for r in
           dq.QUERIES["entity_skyline"](spark, SF).collect()}
    assert got == expect and got


def test_skyline_on_synthetic_points(spark):
    """Hand-built point set: dominated points drop, tied points
    survive together, the staircase survives."""
    from ehr_relation_extraction_spark.operators.triples import (
        entity_skyline)

    # entity -> (n_docs, n_facts) realized as doc/fact multiplicity
    shapes = {"hi_x": (3, 1), "hi_y": (1, 3), "mid": (2, 2),
              "dom": (1, 1),   # dominated by everything
              "tie": (2, 2)}   # exact tie with mid: both survive
    rows = []
    for ent, (nd, nf) in shapes.items():
        for d in range(nd):
            for f in range(nf):
                rows.append((f"doc{d}", ent, "p", f"v{f}"))
    tri = spark.createDataFrame(
        rows, ["doc_id", "subj", "pred", "obj"])
    got = {r.subj for r in entity_skyline(tri).collect()}
    assert got == {"hi_x", "hi_y", "mid", "tie"}
