"""Cross-engine parity + serial ground truth for continuation
batch 158 (operators/graph_algos.eulerian_census)."""

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

    ok, msg = compare(QUERIES["eulerian_census"](spark, SF),
                      con.sql(ORACLE["eulerian_census"]).df())
    assert ok, msg


def _run(spark, pairs):
    from ehr_relation_extraction_spark.operators.graph_algos import (
        eulerian_census)

    return {r.component: (r.n_nodes, r.n_edges, r.n_odd_nodes,
                          r.has_circuit, r.has_trail)
            for r in eulerian_census(
                spark.createDataFrame(pairs, ["src", "dst"]))
            .collect()}


def test_engineered_classics(spark):
    """Three textbook cases in one graph: a triangle (circuit), a
    path of 3 (trail: 2 odd endpoints), and a star K1,3 (neither:
    3 odd leaves + 1 odd center = 4 odd? no — center degree 3 odd,
    leaves degree 1 odd => 4 odd nodes)."""
    got = _run(spark, [
        (1, 2), (2, 3), (3, 1),          # triangle, comp 1
        (10, 11), (11, 12),              # path, comp 10
        (20, 21), (20, 22), (20, 23),    # star, comp 20
    ])
    assert got[1] == (3, 3, 0, 1, 0)
    assert got[10] == (3, 2, 2, 0, 1)
    assert got[20] == (4, 3, 4, 0, 0)


def test_koenigsberg(spark):
    """The Königsberg bridge graph (as its simple-graph skeleton:
    4 land masses, the 5 DISTINCT adjacencies after multi-edge
    collapse): degrees 3,2,2,3 — two odd nodes, so the simple
    skeleton admits a trail but no circuit; duplicate edge rows
    collapse rather than double degrees."""
    got = _run(spark, [
        (1, 2), (2, 1), (1, 3), (1, 4), (2, 4), (3, 4), (4, 3),
    ])
    # simple edges: 1-2, 1-3, 1-4, 2-4, 3-4; degrees 3,2,2,3
    assert got[1] == (4, 5, 2, 0, 1)
