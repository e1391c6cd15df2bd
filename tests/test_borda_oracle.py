"""Cross-engine parity + serial ground truth for continuation
batch 176 (operators/similarity.borda_fusion)."""

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

    ok, msg = compare(QUERIES["borda_fusion"](spark, SF),
                      con.sql(ORACLE["borda_fusion"]).df())
    assert ok, msg


def test_engineered_points(spark):
    """Two hand-built lists for one query: exact list of depth 3
    (a,b,c -> 3,2,1 points) and an ANN list of depth 2 (b,d -> 2,1).
    Fused: b = 2+2 = 4 wins over a = 3; the shallow list's winner
    gets only depth-2 points (the truncation rule)."""
    from ehr_relation_extraction_spark.operators.similarity import (
        borda_fusion)

    exact = spark.createDataFrame(
        [(0, 1, 100), (0, 2, 101), (0, 3, 102)],
        "query_id long, rank int, neighbor_id long")
    ann = spark.createDataFrame(
        [(0, 1, 101), (0, 2, 103)],
        "query_id long, rank int, neighbor_id long")
    got = {r.neighbor_id: (r.rank, r.borda_points, r.n_lists)
           for r in borda_fusion([exact, ann]).collect()}
    assert got[101] == (1, 4, 2)   # 2 (exact rank2 of 3) + 2 (ann
    #                                rank1 of 2)
    assert got[100] == (2, 3, 1)   # exact rank1 of depth 3
    assert got[102] == (3, 1, 1)
    assert got[103] == (4, 1, 1)
