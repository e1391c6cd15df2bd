"""Cross-engine parity + serial ground truth for continuation
batch 154 (operators/graph_algos.harmonic_centrality)."""

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

    ok, msg = compare(QUERIES["harmonic_centrality"](spark, SF),
                      con.sql(ORACLE["harmonic_centrality"]).df())
    assert ok, msg


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_engineered_path_graph(spark):
    """Path 1-2-3-4-5: node 3 (the center) reaches 2 nodes at d=1
    and 2 at d=2 => harmonic = 2*1e6 + 2*500000 = 3e6; endpoints
    reach d=1,2,3,4 => 1e6 + 500000 + 333333 + 250000."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        harmonic_centrality)

    got = {r.node: (r.n_reached_others, r.dist_sum, r.harmonic_floor6)
           for r in harmonic_centrality(
               _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
           .collect()}
    assert got[3] == (4, 6, 3_000_000)
    assert got[1] == (4, 10, 2_083_333)
    assert got[5] == got[1]
    assert got[2] == (4, 7, 2_833_333)  # 1,1,2,3 -> 1e6+1e6+5e5+333333


def test_disconnected_components(spark):
    """Two disjoint edges: every node reaches exactly its one
    neighbor — harmonic centrality is disconnected-safe (no infinite
    distances leak across components), and duplicate/reversed edge
    supply does not double-count."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        harmonic_centrality)

    got = {r.node: (r.n_reached_others, r.harmonic_floor6)
           for r in harmonic_centrality(
               _edges(spark, [(1, 2), (2, 1), (1, 2),
                              (10, 11)])).collect()}
    assert got == {1: (1, 1_000_000), 2: (1, 1_000_000),
                   10: (1, 1_000_000), 11: (1, 1_000_000)}
