"""Cross-engine parity + serial ground truth for continuation
batch 157 (operators/graph_algos.dag_path_counts)."""

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

    ok, msg = compare(QUERIES["dag_path_counts"](spark, SF),
                      con.sql(ORACLE["dag_path_counts"]).df())
    assert ok, msg


def _run(spark, edge_pairs, nodes):
    from ehr_relation_extraction_spark.operators.graph_algos import (
        dag_path_counts)

    edges = spark.createDataFrame(edge_pairs, ["src", "dst"])
    scc = spark.createDataFrame([(n, n) for n in nodes],
                                ["node", "scc_id"])
    return {r.scc_id: (r.is_root, r.is_sink, r.n_paths)
            for r in dag_path_counts(edges, scc).collect()}


def test_engineered_diamond(spark):
    """Diamond 1->{2,3}->4 plus tail 4->5: the classic doubling —
    node 4 is reached by TWO distinct paths, and the tail inherits
    the multiplicity."""
    got = _run(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)],
               [1, 2, 3, 4, 5])
    assert got == {1: (1, 0, 1), 2: (0, 0, 1), 3: (0, 0, 1),
                   4: (0, 0, 2), 5: (0, 1, 2)}


def test_engineered_ladder_and_cycle_condensation(spark):
    """Stacked diamonds multiply: two diamonds in series give 4
    paths at the far sink (2 * 2).  A 2-cycle collapsed into one
    scc_id contributes as a single condensation node (self-loops
    inside the component vanish)."""
    # diamond A: 1->{2,3}->4; diamond B: 4->{5,6}->7
    got = _run(spark,
               [(1, 2), (1, 3), (2, 4), (3, 4),
                (4, 5), (4, 6), (5, 7), (6, 7)],
               [1, 2, 3, 4, 5, 6, 7])
    assert got[4] == (0, 0, 2)
    assert got[7] == (0, 1, 4)

    # nodes 2,3 form one SCC (labelled 2): 1->{2}, {2}->4 — the
    # internal 2<->3 edges drop, path count through is 1
    from ehr_relation_extraction_spark.operators.graph_algos import (
        dag_path_counts)

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 2), (2, 4), (3, 4)],
        ["src", "dst"])
    scc = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 2), (4, 4)], ["node", "scc_id"])
    got2 = {r.scc_id: (r.n_nodes, r.is_root, r.is_sink, r.n_paths)
            for r in dag_path_counts(edges, scc).collect()}
    assert got2 == {1: (1, 1, 0, 1), 2: (2, 0, 0, 1),
                    4: (1, 0, 1, 1)}
