"""Cross-engine parity + serial ground truth for continuation
batch 130 (operators/graph_algos.graph_eccentricity)."""

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

    ok, msg = compare(QUERIES["graph_eccentricity"](spark, SF),
                      con.sql(ORACLE["graph_eccentricity"]).df())
    assert ok, msg


def test_known_graphs(spark):
    """Path P5 (center = middle, radius 2, diameter 4), C6 ring
    (every node ecc 3), plus a separate triangle component — exact
    textbook values per component."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        graph_eccentricity)

    edges = ([(f"p{i}", f"p{i+1}") for i in range(4)]          # P5
             + [(f"r{i}", f"r{(i+1) % 6}") for i in range(6)]  # C6
             + [("t0", "t1"), ("t1", "t2"), ("t0", "t2")])     # K3
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: (r.n_reached, r.ecc, r.radius, r.diameter,
                    r.is_center)
           for r in graph_eccentricity(df).collect()}

    # P5: ecc = max(i, 4-i); center p2 only
    for i in range(5):
        ecc = max(i, 4 - i)
        assert got[f"p{i}"] == (5, ecc, 2, 4, 1 if ecc == 2 else 0)
    # C6: vertex-transitive, all ecc 3, all centers
    for i in range(6):
        assert got[f"r{i}"] == (6, 3, 3, 3, 1)
    # K3: all ecc 1
    for i in range(3):
        assert got[f"t{i}"] == (3, 1, 1, 1, 1)


def test_converged_at_driver_rounds(spark):
    """8 rounds covers the driver co-mention graph's true diameter:
    8 vs 11 rounds identical."""
    from ehr_relation_extraction_spark.driver_queries import (
        _comention_graph)
    from ehr_relation_extraction_spark.operators.graph_algos import (
        graph_eccentricity)

    edges, _ = _comention_graph(spark, SF)
    a = sorted(map(tuple, graph_eccentricity(edges, 8).collect()))
    b = sorted(map(tuple, graph_eccentricity(edges, 11).collect()))
    assert a == b
