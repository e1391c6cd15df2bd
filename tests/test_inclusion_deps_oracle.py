"""Cross-engine parity + serial ground truth for continuation
batch 138 (operators/triples.inclusion_deps)."""

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

    ok, msg = compare(QUERIES["inclusion_deps"](spark, SF),
                      con.sql(ORACLE["inclusion_deps"]).df())
    assert ok, msg


def test_fk_graph_discovered(spark):
    """The TPC-H foreign-key edges must all read is_ind = 1 and the
    deliberate negative control (order keys vs customer keys) must
    read partial-or-zero containment with is_ind = 0."""
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    got = {(r.child, r.parent): (r.containment_micro6, r.is_ind)
           for r in QUERIES["inclusion_deps"](spark, SF).collect()}
    true_fks = [
        ("nation.n_regionkey", "region.r_regionkey"),
        ("customer.c_nationkey", "nation.n_nationkey"),
        ("supplier.s_nationkey", "nation.n_nationkey"),
        ("orders.o_custkey", "customer.c_custkey"),
        ("lineitem.l_orderkey", "orders.o_orderkey"),
        ("lineitem.l_partkey", "part.p_partkey"),
    ]
    for fk in true_fks:
        assert got[fk] == (1000000, 1), fk
    neg = got[("orders.o_orderkey", "customer.c_custkey")]
    assert neg[1] == 0 and neg[0] < 1000000


def test_matches_serial_containment(spark):
    """Hand-built frames with partial containment: exact distinct
    and contained counts."""
    from ehr_relation_extraction_spark.operators.triples import (
        inclusion_deps)

    child = spark.createDataFrame(
        [(v,) for v in [1, 1, 2, 3, 9]], ["k"])
    parent = spark.createDataFrame(
        [(v,) for v in [1, 2, 3, 4]], ["k"])
    row = inclusion_deps(
        {"c": child, "p": parent},
        candidates=(("c", "k", "p", "k"),)).collect()[0]
    assert (row.n_child_distinct, row.n_contained,
            row.containment_micro6, row.is_ind) == (4, 3, 750000, 0)
