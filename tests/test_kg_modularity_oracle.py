"""Cross-engine parity + semantics for continuation batch 25: the
exact integer modularity decomposition (Q scaled by 4m²) over the LPA
partition of the entity co-occurrence graph."""

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

    ok, msg = compare(QUERIES["modularity"](spark, SF),
                      con.sql(ORACLE["modularity"]).df())
    assert ok, f"modularity: {msg}"


def test_modularity_identities(spark):
    """The decomposition obeys the textbook identities: Σ n_internal
    <= m, Σ vol = 2m (every edge endpoint belongs to exactly one
    community), q4m2 = 4·m·L_c − D_c² row-wise, |Q| <= 1 (i.e.
    |Σ q4m2| <= 4m²), and Q agrees with a driver-side float replica."""
    from ehr_relation_extraction_spark import driver_queries as dq

    rows = dq.QUERIES["modularity"](spark, SF).collect()
    assert rows
    m = rows[0].m
    assert m > 0 and all(r.m == m for r in rows)
    assert sum(r.n_internal for r in rows) <= m
    assert sum(r.vol for r in rows) == 2 * m
    for r in rows:
        assert r.q4m2 == 4 * m * r.n_internal - r.vol * r.vol
    total = sum(r.q4m2 for r in rows)
    assert abs(total) <= 4 * m * m
    q_float = sum(r.n_internal / m - (r.vol / (2 * m)) ** 2
                  for r in rows)
    assert abs(q_float - total / (4 * m * m)) < 1e-12


def test_modularity_consistent_with_community_stats(spark):
    """Same partition, same graph: n_nodes, n_internal and vol agree
    with community_stats per label."""
    from ehr_relation_extraction_spark import driver_queries as dq

    md = {r.label: (r.n_nodes, r.n_internal, r.vol)
          for r in dq.QUERIES["modularity"](spark, SF).collect()}
    cs = {r.label: (r.n_nodes, r.n_internal, r.vol)
          for r in dq.QUERIES["community_stats"](spark, SF).collect()}
    assert md == cs and md
