"""Cross-engine parity + set-arithmetic brute force for continuation
batch 45: blocking-quality metrics (pair completeness / reduction
ratio of the meta-blocking candidates)."""

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

    ok, msg = compare(QUERIES["blocking_metrics"](spark, SF),
                      con.sql(ORACLE["blocking_metrics"]).df())
    assert ok, msg


def test_metrics_brute_force(spark):
    """The single row equals direct set arithmetic over the collected
    candidate / truth pair sets."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.operators import (linking as lk,
                                                         triples as tri_op)
    from pyspark.sql import functions as F

    tr = dq._frames(spark, SF).triples
    cand = {(r.ent_a, r.ent_b)
            for r in lk.meta_block_edges(tr).where("keep = 1").collect()}
    truth = set()
    for r in tri_op.entity_attr_jaccard(tr).where(
            "jac_micro6 >= 500000").collect():
        a, b = sorted((r.subj_a.lower(), r.subj_b.lower()))
        if a != b:
            truth.add((a, b))
    n_ent = tr.select(F.lower("subj")).distinct().count()
    hit = cand & truth
    ap = n_ent * (n_ent - 1) // 2

    row = dq.QUERIES["blocking_metrics"](spark, SF).collect()
    assert len(row) == 1
    g = row[0]
    assert (g.n_entities, g.n_all_pairs, g.n_cand, g.n_truth,
            g.n_hit) == (n_ent, ap, len(cand), len(truth), len(hit))
    assert g.pc_micro6 == (len(hit) * 1000000 // len(truth)
                           if truth else 0)
    assert g.rr_micro6 == 1000000 - len(cand) * 1000000 // ap
    assert truth and cand, "fixture must exercise both sets"
    # sf0.001 has only a handful of distinct subjects, so no pruning
    # is possible there — assert the structural invariants instead
    # (the pruning behavior shows up at sf0.01+ via the parity gate).
    assert 0 <= g.rr_micro6 <= 1000000
    assert g.n_hit <= min(g.n_cand, g.n_truth)
    assert g.n_cand <= g.n_all_pairs
