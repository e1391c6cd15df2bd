"""Cross-engine parity + invariants for continuation batch 129
(functions/textstats.gains_curve)."""

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

    ok, msg = compare(QUERIES["gains_curve"](spark, SF),
                      con.sql(ORACLE["gains_curve"]).df())
    assert ok, msg


def test_curve_invariants(spark):
    """Structural identities every gains curve must satisfy: the
    cumulation is monotone from the top bucket down, the last row
    captures everything (gain exactly 1.0, lift exactly 1.0), and
    cum columns reconcile with the per-bucket counts."""
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    rows = QUERIES["gains_curve"](spark, SF) \
        .orderBy("bucket", ascending=False).collect()
    assert len(rows) == 10
    cum_d = cum_k = 0
    prev_gain = -1
    for r in rows:
        cum_d += r.n_docs
        cum_k += r.n_keep
        assert (r.cum_docs, r.cum_keeps) == (cum_d, cum_k)
        assert r.gain_micro6 >= prev_gain
        prev_gain = r.gain_micro6
    last = rows[-1]
    assert last.gain_micro6 == 1000000
    assert last.lift_micro6 == 1000000
