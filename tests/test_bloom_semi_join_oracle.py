"""Cross-engine parity + serial ground truth for continuation
batch 89 (functions/sketches.bloom_semi_join_stats)."""

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

    ok, msg = compare(QUERIES["bloom_semi_join"](spark, SF),
                      con.sql(ORACLE["bloom_semi_join"]).df())
    assert ok, msg


def test_no_false_negatives_and_exact_row_accounting(spark):
    """The safety property Bloomjoin rides on: every fact key that
    truly joins passes the filter (false_neg_keys == 0), row counts
    are exact, and the reduction is the true non-member row share
    minus false positives."""
    from ehr_relation_extraction_spark.functions.sketches import (
        bloom_semi_join_stats)

    fact = spark.createDataFrame(
        [("k%d" % (i % 20),) for i in range(200)]    # 20 keys x 10
        + [("only%d" % i,) for i in range(30)],      # 30 singletons
        ["key"])
    dim = spark.createDataFrame(
        [("k%d" % i,) for i in range(5)]             # 5 joining keys
        + [("ghost",)],                              # dim-only key
        ["key"])
    r = bloom_semi_join_stats(fact, "key", dim, "key").collect()[0]

    assert r.n_fact == 230
    assert r.n_fact_keys == 50
    assert r.n_dim_keys == 6
    assert r.true_keys == 5 and r.true_rows == 50
    assert r.false_neg_keys == 0                     # the guarantee
    assert r.pass_keys >= r.true_keys                # FPs only add
    assert r.pass_rows >= r.true_rows
    assert r.fp_keys == r.pass_keys - r.true_keys
    assert (r.reduction_micro6
            == (r.n_fact - r.pass_rows) * 10**6 // r.n_fact)
    # at 4 salted bits in 2^20 positions over 6 items, FPs are
    # essentially impossible on 50 probes — pin the exact outcome
    assert r.fp_keys == 0 and r.reduction_micro6 == 782608
