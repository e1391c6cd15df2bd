"""Cross-engine parity + serial ground truth for continuation
batch 190 (functions/textstats.brier_decomposition)."""

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

    ok, msg = compare(QUERIES["brier_decomposition"](spark, SF),
                      con.sql(ORACLE["brier_decomposition"]).df())
    assert ok, msg


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score long, pos int")


def test_two_bucket_hand_check(spark):
    """20 docs, distinct scores 0..19 -> buckets 0..9 of 2 docs
    each (B=10).  Positives only in the top bucket (scores 18, 19):
    bucket 9 has f20 = 19, n = 2, s = 2; every other bucket has
    s = 0, f20 = 2k+1.  Exact Brier*400*N = sum_k [s*(f20-20)^2 +
    (n-s)*f20^2] = 2*1 + 2*(1+9+25+...+289) = hand-computable."""
    from ehr_relation_extraction_spark.functions.textstats import (
        brier_decomposition)

    rows = [(s, 1 if s >= 18 else 0) for s in range(20)]
    df = brier_decomposition(_scored(spark, rows))
    out = {r.bucket: r for r in df.collect()}
    assert len(out) == 10
    assert out[9].f20 == 19 and out[9].n_pos == 2
    assert out[9].obar_micro6 == 1000000
    assert out[0].obar_micro6 == 0
    # brier_num: bucket 9 contributes 2*(19-20)^2 = 2; buckets 0-8
    # contribute 2*f20^2 each
    bnum = 2 + 2 * sum((2 * k + 1) ** 2 for k in range(9))
    N = 20
    assert out[0].brier_micro6 == 1000000 * bnum // (400 * N)
    # reliability: bucket 9 forecast 0.95 vs obar 1.0 -> (2*19-40)^2
    # = 4 over 400*N*2; buckets 0-8 forecast f vs obar 0 ->
    # (2*f20)^2 over 400*N*2
    rel = (1000000 * 4) // (400 * N * 2) + sum(
        (1000000 * (2 * (2 * k + 1)) ** 2) // (400 * N * 2)
        for k in range(9))
    assert out[0].reliability_micro6 == rel
    # uncertainty: S=2, N=20 -> 1e6*2*18/400 = 90000
    assert out[0].uncertainty_micro6 == 90000


def test_murphy_identity_within_floor(spark):
    """brier = reliability - resolution + uncertainty, up to one
    micro-unit per floored term (10 rel + 10 res + 3 global)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        brier_decomposition)

    rows = [(s, 1 if (s * 7) % 3 == 0 else 0) for s in range(50)]
    r = brier_decomposition(_scored(spark, rows)).collect()[0]
    lhs = r.brier_micro6
    rhs = (r.reliability_micro6 - r.resolution_micro6
           + r.uncertainty_micro6)
    assert abs(lhs - rhs) <= 25


def test_perfect_forecast_bucket_calibration(spark):
    """If within every bucket the empirical rate equals the bucket
    midpoint, reliability ~ 0: 20 docs per bucket with exactly
    2k+1 positives in bucket k."""
    from ehr_relation_extraction_spark.functions.textstats import (
        brier_decomposition)

    rows = []
    for k in range(10):
        for j in range(20):
            rows.append((k * 20 + j, 1 if j < 2 * k + 1 else 0))
    r = brier_decomposition(_scored(spark, rows)).collect()[0]
    assert r.reliability_micro6 == 0
    assert r.n_total == 200 and r.n_pos_total == 100


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        brier_decomposition)

    rows = [((s * 13) % 37, 1 if (s * 11) % 4 == 1 else 0)
            for s in range(60)]
    one = brier_decomposition(_scored(spark, rows).coalesce(1)).collect()
    many = brier_decomposition(
        _scored(spark, rows).repartition(7)).collect()
    key = lambda r: r.bucket
    assert sorted(one, key=key) == sorted(many, key=key)
