"""Cross-engine parity + serial ground truth for continuation
batch 160 (operators/similarity.sq8_audit)."""

from __future__ import annotations

import numpy as np
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

    ok, msg = compare(QUERIES["sq8_audit"](spark, SF),
                      con.sql(ORACLE["sq8_audit"]).df())
    assert ok, msg


def test_engineered_quantization(spark):
    """Hand-checkable cells (all exactly representable in float32):
    0.5 -> q6=500000, q8=32, err=0; 0.7578125 (= 48.5/64) -> q8
    floors to 48, err = 757812 - 750000 = 7812; 3.0 saturates to
    127 with err = 3000000 - 1984375 = 1015625; -0.25 -> q6=-250000,
    q8=-16, err=0 (negative floors align on the 15625 grid)."""
    from ehr_relation_extraction_spark.operators.similarity import (
        sq8_audit)

    vecs = [
        (0, [np.float32(0.5), np.float32(0.7578125)]),
        (1, [np.float32(3.0), np.float32(-0.25)]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>")
    got = {r.dim: (r.n, r.n_saturated, r.sum_sq_err, r.max_abs_err,
                   r.mean_err_micro6)
           for r in sq8_audit(df).collect()}
    # dim0: errs 0 and 1015625; one saturation
    assert got[0] == (2, 1, 1015625 ** 2, 1015625,
                      (1_000_000 * 1015625) // 2)
    # dim1: errs 7812 and 0
    assert got[1] == (2, 0, 7812 ** 2, 7812,
                      (1_000_000 * 7812) // 2)


def test_in_range_residual_bound(spark):
    """For non-saturated cells the residual always lies in
    [0, 15625) — the floor grids nest — across a sweep of awkward
    float32 values."""
    from ehr_relation_extraction_spark.operators.similarity import (
        sq8_audit)

    xs = [np.float32(v) for v in
          [0.1, -0.1, 0.3333, -0.9999, 1.5, -1.5, 0.015625,
           1.984374, -1.984375, 0.0]]
    df = spark.createDataFrame(
        [(0, [float(x) for x in xs])],
        "vec_id long, embedding array<float>")
    rows = sq8_audit(df).collect()
    assert sum(r.n_saturated for r in rows) == 0
    assert all(0 <= r.max_abs_err < 15625 for r in rows)
