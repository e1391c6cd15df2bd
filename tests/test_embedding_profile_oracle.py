"""Cross-engine parity + serial ground truth for continuation
batch 140 (operators/similarity.embedding_profile)."""

from __future__ import annotations

import math

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

    ok, msg = compare(QUERIES["embedding_profile"](spark, SF),
                      con.sql(ORACLE["embedding_profile"]).df())
    assert ok, msg


def test_matches_serial_moments(spark):
    """Vectors with a dead dimension, a constant dimension, and a
    negative-valued dimension: quantized moments equal a serial
    replay, var_num flags exactly the non-constant dims."""
    from pyspark.sql.types import (ArrayType, FloatType, LongType,
                                   StructField, StructType)
    from ehr_relation_extraction_spark.operators.similarity import (
        embedding_profile)

    vecs = [
        [0.0, 1.0, -0.5, 0.25],
        [0.0, 1.0, 0.5, 0.125],
        [0.0, 1.0, -0.25, 0.0625],
    ]
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType()))])
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], schema)
    got = {r.dim: (r.n, r.sum_q, r.var_num, r.min_q, r.max_q,
                   r.n_zero)
           for r in embedding_profile(df).collect()}

    for d in range(4):
        qs = [math.floor(float(v[d]) * 10**6) for v in vecs]
        n = len(qs)
        s = sum(qs)
        var = n * sum(q * q for q in qs) - s * s
        assert got[d] == (n, s, var, min(qs), max(qs),
                          sum(1 for q in qs if q == 0))
    assert got[0][2] == 0 and got[1][2] == 0   # dead + constant dims
    assert got[2][2] > 0                        # live dim
