"""Cross-engine parity + serial ground truth for continuation
batch 141 (operators/similarity.label_separation)."""

from __future__ import annotations

import math

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

    ok, msg = compare(QUERIES["label_separation"](spark, SF),
                      con.sql(ORACLE["label_separation"]).df())
    assert ok, msg


def test_discriminative_vs_noise_dim(spark):
    """Dim 0 perfectly separates the two labels (separation exactly
    1.0: within-group variance zero), dim 1 is label-independent
    noise (separation low) — both match a serial ANOVA replay."""
    from pyspark.sql.types import (ArrayType, FloatType, IntegerType,
                                   LongType, StructField, StructType)
    from ehr_relation_extraction_spark.operators.similarity import (
        label_separation)

    noise = [0.3, -0.7, 0.9, -0.1, 0.5, -0.5, 0.1, 0.7]
    rows = []
    for i in range(8):
        lab = i % 2
        rows.append((i, [1.0 if lab == 0 else -1.0, noise[i]], lab))
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType())])
    df = spark.createDataFrame(rows, schema)
    got = {r.dim: (r.n_labels, r.ssb_scaled, r.sst_scaled,
                   r.separation_micro6)
           for r in label_separation(df).collect()}

    for d in range(2):
        # the column is float32: quantize what the engines READ,
        # not the python literal
        qs = [(lab, math.floor(float(np.float32(v[d])) * 10**3))
              for _, v, lab in rows]
        n = len(qs)
        s = sum(q for _, q in qs)
        sst = n * sum(q * q for _, q in qs) - s * s
        grps = {}
        for lab, q in qs:
            grps.setdefault(lab, []).append(q)
        ssb = sum(((n * sum(g) - len(g) * s) ** 2) // (len(g) * n)
                  for g in grps.values())
        assert got[d] == (len(grps), ssb, sst,
                          (1000000 * ssb) // sst)
    assert got[0][3] == 1000000
    assert got[1][3] < 400000
