"""Cross-engine parity + serial ground truth for continuation
batch 195 (operators/similarity.embedding_pca)."""

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

    ok, msg = compare(QUERIES["embedding_pca"](spark, SF),
                      con.sql(ORACLE["embedding_pca"]).df())
    assert ok, msg


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int")


def _serial_pca(vecs, n_iter=4, qscale=1024, vscale=10**6):
    import math
    xq = [[math.floor(x * qscale) for x in v] for v in vecs]
    n = len(xq)
    d = len(xq[0])
    sx = [sum(r[j] for r in xq) for j in range(d)]
    v = [vscale if j == 0 else 0 for j in range(d)]
    for _ in range(n_iter):
        t = [sum(r[j] * v[j] for j in range(d)) for r in xq]
        w = [sum(xq[i][j] * t[i] for i in range(n)) for j in range(d)]
        sv = sum(sx[j] * v[j] for j in range(d))
        cv = [n * w[j] - sx[j] * sv for j in range(d)]
        m = max(abs(c) for c in cv)
        if m > 0:
            # truncation toward zero, like Spark div / DuckDB //
            v = [(abs(c) * vscale // m) * (1 if c >= 0 else -1)
                 for c in cv]
        else:
            v = [0] * d
    return v


def test_matches_serial_replica(spark):
    """Anisotropic cloud: variance concentrated along an oblique
    axis; the Spark output must bit-equal the plain-Python integer
    replica."""
    from ehr_relation_extraction_spark.operators.similarity import (
        embedding_pca)

    vecs = [[0.5, 0.25, 0.0], [0.45, 0.2, 0.01], [-0.5, -0.3, 0.0],
            [0.3, 0.18, -0.02], [-0.35, -0.15, 0.01],
            [0.1, 0.02, 0.03]]
    out = {r.dim_idx: r.v_u
           for r in embedding_pca(_emb(spark, vecs)).collect()}
    ser = _serial_pca(vecs)
    assert [out[j] for j in range(3)] == ser
    # dominant axis: dim 0 must carry the max magnitude
    assert abs(out[0]) == max(abs(x) for x in ser)


def test_axis_aligned_cloud(spark):
    """Variance only along dim 1: after iteration the direction
    must concentrate on dim 1 (|v_1| = vscale, dominant)."""
    from ehr_relation_extraction_spark.operators.similarity import (
        embedding_pca)

    vecs = [[0.01, 0.5, 0.0], [0.01, -0.5, 0.0], [0.0, 0.4, 0.0],
            [0.0, -0.4, 0.01], [0.01, 0.3, 0.0]]
    out = {r.dim_idx: r.v_u
           for r in embedding_pca(_emb(spark, vecs)).collect()}
    assert abs(out[1]) == 10**6
    assert abs(out[0]) < 10**5 and abs(out[2]) < 10**5


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.operators.similarity import (
        embedding_pca)

    vecs = [[(i * 7 % 5) / 10.0, (i * 3 % 7) / 10.0,
             (i * 11 % 3) / 10.0] for i in range(12)]
    one = embedding_pca(_emb(spark, vecs).coalesce(1)).collect()
    many = embedding_pca(_emb(spark, vecs).repartition(5)).collect()
    key = lambda r: r.dim_idx
    assert sorted(one, key=key) == sorted(many, key=key)
