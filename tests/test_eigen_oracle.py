"""Cross-engine parity + serial ground truth for continuation
batch 215 (graph_algos.eigen_centrality)."""

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

    ok, msg = compare(QUERIES["eigen_centrality"](spark, SF),
                      con.sql(ORACLE["eigen_centrality"]).df())
    assert ok, msg


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src string, dst string")


def _serial(pairs, n_iter=5, scale=10**6):
    nodes = sorted({x for p in pairs for x in p})
    adj = {n: [] for n in nodes}
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    v = {n: scale for n in nodes}
    mx = 0
    for _ in range(n_iter):
        raw = {n: sum(v[w] for w in adj[n]) for n in nodes}
        mx = max(raw.values())
        v = {n: (raw[n] * scale) // mx if mx > 0 else 0
             for n in nodes}
    return v, 1000 * mx // scale


def test_matches_serial_replica(spark):
    """Kite graph: the Spark output bit-equals the plain-Python
    quantized power iteration, the hub tops the ranking, and the
    lambda estimate lands near the true spectral radius."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        eigen_centrality)

    pairs = [("h", "a"), ("h", "b"), ("h", "c"), ("a", "b"),
             ("c", "d")]
    out = {r.node: r for r in
           eigen_centrality(_edges(spark, pairs)).collect()}
    v, lam = _serial(pairs)
    for n, r in out.items():
        assert r.cent_u == v[n], (n, r.cent_u, v[n])
        assert r.lambda_milli3 == lam
    assert out["h"].cent_u == max(r.cent_u for r in out.values())


def test_cycle_is_uniform_lambda_two(spark):
    """A 4-cycle: the dominant eigenvector is uniform and the
    spectral radius is exactly 2 — the quantized chain holds both
    exactly (every round doubles then renormalizes)."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        eigen_centrality)

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    out = eigen_centrality(_edges(spark, pairs)).collect()
    assert all(r.cent_u == 10**6 for r in out)
    assert all(r.lambda_milli3 == 2000 for r in out)


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.operators.graph_algos import (
        eigen_centrality)

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
             ("d", "e"), ("e", "a")]
    one = eigen_centrality(_edges(spark, pairs).coalesce(1)).collect()
    many = eigen_centrality(
        _edges(spark, pairs).repartition(5)).collect()
    key = lambda r: r.node
    assert sorted(one, key=key) == sorted(many, key=key)
