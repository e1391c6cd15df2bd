"""Cross-engine parity + semantics for continuation batch 28: the
deterministic integer weighted bottom-k document sample per host."""

from __future__ import annotations

import hashlib

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

    ok, msg = compare(QUERIES["weighted_sample"](spark, SF),
                      con.sql(ORACLE["weighted_sample"]).df())
    assert ok, f"weighted_sample: {msg}"


def test_priority_matches_python_replica(spark):
    """priority = md5_int32(doc_id) * 2^20 // weight, bit-exact."""
    from ehr_relation_extraction_spark import driver_queries as dq

    rows = dq.QUERIES["weighted_sample"](spark, SF).collect()
    assert rows
    for r in rows:
        h = int(hashlib.md5(str(r.doc_id).encode())
                .hexdigest()[:8], 16)
        assert r.priority == h * (1 << 20) // r.weight
        assert 1 <= r.rk <= 3
        assert r.weight >= 1


def test_sample_is_partitioning_invariant(spark):
    """Recomputing under a different shuffle-partition count returns
    the identical sample (pure function of (doc_id, weight))."""
    from ehr_relation_extraction_spark import driver_queries as dq

    def run():
        return sorted((r.host, r.doc_id, r.rk) for r in
                      dq.QUERIES["weighted_sample"](spark, SF)
                      .collect())

    base = run()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert run() == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base


def test_heavier_docs_win_more_often(spark):
    """Statistical sanity on a synthetic corpus: with weights 100 vs
    1, the heavy items take the vast majority of the k slots."""
    from ehr_relation_extraction_spark.operators.sampling import (
        weighted_sample)

    # host = i % 5 (odd modulus) so every host mixes even (heavy)
    # and odd (light) doc_ids
    pages = spark.createDataFrame(
        [(i, f"https://h{i % 5}.example.com/{i}") for i in range(200)],
        ["doc_id", "url"])
    # even doc_ids heavy (weight 100), odd light (weight 1)
    toks = spark.createDataFrame(
        [(i, j) for i in range(200)
         for j in range(100 if i % 2 == 0 else 1)],
        ["doc_id", "tok_idx"])
    got = weighted_sample(pages, toks, k=3).collect()
    heavy = sum(1 for r in got if r.doc_id % 2 == 0)
    assert len(got) == 15  # 5 hosts x 3
    assert heavy >= 13  # overwhelmingly the weighted winners
