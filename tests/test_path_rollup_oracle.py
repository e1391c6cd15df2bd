"""Cross-engine parity + serial ground truth for continuation
batch 211 (functions/urls.path_rollup)."""

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

    ok, msg = compare(QUERIES["path_rollup"](spark, SF),
                      con.sql(ORACLE["path_rollup"]).df())
    assert ok, msg


def _sec(doc_id):
    nib = int(hashlib.md5(str(doc_id).encode()).hexdigest()[0], 16)
    return ["news", "blog", "shop", "docs"][nib % 4]


def test_matches_python_replica(spark):
    """Sections and shares must match a hashlib replica."""
    from ehr_relation_extraction_spark.functions.urls import (
        path_rollup)

    rows = [(i, "x", "en", "h", 10 + i) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")
    out = {r.section: r for r in path_rollup(df).collect()}
    import collections
    nd = collections.Counter()
    nc = collections.Counter()
    for i in range(40):
        nd[_sec(i)] += 1
        nc[_sec(i)] += 10 + i
    tot_d, tot_c = sum(nd.values()), sum(nc.values())
    for sec, r in out.items():
        assert r.n_docs == nd[sec]
        assert r.total_chars == nc[sec]
        assert r.doc_share_micro6 == 1000000 * nd[sec] // tot_d
        assert r.char_share_micro6 == 1000000 * nc[sec] // tot_c


def test_shares_sum_to_one_per_host(spark):
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    import collections
    acc = collections.Counter()
    for r in QUERIES["path_rollup"](spark, SF).collect():
        acc[r.source] += r.doc_share_micro6
    # floors: each host's shares sum to 1e6 minus at most 3
    assert all(1000000 - 3 <= v <= 1000000 for v in acc.values())


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.urls import (
        path_rollup)

    rows = [(i, "x", "en", f"h{i % 3}", 5 * i) for i in range(60)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")
    one = path_rollup(df.coalesce(1)).collect()
    many = path_rollup(df.repartition(7)).collect()
    key = lambda r: (r.source, r.section)
    assert sorted(one, key=key) == sorted(many, key=key)
