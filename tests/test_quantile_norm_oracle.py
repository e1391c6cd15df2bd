"""Cross-engine parity + serial ground truth for continuation
batch 213 (functions/textstats.quantile_normalize)."""

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

    ok, msg = compare(QUERIES["quantile_normalize"](spark, SF),
                      con.sql(ORACLE["quantile_normalize"]).df())
    assert ok, msg


def _docs(spark, host_lens):
    rows, did = [], 0
    for h, lens in host_lens.items():
        for v in lens:
            rows.append((did, "x", "en", h, v))
            did += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")


def test_nearest_rank_mapping(spark):
    """Host a = [10..19] (10 docs), host b = [110..119].  Host a's
    median (q=5): index (9*5)//10 = 4 -> value 14; pooled (20 docs)
    q=5 index (19*5)//10 = 9 -> value 19.  Shift for a at q=5 is
    +5; host b's q=5 is 114 with shift -95... pooled q5 = 19,
    b_q5 = 114 -> shift = 19 - 114 = -95."""
    from ehr_relation_extraction_spark.functions.textstats import (
        quantile_normalize)

    out = {(r.source, r.q): r for r in quantile_normalize(_docs(
        spark, {"a": list(range(10, 20)),
                "b": list(range(110, 120))})).collect()}
    assert out[("a", 5)].host_value == 14
    assert out[("a", 5)].pooled_value == 19
    assert out[("a", 5)].shift == 5
    assert out[("b", 5)].host_value == 114
    assert out[("b", 5)].shift == 19 - 114
    assert out[("a", 0)].host_value == 10
    assert out[("a", 10)].host_value == 19
    assert out[("b", 10)].pooled_value == 119


def test_identical_hosts_map_identically(spark):
    """Two identical hosts get IDENTICAL mapping rows (the pooled
    nearest-rank index differs from the per-host one, so shift is
    not exactly zero at every decile — but the two hosts must
    agree row for row, and the endpoint quantiles shift 0)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        quantile_normalize)

    lens = [5, 9, 13, 21, 40]
    out = quantile_normalize(_docs(spark, {
        "a": list(lens), "b": list(lens)})).collect()
    rows_a = sorted((r.q, r.host_value, r.pooled_value, r.shift)
                    for r in out if r.source == "a")
    rows_b = sorted((r.q, r.host_value, r.pooled_value, r.shift)
                    for r in out if r.source == "b")
    assert rows_a == rows_b
    byq = {r.q: r for r in out if r.source == "a"}
    assert byq[0].shift == 0 and byq[10].shift == 0
    assert len(out) == 22  # 2 hosts x 11 quantile rows


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        quantile_normalize)

    d = _docs(spark, {"a": [3, 9, 27, 81], "b": [2, 4, 8, 16, 32],
                      "c": [100]})
    one = quantile_normalize(d.coalesce(1)).collect()
    many = quantile_normalize(d.repartition(7)).collect()
    key = lambda r: (r.source, r.q)
    assert sorted(one, key=key) == sorted(many, key=key)
