"""Cross-engine parity + serial ground truth for continuation
batch 209 (functions/textstats.bradley_terry)."""

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

    ok, msg = compare(QUERIES["bradley_terry"](spark, SF),
                      con.sql(ORACLE["bradley_terry"]).df())
    assert ok, msg


def _docs(spark, host_lang_lens):
    """host_lang_lens: list of (host, lang, n_chars)."""
    return spark.createDataFrame(
        [(i, "x", l, h, v) for i, (h, l, v) in
         enumerate(host_lang_lens)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def test_transitive_tournament_order(spark):
    """Three hosts with strictly ordered medians in every language:
    a > b > c.  The MM fit must rank gamma_a > gamma_b > gamma_c,
    with the winner pinned at scale = 1e6."""
    from ehr_relation_extraction_spark.functions.textstats import (
        bradley_terry)

    rows = []
    for lang in ("en", "de", "fr"):
        rows += [("a", lang, 300), ("b", lang, 200),
                 ("c", lang, 100)]
    out = {r.source: r for r in
           bradley_terry(_docs(spark, rows)).collect()}
    assert out["a"].wins == 6 and out["c"].wins == 0
    assert out["a"].gamma_u == 10**6
    assert out["a"].gamma_u > out["b"].gamma_u > out["c"].gamma_u


def test_symmetric_pair_equal_strength(spark):
    """Two hosts splitting wins 1-1 across two languages: equal
    abilities (both at the renormalized max)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        bradley_terry)

    rows = [("a", "en", 300), ("b", "en", 200),
            ("a", "de", 100), ("b", "de", 250)]
    out = {r.source: r for r in
           bradley_terry(_docs(spark, rows)).collect()}
    assert out["a"].wins == 1 and out["b"].wins == 1
    assert out["a"].gamma_u == out["b"].gamma_u == 10**6


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        bradley_terry)

    rows = [(f"h{i % 4}", ("en", "de", "fr")[i % 3],
             50 + (i * 37) % 400) for i in range(60)]
    d = _docs(spark, rows)
    one = bradley_terry(d.coalesce(1)).collect()
    many = bradley_terry(d.repartition(7)).collect()
    key = lambda r: r.source
    assert sorted(one, key=key) == sorted(many, key=key)
