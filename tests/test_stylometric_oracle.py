"""Cross-engine parity + serial ground truth for continuation
batch 201 (functions/textstats.stylometric_delta)."""

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

    ok, msg = compare(QUERIES["stylometric_delta"](spark, SF),
                      con.sql(ORACLE["stylometric_delta"]).df())
    assert ok, msg


def _docs(spark, host_texts):
    rows = []
    did = 0
    for host, texts in host_texts.items():
        for t in texts:
            rows.append((did, t, "en", host, len(t)))
            did += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")


def test_clone_hosts_are_closest(spark):
    """Hosts a and b share identical texts (syndication); host c
    writes differently.  delta(a,b) must be the strict minimum."""
    from ehr_relation_extraction_spark.functions.textstats import (
        stylometric_delta)

    same = ["the cat sat on the mat and the dog ran",
            "a cat and a dog sat on a mat in the sun"]
    diff = ["zebra quantum flux vortex prime nebula",
            "vortex nebula prime flux quantum zebra zebra"]
    out = {(r.source_a, r.source_b): r.delta_micro6
           for r in stylometric_delta(_docs(spark, {
               "a": same, "b": list(same), "c": diff})).collect()}
    assert out[("a", "b")] == 0
    assert out[("a", "c")] > 0 and out[("b", "c")] > 0


def test_pair_count_and_k(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        stylometric_delta)

    out = stylometric_delta(_docs(spark, {
        "a": ["x y z w"], "b": ["x x y q"], "c": ["z q w y"],
        "d": ["w w z x"]})).collect()
    assert len(out) == 6  # 4 choose 2
    assert all(r.n_tokens_used >= 1 for r in out)


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        stylometric_delta)

    d = _docs(spark, {
        "a": ["the quick brown fox", "jumps over the lazy dog"],
        "b": ["pack my box with five dozen jugs"],
        "c": ["the the the fox fox jumps"]})
    one = stylometric_delta(d.coalesce(1)).collect()
    many = stylometric_delta(d.repartition(7)).collect()
    key = lambda r: (r.source_a, r.source_b)
    assert sorted(one, key=key) == sorted(many, key=key)
