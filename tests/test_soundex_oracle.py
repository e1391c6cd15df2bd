"""Cross-engine parity + serial ground truth for continuation
batch 200 (operators/linking.soundex_blocks)."""

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

    ok, msg = compare(QUERIES["soundex_blocks"](spark, SF),
                      con.sql(ORACLE["soundex_blocks"]).df())
    assert ok, msg


def _triples(spark, subjects):
    return spark.createDataFrame(
        [(i, "u", f"T{i}", s, "Topic", "v") for i, s in
         enumerate(subjects)],
        "doc_id long, url string, subj_id string, subj string, "
        "pred string, obj string")


def _codes(spark, subjects):
    from ehr_relation_extraction_spark.operators.linking import (
        soundex_blocks)
    return {r.sdx: r for r in
            soundex_blocks(_triples(spark, subjects)).collect()}


def test_textbook_codes(spark):
    """The classic reference words: Robert/Rupert -> R163,
    Ashcraft -> A261 (the h/w collapse rule), Tymczak -> T522,
    Pfister -> P236 (first-letter run collapse), Jackson -> J250,
    Smith == Smyth -> S530."""
    out = _codes(spark, ["robert", "rupert", "ashcraft", "tymczak",
                         "pfister", "jackson", "smith", "smyth"])
    assert out["R163"].n_tokens == 2          # robert + rupert
    assert "A261" in out
    assert "T522" in out
    assert "P236" in out
    assert "J250" in out
    assert out["S530"].n_tokens == 2          # smith + smyth


def test_blocking_joins_soundalike_entities(spark):
    """smith and smyth (different entities) land in one S530 block
    with n_entities = 2; an unrelated entity does not."""
    out = _codes(spark, ["smith", "smyth", "grid"])
    assert out["S530"].n_entities == 2
    assert out["G630"].n_entities == 1
    assert all(r.purged == 0 for r in out.values())


def test_short_and_vowel_only_tokens(spark):
    out = _codes(spark, ["x", "aeiou", "hull"])
    assert "X000" in out
    assert "A000" in out
    assert "H400" in out


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.operators.linking import (
        soundex_blocks)

    subs = ["alpha beta", "alfa", "gamma ray", "raye", "beta"]
    t = _triples(spark, subs)
    one = soundex_blocks(t.coalesce(1)).collect()
    many = soundex_blocks(t.repartition(5)).collect()
    key = lambda r: r.sdx
    assert sorted(one, key=key) == sorted(many, key=key)
