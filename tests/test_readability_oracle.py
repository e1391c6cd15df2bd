"""Cross-engine parity + serial ground truth for continuation
batch 165 (functions/textstats.readability_profile)."""

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

    ok, msg = compare(QUERIES["readability_profile"](spark, SF),
                      con.sql(ORACLE["readability_profile"]).df())
    assert ok, msg


def test_engineered_syllables(spark):
    """Hand-counted vowel groups: cat=1, table=2 (a, e),
    readability=5 (ea, a, i, i, y), rhythm=1 (y), zzz=1 (floored).
    10 syllables over 5 words, one polysyllabic."""
    from ehr_relation_extraction_spark.functions.textstats import (
        readability_profile)

    text = "cat table readability rhythm zzz"
    df = spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        ["doc_id", "text", "lang", "source", "n_chars"])
    r = readability_profile(df).collect()[0]
    assert (r.n_words, r.n_syllables, r.n_polysyllabic) == (5, 10, 1)
    assert r.syll_per_word_micro6 == 2_000_000
    assert r.poly_share_micro6 == 200_000


def test_case_and_vowelless(spark):
    """Uppercase vowels count (lowercasing first) and a fully
    consonantal language sample floors every word at 1 syllable."""
    from ehr_relation_extraction_spark.functions.textstats import (
        readability_profile)

    df = spark.createDataFrame(
        [(0, "AEIOU Ng", "en", "s", 8),
         (1, "bcd fgh jkl", "zh", "s", 11)],
        ["doc_id", "text", "lang", "source", "n_chars"])
    got = {r.lang: (r.n_words, r.n_syllables)
           for r in readability_profile(df).collect()}
    # AEIOU -> one vowel group; Ng -> 0 groups floored to 1
    assert got["en"] == (2, 2)
    assert got["zh"] == (3, 3)
