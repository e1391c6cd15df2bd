"""Cross-engine parity + serial ground truth for continuation
batch 125 (functions/textstats.token_fertility)."""

from __future__ import annotations

import re

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

    ok, msg = compare(QUERIES["token_fertility"](spark, SF),
                      con.sql(ORACLE["token_fertility"]).df())
    assert ok, msg


def test_matches_serial_fertility(spark):
    """ASCII prose vs punctuation-shattered text: the shattered lang
    must read strictly higher fertility, and every count must equal
    a serial re-count with the same regexes."""
    from ehr_relation_extraction_spark.functions.textstats import (
        token_fertility)

    rows = [
        (0, "plain ascii words here", "lo", "h"),
        (1, "more plain words", "lo", "h"),
        (2, "a-b,c.d e:f;g!", "hi", "h"),
        (3, "x+y=z (q) [r]", "hi", "h"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang",
                                      "source"])
    got = {r.lang: r for r in token_fertility(df).collect()}

    for lang in ("lo", "hi"):
        texts = [t for _, t, lg, _ in rows if lg == lang]
        w = sum(len([x for x in re.split(r"[\n \t]", t) if x])
                for t in texts)
        tk = sum(len(re.findall(r"[0-9A-Za-z]+", t))
                 + len(re.findall(r"[^0-9A-Za-z \n\t]", t))
                 for t in texts)
        c = sum(len(t) for t in texts)
        r = got[lang]
        assert (r.n_docs, r.n_words, r.n_subtokens, r.n_chars) == \
            (len(texts), w, tk, c)
        assert r.fertility_micro6 == (1000000 * tk) // w
        assert r.chars_per_token_micro6 == (1000000 * c) // tk
    assert got["hi"].fertility_micro6 > 3 * got["lo"].fertility_micro6
