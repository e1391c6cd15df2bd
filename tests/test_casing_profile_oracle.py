"""Cross-engine parity + serial ground truth for continuation
batch 143 (functions/textstats.casing_profile)."""

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

    ok, msg = compare(QUERIES["casing_profile"](spark, SF),
                      con.sql(ORACLE["casing_profile"]).df())
    assert ok, msg


def test_matches_serial_profile(spark):
    """Engineered tokens: Title, SHOUT, x2y digits, single capital
    'A' (upper-start but NOT all-caps at len>=2) — every count and
    ratio equals a serial regex replay."""
    from ehr_relation_extraction_spark.functions.textstats import (
        casing_profile)

    rows = [
        (0, "Title case SHOUT x2y plain A", "en", "h"),
        (1, "ALL CAPS HERE 123", "en", "h"),
        (2, "nur kleinbuchstaben", "de", "h"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang",
                                      "source"])
    got = {r.lang: r for r in casing_profile(df).collect()}

    for lang in ("en", "de"):
        toks = [t for _, txt, lg, _ in rows if lg == lang
                for t in txt.split()]
        n = len(toks)
        u = sum(1 for t in toks if re.match(r"^[A-Z]", t))
        c = sum(1 for t in toks if re.fullmatch(r"[A-Z]{2,}", t))
        d = sum(1 for t in toks if re.search(r"[0-9]", t))
        r = got[lang]
        assert (r.n_tokens, r.n_upper_start, r.n_all_caps,
                r.n_digit) == (n, u, c, d)
        assert r.upper_start_micro6 == (1000000 * u) // n
        assert r.all_caps_micro6 == (1000000 * c) // n
        assert r.digit_micro6 == (1000000 * d) // n
    assert got["de"].n_upper_start == 0
    # 'A' counts as upper-start but not all-caps
    assert got["en"].n_upper_start > got["en"].n_all_caps
