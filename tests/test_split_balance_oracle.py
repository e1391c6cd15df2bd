"""Cross-engine parity + serial ground truth for continuation
batch 128 (functions/textstats.split_balance)."""

from __future__ import annotations

import hashlib
from collections import Counter

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

    ok, msg = compare(QUERIES["split_balance"](spark, SF),
                      con.sql(ORACLE["split_balance"]).df())
    assert ok, msg


def _split(doc_id):
    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[30:32], 16)
    return "train" if b < 204 else ("dev" if b < 230 else "test")


def test_matches_serial_tvd(spark):
    """Serial replay: per split-pair, TVD over zero-filled lang
    histograms with exact integer clearing must match row for row."""
    from ehr_relation_extraction_spark.functions.textstats import (
        split_balance)

    langs = ["en", "de", "fr", "zh"]
    rows = [(i, "txt", langs[(i * 7) % 4], "h") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang",
                                      "source"])
    got = {(r.split_a, r.split_b): (r.attr_values, r.n_a, r.n_b,
                                    r.tvd_micro6)
           for r in split_balance(df).collect()}

    by_split = {}
    for i, _, lg, _ in rows:
        by_split.setdefault(_split(i), Counter())[lg] += 1
    vals = sorted({lg for _, _, lg, _ in rows})
    names = sorted(by_split)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ca, cb = by_split[a], by_split[b]
            na, nb = sum(ca.values()), sum(cb.values())
            num = sum(abs(ca.get(v, 0) * nb - cb.get(v, 0) * na)
                      for v in vals)
            assert got[(a, b)] == (len(vals), na, nb,
                                   (1000000 * num) // (2 * na * nb))
    assert len(got) == 3


def test_identical_distributions_read_zero(spark):
    """A corpus where every doc is the same lang: TVD must be exactly
    0 for every pair (the audit's null case)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        split_balance)

    rows = [(i, "t", "en", "h") for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang",
                                      "source"])
    assert all(r.tvd_micro6 == 0
               for r in split_balance(df).collect())
