"""Cross-engine parity + serial ground truth for continuation
batch 202 (operators/dedup.winnow_dups)."""

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

    ok, msg = compare(QUERIES["winnow_dups"](spark, SF),
                      con.sql(ORACLE["winnow_dups"]).df())
    assert ok, msg


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _serial_winnow(text, k=3, w=4):
    toks = [t.lower() for t in text.split() if t]
    grams = [" ".join(toks[i:i + k])
             for i in range(len(toks) - k + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    sel = set()
    for s in range(len(hs) - w + 1):
        window = hs[s:s + w]
        mn = min(window)
        # rightmost occurrence of the minimum
        pos = max(j for j in range(s, s + w) if hs[j] == mn)
        sel.add(hs[pos])
    return sel


def test_guaranteed_detection_of_shared_run(spark):
    """Two docs sharing a run of >= w+k-1 = 6 tokens MUST share a
    fingerprint (the winnowing guarantee), and the pair's shared
    count must match the serial replica's set intersection."""
    from ehr_relation_extraction_spark.operators.dedup import (
        winnow_dups)

    shared = "alpha beta gamma delta epsilon zeta"
    t0 = "one two three " + shared + " four five six seven"
    t1 = "red green blue " + shared + " cyan magenta yellow pink"
    out = winnow_dups(_docs(spark, [t0, t1])).collect()
    assert len(out) == 1
    r = out[0]
    s0, s1 = _serial_winnow(t0), _serial_winnow(t1)
    assert r.n_shared == len(s0 & s1) >= 1
    assert r.n_a == len(s0) and r.n_b == len(s1)
    assert r.overlap_micro6 == (1000000 * len(s0 & s1)
                                // min(len(s0), len(s1)))


def test_disjoint_docs_produce_no_pairs(spark):
    from ehr_relation_extraction_spark.operators.dedup import (
        winnow_dups)

    t0 = "aa bb cc dd ee ff gg hh"
    t1 = "one two three four five six seven eight"
    assert winnow_dups(_docs(spark, [t0, t1])).count() == 0


def test_identical_docs_full_overlap(spark):
    from ehr_relation_extraction_spark.operators.dedup import (
        winnow_dups)

    t = "the quick brown fox jumps over the lazy dog again"
    r = winnow_dups(_docs(spark, [t, t])).collect()[0]
    assert r.n_a == r.n_b == r.n_shared
    assert r.overlap_micro6 == 1000000


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.operators.dedup import (
        winnow_dups)

    texts = ["a b c d e f g h i", "x y z a b c d e f",
             "p q r s t u v w", "a b c d e f q r s"]
    d = _docs(spark, texts)
    one = winnow_dups(d.coalesce(1)).collect()
    many = winnow_dups(d.repartition(5)).collect()
    key = lambda r: (r.doc_a, r.doc_b)
    assert sorted(one, key=key) == sorted(many, key=key)
