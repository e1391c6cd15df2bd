"""Cross-engine parity + serial ground truth for continuation
batch 78 (functions/textstats.completion_index)."""

from __future__ import annotations

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

    ok, msg = compare(QUERIES["completions"](spark, SF),
                      con.sql(ORACLE["completions"]).df())
    assert ok, msg


def test_matches_serial_completions(spark):
    """Whole-table equality against a serial replica, plus the
    endpoints: top-k cut at fanout > k, tf-desc/term-asc ties,
    case folding, short tokens excluded, prefix_tf = sum over ALL
    completions (not just the survivors)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        completion_index)

    texts = [
        "Spa spark spark Spark sparse spat spam spam spun ok",
        "spark sparse spin spin spin xy z",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {(r.prefix, r.rank): (r.term, r.tf, r.prefix_tf)
           for r in completion_index(docs).collect()}

    tf = Counter(w.lower() for t in texts for w in t.split()
                 if len(w) >= 3)
    by_pref: dict[str, list] = {}
    for term, n in tf.items():
        by_pref.setdefault(term[:3], []).append((term, n))
    want = {}
    for pref, terms in by_pref.items():
        total = sum(n for _, n in terms)
        ranked = sorted(terms, key=lambda x: (-x[1], x[0]))[:3]
        for rk, (term, n) in enumerate(ranked, 1):
            want[(pref, rk)] = (term, n, total)
    assert got == want

    # 6 distinct spa-terms -> only 3 survive; spark(4) beats spam(2);
    # prefix_tf counts all of them
    spa = {rk: v for (p, rk), v in got.items() if p == "spa"}
    assert len(spa) == 3 and spa[1][0] == "spark" and spa[1][1] == 4
    assert spa[1][2] == sum(n for t, n in tf.items()
                            if t.startswith("spa"))
    # "xy"/"ok"/"z" too short -> absent everywhere
    assert not any(t in ("xy", "z", "ok")
                   for t, _, _ in got.values())
