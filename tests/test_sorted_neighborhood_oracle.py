"""Cross-engine parity + serial ground truth for continuation
batch 184 (operators/linking.sorted_neighborhood)."""

from __future__ import annotations

import hashlib

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


def _serial(texts: list[str], w: int = 4, key_len: int = 40):
    """Plain-Python SNM census over (doc_id, text) records."""
    recs = sorted((t[:key_len], i, hashlib.md5(t.encode()).hexdigest())
                  for i, t in enumerate(texts))
    n = len(recs)
    cand = cap = 0
    for i in range(n):
        for j in range(i + 1, min(i + w, n)):
            cand += 1
            if recs[i][2] == recs[j][2]:
                cap += 1
    from collections import Counter
    cc = Counter(h for _, _, h in recs)
    truth = sum(c * (c - 1) // 2 for c in cc.values())
    return n, cand, truth, cap


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["sorted_neighborhood"](spark, SF),
                      con.sql(ORACLE["sorted_neighborhood"]).df())
    assert ok, msg


def test_matches_serial_snm(spark):
    """Dup-heavy synthetic corpus: 3 copies of one page, 2 of
    another, plus fillers that sort between them.  The distributed
    two-pass rank must reproduce the serial sorted-window census,
    including captured-vs-truth bookkeeping."""
    from ehr_relation_extraction_spark.operators.linking import (
        sorted_neighborhood)

    texts = (["alpha page body " + "x" * 50] * 3
             + ["beta page body " + "y" * 50] * 2
             + [f"filler {c} content {c * 3}" for c in "abcdefgh"])
    n, cand, truth, cap = _serial(texts)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    r = sorted_neighborhood(docs).collect()[0]
    assert (r.n_records, r.n_candidate_pairs,
            r.n_truth_pairs, r.n_captured) == (n, cand, truth, cap)
    assert r.pc_micro6 == 10**6 * cap // truth
    assert r.rr_micro6 == 10**6 - 10**6 * cand // (n * (n - 1) // 2)
    # identical texts sort adjacent, so every truth pair inside the
    # window is captured here
    assert r.n_captured == r.n_truth_pairs == 4


def test_rank_is_partitioning_invariant(spark):
    """The two-pass global rank must not depend on the number of
    range partitions."""
    from ehr_relation_extraction_spark.operators.linking import (
        sorted_neighborhood)

    texts = [f"page {i:03d} " + "z" * (i % 7) for i in range(40)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    a = sorted_neighborhood(docs, n_ranges=2).collect()[0]
    b = sorted_neighborhood(docs, n_ranges=17).collect()[0]
    assert a.asDict() == b.asDict()
