"""Cross-engine parity + serial ground truth for continuation
batch 82 (operators/dedup.syndication_edges)."""

from __future__ import annotations

from itertools import combinations

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

    ok, msg = compare(QUERIES["syndication_edges"](spark, SF),
                      con.sql(ORACLE["syndication_edges"]).df())
    assert ok, msg


def _shingles(text, k=3):
    toks = text.split()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def test_matches_serial_attribution(spark):
    """Whole-table equality against a brute-force serial replica on a
    fixture with one cross-source copy chain (A publishes, B and C
    re-publish), one internal re-post, and unrelated docs — the
    endpoints: direction follows the crawl clock, the self edge is
    labeled, disjoint docs never appear."""
    from ehr_relation_extraction_spark.config import (
        JACCARD_THRESHOLD_PCT)
    from ehr_relation_extraction_spark.operators.dedup import (
        syndication_edges)

    base = " ".join(f"w{i}" for i in range(30))
    rows = [
        (0, "A", base),                       # original
        (1, "B", base + " b0"),               # B copies A
        (2, "C", base + " c0"),               # C copies A (and ~B)
        (3, "A", base + " a1"),               # internal re-post on A
        (4, "D", " ".join(f"q{i}" for i in range(25))),  # unrelated
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {(r.src_first, r.src_later): (r.n_pairs, r.n_docs_later)
           for r in syndication_edges(docs).collect()}

    shs = {d: _shingles(t) for d, _, t in rows}
    src = {d: s for d, s, _ in rows}
    t = JACCARD_THRESHOLD_PCT
    want: dict = {}
    later_docs: dict = {}
    for a, b in combinations(sorted(shs), 2):
        if len(shs[a] & shs[b]) * 100 >= len(shs[a] | shs[b]) * t:
            key = (src[a], src[b])
            want[key] = want.get(key, 0) + 1
            later_docs.setdefault(key, set()).add(b)
    assert got == {k: (n, len(later_docs[k]))
                   for k, n in want.items()}
    assert ("A", "B") in got and ("A", "C") in got
    assert ("A", "A") in got                 # internal re-post
    assert not any("D" in k for k in got)    # unrelated absent
    # direction follows the clock BOTH ways: A's late re-post (doc 3)
    # is downstream of B's and C's earlier copies
    assert ("B", "A") in got and ("C", "A") in got
