"""Cross-engine parity + the zero-false-negative guarantee for
continuation batch 33: the PPJoin-style exact set-similarity join
(prefix_filter_pairs, token-Jaccard >= 0.80).  The completeness test
brute-forces ALL doc pairs in Python — the property LSH explicitly
does not have — so the prefix filter's pruning can never silently
drop a true near-duplicate."""

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

    ok, msg = compare(QUERIES["prefix_filter_pairs"](spark, SF),
                      con.sql(ORACLE["prefix_filter_pairs"]).df())
    assert ok, msg


def _token_sets(spark):
    from ehr_relation_extraction_spark import driver_queries as dq

    sets: dict[int, frozenset] = {}
    for r in dq._docs(spark, SF).select("doc_id", "text").collect():
        toks = [t for t in re.split(r"[\n \t]", r.text.lower()) if t]
        sets[int(r.doc_id)] = frozenset(toks)
    return sets


def test_zero_false_negatives_vs_brute_force(spark):
    """Output == the EXACT set of pairs with Jaccard >= 0.80 over all
    (n choose 2) pairs — completeness AND soundness, with the exact
    intersection / union / floor-scaled Jaccard per pair."""
    from ehr_relation_extraction_spark import driver_queries as dq

    sets = _token_sets(spark)
    ids = sorted(sets)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter * 100 >= union * 80:
                expect[(a, b)] = (inter, union, inter * 1000000 // union)

    got = {(int(r.doc_a), int(r.doc_b)):
           (int(r.n_inter), int(r.n_union), int(r.jac_micro6))
           for r in dq.QUERIES["prefix_filter_pairs"](spark, SF).collect()}
    assert got == expect and got


def test_prefix_lengths_sound(spark):
    """Spot-check the prefix-length formula: p = n - ceil(0.8 n) + 1
    for a few set sizes (the completeness-critical quantity)."""
    for n, p in [(1, 1), (4, 1), (5, 2), (6, 2), (10, 3), (100, 21)]:
        assert n - ((80 * n + 99) // 100) + 1 == p
