"""Cross-engine parity + serial ground truth for continuation
batch 93 (operators/itemsets.apriori_itemsets)."""

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

    ok, msg = compare(QUERIES["apriori_itemsets"](spark, SF),
                      con.sql(ORACLE["apriori_itemsets"]).df())
    assert ok, msg


def _brute(baskets, min_support):
    out = {}
    for k in (1, 2, 3):
        counts = {}
        for items in baskets:
            for c in combinations(sorted(set(items)), k):
                counts[c] = counts.get(c, 0) + 1
        for c, n in counts.items():
            if n >= min_support:
                out[c] = n
    return out


def test_lattice_matches_brute_force_enumeration(spark):
    """Structured baskets where a frequent pair exists whose triple
    extension is NOT frequent (the downward-closure prune must kill
    it) — results equal brute-force enumeration exactly."""
    from ehr_relation_extraction_spark.operators.itemsets import (
        apriori_itemsets)

    baskets = []
    baskets += [["a", "b", "c"]] * 4          # abc frequent at s=4
    baskets += [["a", "b", "d"]] * 3          # ab boosted; abd NOT (3<4)
    baskets += [["a", "d"]] * 2               # ad: 5 -> frequent
    baskets += [["b", "d"]] * 1               # bd: 4 -> frequent
    baskets += [["e"]] * 5                    # frequent singleton only
    baskets += [["f", "g"]] * 3               # infrequent pair (3<4)

    want = _brute(baskets, 4)
    rows = [(i, it) for i, b in enumerate(baskets) for it in b]
    tx = spark.createDataFrame(rows, ["doc_id", "item"])
    got = {}
    for r in apriori_itemsets(tx, min_support=4).collect():
        key = tuple(x for x in (r.item1, r.item2, r.item3) if x)
        assert len(key) == r.k
        got[key] = r.support
    assert got == want
    # the prune case: ab and bd and ad frequent, but abd must be
    # absent (support 3 < 4) — downward closure alone cannot kill it,
    # the verify count must
    assert ("a", "b") in got and ("a", "d") in got and ("b", "d") in got
    assert ("a", "b", "d") not in got
    assert ("a", "b", "c") in got and got[("a", "b", "c")] == 4
