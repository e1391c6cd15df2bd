"""Cross-engine parity + serial ground truth for continuation
batch 77 (operators/triples.crawl_budget)."""

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

    ok, msg = compare(QUERIES["crawl_budget"](spark, SF),
                      con.sql(ORACLE["crawl_budget"]).df())
    assert ok, msg


def test_sums_to_budget_and_proportional(spark):
    """The apportionment invariants Hamilton exists for: allocations
    sum EXACTLY to the budget, every host keeps >= its floor quota,
    nobody exceeds floor+1 (Hamilton never violates quota by more
    than a seat), a dead host still gets its smoothed trickle, and a
    10x-utility host gets ~10x the slots."""
    from ehr_relation_extraction_spark.operators.triples import (
        crawl_budget)

    # hosts a,b,c,dead with 40/4/1/0 yielding docs respectively
    rows = []
    doc = 0
    for host, n_yield, n_flat in (("a", 40, 2), ("b", 4, 2),
                                  ("c", 1, 2), ("dead", 0, 5)):
        for i in range(n_yield + n_flat):
            rows.append((doc, f"https://{host}.example.com/{doc}",
                         i < n_yield))
            doc += 1
    pages = spark.createDataFrame(
        [(d, u, "t") for d, u, _ in rows], ["doc_id", "url", "text"])
    triples = spark.createDataFrame(
        [(d, u, "s", "s", "p", "o") for d, u, y in rows if y],
        ["doc_id", "url", "subj_id", "subj", "pred", "obj"])
    got = {r.host: r for r in
           crawl_budget(pages, triples, budget=100).collect()}

    utils = {f"{h}.example.com": u
             for h, u in (("a", 41), ("b", 5), ("c", 2), ("dead", 1))}
    u_tot = sum(utils.values())
    assert {h: r.util for h, r in got.items()} == utils
    assert sum(r.alloc for r in got.values()) == 100
    for h, r in got.items():
        q = 100 * utils[h]
        assert r.base_alloc == q // u_tot and r.rem == q % u_tot
        assert r.base_alloc <= r.alloc <= r.base_alloc + 1
    assert got["dead.example.com"].alloc >= 1     # smoothed trickle
    assert (got["a.example.com"].alloc
            >= 8 * got["b.example.com"].alloc)    # ~10x utility
