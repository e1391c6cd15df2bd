"""Cross-engine parity + serial ground truth for continuation
batch 88 (operators/triples.fact_rollup)."""

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

    ok, msg = compare(QUERIES["fact_rollup"](spark, SF),
                      con.sql(ORACLE["fact_rollup"]).df())
    assert ok, msg


def test_rollup_matches_three_serial_scans(spark):
    """The one-pass rollup equals the three separate aggregations it
    replaces — leaf cells, per-host totals (distinct docs counted
    across preds, not summed), grand total — on a fixture where a
    doc contributes several preds under one host."""
    from ehr_relation_extraction_spark.operators.triples import (
        fact_rollup)

    rows = [  # (doc_id, url, pred)
        (1, "https://a.example.com/1", "p1"),
        (1, "https://a.example.com/1", "p2"),
        (2, "https://a.example.com/2", "p1"),
        (3, "https://b.example.com/3", "p1"),
        (3, "https://b.example.com/3", "p1x"),  # distinct pred, same doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "pred"])
    got = {(r.host, r.pred): (r.lvl, r.n_triples, r.n_docs)
           for r in fact_rollup(df).collect()}

    leaf = Counter((u.split("//")[1].split("/")[0], p)
                   for _, u, p in rows)
    for (h, p), n in leaf.items():
        docs = len({d for d, u, pp in rows
                    if pp == p and h in u})
        assert got[(h, p)] == (0, n, docs)
    # host totals: distinct docs per host, lvl 1
    assert got[("a.example.com", "(all)")] == (1, 3, 2)
    assert got[("b.example.com", "(all)")] == (1, 2, 1)
    # grand total: lvl 3, all rows, all distinct docs
    assert got[("(all)", "(all)")] == (3, 5, 3)
    # exactly leaf + hosts + grand rows — one pass produced all sets
    assert len(got) == len(leaf) + 2 + 1
