"""Cross-engine parity + serial ground truth for continuation
batch 73 (operators/triples.entity_cards)."""

from __future__ import annotations

import math

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

    ok, msg = compare(QUERIES["entity_cards"](spark, SF),
                      con.sql(ORACLE["entity_cards"]).df())
    assert ok, msg


def test_matches_serial_ranking(spark):
    """Whole-table equality against a serial replica, plus the
    analytic endpoint the scoring exists for: a fact every subject
    shares (df = N, boilerplate) is outranked by a rarer fact with
    the same support, and support multiplies the idf linearly."""
    from ehr_relation_extraction_spark.operators.triples import (
        entity_cards)

    # (doc_id, subj, pred, obj): 3 subjects; "type common" is shared
    # by ALL subjects (df=3), "near x" is unique to s1 (df=1) with
    # the same support, so it must outrank despite equal support.
    rows = [
        (1, "s1", "type", "common"), (2, "s1", "type", "common"),
        (1, "s1", "near", "x"), (2, "s1", "near", "x"),
        (3, "s2", "type", "common"),
        (3, "s2", "near", "y"),
        (4, "s3", "type", "common"),
        (4, "s3", "a", "p"), (5, "s3", "b", "q"), (6, "s3", "c", "r"),
    ]
    triples = spark.createDataFrame(
        [(d, f"u{d}", s, s, p, o) for d, s, p, o in rows],
        ["doc_id", "url", "subj_id", "subj", "pred", "obj"])
    got = [(r.subj, r.rank, r.pred, r.obj, r.support, r.df,
            r.idf_micro6, r.score_micro6)
           for r in entity_cards(triples).collect()]

    # serial replica
    facts = {}
    for d, s, p, o in rows:
        facts.setdefault((s, p, o), set()).add(d)
    support = {k: len(v) for k, v in facts.items()}
    df = {}
    for (s, p, o) in facts:
        df[(p, o)] = df.get((p, o), 0) + 1
    n = len({s for s, _, _ in facts})
    want = []
    for s in sorted({s for s, _, _ in facts}):
        sf = [(s, p, o) for (s2, p, o) in facts if s2 == s]
        scored = []
        for (_, p, o) in sf:
            idf = math.floor(
                math.log((2 * n + 2) / (2 * df[(p, o)] + 1)) * 10**6)
            scored.append((p, o, support[(s, p, o)], df[(p, o)], idf,
                           support[(s, p, o)] * idf))
        scored.sort(key=lambda t: (-t[5], t[0], t[1]))
        for rk, (p, o, sup, d_, idf, sc) in enumerate(scored[:3], 1):
            want.append((s, rk, p, o, sup, d_, idf, sc))
    assert sorted(got) == sorted(want)

    by_key = {(s, p, o): rk for s, rk, p, o, *_ in got}
    # rare fact outranks the boilerplate at equal support
    assert by_key[("s1", "near", "x")] < by_key[("s1", "type", "common")]
    # s3 has 4 facts -> only 3 survive the top-k cut
    assert len([1 for s, *_ in got if s == "s3"]) == 3
