"""Cross-engine parity + serial ground truth for continuation
batch 84 (operators/linking.evidence_snippets)."""

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

    ok, msg = compare(QUERIES["evidence_snippets"](spark, SF),
                      con.sql(ORACLE["evidence_snippets"]).df())
    assert ok, msg


def test_snippet_geometry(spark):
    """Hand-computed snippets on a crafted mention table: edge
    clamping at text start and end, exact +/-ctx geometry in the
    middle, first-mention election by (start, end, ent_id), and the
    mention text always inside its snippet."""
    from ehr_relation_extraction_spark.operators.linking import (
        evidence_snippets)

    text = "".join(chr(ord("a") + i % 26) for i in range(200))
    pages = spark.createDataFrame([("u1", text)], ["url", "text"])
    rows = [
        # (url, canonical_id, start, end, ent_text, ent_id)
        ("u1", "e_head", 5, 10, text[5:10], "T1"),    # clamps left
        ("u1", "e_mid", 100, 108, text[100:108], "T2"),
        ("u1", "e_tail", 190, 200, text[190:200], "T3"),  # clamps right
        # two mentions of e_multi: (50,55,T5) beats (50,60,T4) on end
        ("u1", "e_multi", 50, 60, text[50:60], "T4"),
        ("u1", "e_multi", 50, 55, text[50:55], "T5"),
    ]
    linked = spark.createDataFrame(
        rows, ["url", "canonical_id", "start", "end", "ent_text",
               "ent_id"])
    got = {r.canonical_id: (r.start, r.end, r.ent_text, r.evidence)
           for r in evidence_snippets(linked, pages).collect()}

    def snip(s, e, ctx=40):
        p0 = max(0, s - ctx)
        return text[p0:p0 + (e - p0) + ctx]

    assert got["e_head"] == (5, 10, text[5:10], snip(5, 10))
    assert got["e_head"][3] == text[0:50]             # left clamp
    assert got["e_mid"][3] == text[60:148]            # exact +/-40
    assert got["e_tail"][3] == text[150:200]          # right clamp
    assert got["e_multi"][:3] == (50, 55, text[50:55])  # min (s,e,id)
    for s, e, ent, ev in got.values():
        assert ent in ev                              # span inside
