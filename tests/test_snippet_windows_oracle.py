"""Cross-engine parity + serial ground truth for continuation
batch 72 (functions/textstats.snippet_windows)."""

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

    ok, msg = compare(QUERIES["snippet_windows"](spark, SF),
                      con.sql(ORACLE["snippet_windows"]).df())
    assert ok, msg


def test_matches_serial_best_window(spark):
    """Whole-table equality against a serial replica that scores
    every window start exhaustively, plus the analytic endpoints:
    densest cluster wins over an earlier sparse hit, ties pick the
    earliest start, casing is preserved in the snippet but ignored
    for matching, end-of-doc windows truncate, zero-hit docs absent."""
    from ehr_relation_extraction_spark.functions.textstats import (
        SNIPPET_W, snippet_windows)

    texts = {
        # early lone hit at 0, dense pair later -> window must jump
        0: "spark a b c d e f g h i vector w table x",
        # tie between start 0 and start 1 (both cover the one hit)
        # -> earliest (0) wins
        1: "x Spark y z",
        # hit inside the last (truncated) window only
        2: "a b c d e f g h i j k spark",
        # no hits at all -> absent
        3: "nothing to see here",
        # all-hit doc: window 0 maximal
        4: "spark vector table window spark vector table window spark",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"])
    terms = spark.createDataFrame(
        [("spark",), ("vector",), ("table",), ("window",)], ["alias"])
    got = {r.doc_id: (r.win_start, r.n_hits, r.snippet)
           for r in snippet_windows(docs, terms).collect()}

    probe = {"spark", "vector", "table", "window"}
    want = {}
    for i, t in texts.items():
        toks = t.split()
        m = [1 if w.lower() in probe else 0 for w in toks]
        scores = [(sum(m[p:p + SNIPPET_W]), p) for p in range(len(toks))]
        n_hits, p = max(scores, key=lambda s: (s[0], -s[1]))
        if n_hits > 0:
            want[i] = (p, n_hits,
                       " ".join(toks[p:p + SNIPPET_W]))
    assert got == want
    assert got[0][0] > 0                       # jumped past the lone hit
    assert got[1] == (0, 1, "x Spark y z")     # tie -> earliest, case kept
    assert got[2][1] == 1                      # truncated window hit
    assert 3 not in got
    assert got[4][0] == 0 and got[4][1] >= 4
