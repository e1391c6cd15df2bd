"""Cross-engine parity + serial ground truth for continuation
batch 71 (functions/textstats.term_proximity)."""

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

    ok, msg = compare(QUERIES["term_proximity"](spark, SF),
                      con.sql(ORACLE["term_proximity"]).df())
    assert ok, msg


def test_matches_serial_minspan(spark):
    """Whole-table equality against a brute-force serial replica
    (min over the full tf(a) x tf(b) position cross product — the
    quadratic definition the linear device must reproduce), plus the
    analytic endpoints: adjacency -> span 2, single-term docs absent,
    interleaved repeats pick the TIGHTEST pair, not the first."""
    from ehr_relation_extraction_spark.functions.textstats import (
        term_proximity)

    # "alpha" df=5, "beta" df=4, every filler token df=1 -> the
    # top-2 selection is forced, no ties.
    texts = {
        0: "alpha beta q0 q1",                     # adjacent -> 2
        1: "beta f1 f2 f3 alpha f4 beta",          # best is alpha..beta=3
        2: "alpha g1 g2 g3 g4 g5 beta alpha",      # trailing alpha: span 2
        3: "alpha only here",                      # one term -> absent
        4: "h1 h2 alpha h3 beta h4 alpha beta",    # multiple pairs -> 2
        5: "nothing relevant at all",              # neither -> absent
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"])
    got = {r.doc_id: (r.n_a, r.n_b, r.min_span)
           for r in term_proximity(docs).collect()}

    want = {}
    for i, t in texts.items():
        toks = t.split()
        pa = [p for p, w in enumerate(toks) if w == "alpha"]
        pb = [p for p, w in enumerate(toks) if w == "beta"]
        if pa and pb:
            span = min(abs(a - b) + 1 for a in pa for b in pb)
            want[i] = (len(pa), len(pb), span)
    assert got == want
    assert got[0] == (1, 1, 2)
    assert got[1][2] == 3
    assert got[2][2] == 2          # nearest pair is beta<-alpha, reversed order
    assert 3 not in got and 5 not in got
