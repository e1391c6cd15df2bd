"""Cross-engine parity + serial ground truth for continuation
batch 85 (operators/kg_embed.distmult_scores / scorer_agreement)."""

from __future__ import annotations

import hashlib

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("key", ["distmult_scores", "scorer_agreement"])
def test_oracle_parity(spark, con, key):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[key](spark, SF),
                      con.sql(ORACLE[key]).df())
    assert ok, msg


def _nib(s: str) -> int:
    # instr('0123456789abcdef', ch) is 1-based, so the device maps
    # hex nibble n to (n + 1) - 9 = n - 8
    return int(hashlib.md5(s.encode()).hexdigest()[0], 16) - 8


def _emb(x: str, salt: str = "", dim: int = 8):
    return [_nib(f"{salt}{x}:{d}") for d in range(dim)]


def test_matches_serial_distmult(spark):
    """Per-fact DistMult scores equal a serial md5-nibble replica,
    and the symmetry DistMult is KNOWN for holds exactly: swapping
    subj and obj never changes the score (while TransE's energy
    generally does)."""
    from ehr_relation_extraction_spark.operators.kg_embed import (
        distmult_scores, transe_scores)

    rows = [(1, "u1", "a", "a", "p", "b"),
            (1, "u1", "b", "b", "p", "a"),     # the swapped fact
            (2, "u2", "a", "a", "q", "c"),
            (3, "u3", "x", "x", "p", "y")]
    triples = spark.createDataFrame(
        rows, ["doc_id", "url", "subj_id", "subj", "pred", "obj"])
    got = {(r.subj, r.pred, r.obj): r.score
           for r in distmult_scores(triples).collect()}

    want = {}
    for _, _, _, s, p, o in rows:
        es, ep, eo = _emb(s), _emb(p, "P:"), _emb(o)
        want[(s, p, o)] = sum(a * b * c
                              for a, b, c in zip(es, ep, eo))
    assert got == want
    assert got[("a", "p", "b")] == got[("b", "p", "a")]   # symmetric
    te = {(r.subj, r.pred, r.obj): r.score
          for r in transe_scores(triples).collect()}
    assert te[("a", "p", "b")] != te[("b", "p", "a")]     # TransE isn't


def test_scorer_agreement_bounds(spark):
    """Agreement invariants: n_overlap <= topk <= 10, overlap_micro6
    = n_overlap/topk exactly, and a predicate with <= 10 facts has
    topk == n_facts (both top-k sets are the whole predicate, so
    overlap == n_facts and the share is exactly 1)."""
    from ehr_relation_extraction_spark.operators.kg_embed import (
        scorer_agreement)

    rows = [(i, f"u{i}", "s", f"s{i % 4}", "p_small", f"o{i}")
            for i in range(6)]
    rows += [(100 + i, f"v{i}", "s", f"t{i % 7}", "p_big", f"w{i}")
             for i in range(25)]
    triples = spark.createDataFrame(
        rows, ["doc_id", "url", "subj_id", "subj", "pred", "obj"])
    got = {r.pred: r for r in scorer_agreement(triples).collect()}

    small = got["p_small"]
    assert (small.n_facts, small.topk) == (6, 6)
    assert small.n_overlap == 6 and small.overlap_micro6 == 10**6
    big = got["p_big"]
    assert big.n_facts == 25 and big.topk == 10
    assert 0 <= big.n_overlap <= 10
    assert big.overlap_micro6 == big.n_overlap * 10**6 // 10
