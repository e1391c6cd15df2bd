"""Cross-engine parity + serial ground truth for continuation
batch 181 (operators/kg_embed.complex_scores)."""

from __future__ import annotations

import hashlib

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

DIM = 8


def _nib(value: str, d: int, salt: str = "") -> int:
    """Python twin of kg_embed._nib_sql: first md5 hex nibble of
    '{salt}{value}:{d}' mapped to [-8, 7]."""
    h = hashlib.md5(f"{salt}{value}:{d}".encode()).hexdigest()
    return "0123456789abcdef".index(h[0]) - 8


def _cx(h: str, r: str, t: str) -> int:
    s = 0
    for d in range(DIM):
        hre, him = _nib(h, d), _nib(h, d, "I:")
        rre, rim = _nib(r, d, "P:"), _nib(r, d, "Q:")
        tre, tim = _nib(t, d), _nib(t, d, "I:")
        s += hre * rre * tre + him * rre * tim \
            + hre * rim * tim - him * rim * tre
    return s


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["complex_scores"](spark, SF),
                      con.sql(ORACLE["complex_scores"]).df())
    assert ok, msg


def test_matches_python_reimplementation(spark):
    from ehr_relation_extraction_spark.operators.kg_embed import (
        complex_scores)

    facts = [("aspirin", "treats", "headache"),
             ("headache", "treats", "aspirin"),
             ("spark", "powers", "pipeline")]
    tr = spark.createDataFrame(
        facts, "subj string, pred string, obj string")
    got = {(r.subj, r.pred, r.obj): r.score
           for r in complex_scores(tr).collect()}
    for h, r, t in facts:
        assert got[(h, r, t)] == _cx(h, r, t)


def test_asymmetric_unlike_distmult(spark):
    """The capacity property ComplEx exists for: swapping (h, t)
    changes the score (DistMult provably cannot do this)."""
    from ehr_relation_extraction_spark.operators.kg_embed import (
        complex_scores, distmult_scores)

    tr = spark.createDataFrame(
        [("aspirin", "treats", "headache"),
         ("headache", "treats", "aspirin")],
        "subj string, pred string, obj string")
    cx = {(r.subj, r.obj): r.score for r in complex_scores(tr).collect()}
    dm = {(r.subj, r.obj): r.score for r in distmult_scores(tr).collect()}
    assert dm[("aspirin", "headache")] == dm[("headache", "aspirin")]
    assert cx[("aspirin", "headache")] != cx[("headache", "aspirin")]
    # and the antisymmetric part matches the closed form:
    # s(h,r,t) - s(t,r,h) = 2 * sum_d rIm * (hRe*tIm - hIm*tRe)
    h, r, t = "aspirin", "treats", "headache"
    anti = 2 * sum(
        _nib(r, d, "Q:") * (_nib(h, d) * _nib(t, d, "I:")
                            - _nib(h, d, "I:") * _nib(t, d))
        for d in range(DIM))
    assert cx[(h, t)] - cx[(t, h)] == anti
