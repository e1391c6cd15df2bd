"""Cross-engine parity + serial ground truth for continuation
batch 103 (operators/triples.benford_digits)."""

from __future__ import annotations

import math
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

    ok, msg = compare(QUERIES["benford_digits"](spark, SF),
                      con.sql(ORACLE["benford_digits"]).df())
    assert ok, msg


def test_constants_are_floored_log10():
    from ehr_relation_extraction_spark.operators.triples import (
        _BENFORD_MICRO6)

    assert _BENFORD_MICRO6 == tuple(
        math.floor(math.log10(1 + 1 / d) * 10**6) for d in range(1, 10))


def _serial(pairs):
    """Pure-Python replica: pairs = [(pred, obj_literal)]."""
    num = re.compile(r"([0-9][0-9,]*)(\.[0-9]+)?")
    per = {}
    for pred, obj in set(pairs):
        m = num.search(obj)
        if not m:
            continue
        sig = re.sub(r"^0+", "", re.sub(r"[^0-9]", "", m.group(0)))
        if not sig:
            continue
        per.setdefault(pred, []).append(int(sig[0]))
    exp = [math.floor(math.log10(1 + 1 / d) * 10**6)
           for d in range(1, 10)]
    out = {}
    for pred, ds in per.items():
        total = len(ds)
        devs = []
        for d in range(1, 10):
            n = ds.count(d)
            obs = n * 10**6 // total
            devs.append(abs(obs - exp[d - 1]))
        mad = sum(devs) // 9
        for d in range(1, 10):
            n = ds.count(d)
            out[(pred, d)] = (n, total, n * 10**6 // total,
                              exp[d - 1],
                              abs(n * 10**6 // total - exp[d - 1]),
                              mad)
    return out


def test_planted_digit_spike_and_zero_literals(spark):
    """Three planted predicates: a Benford-ish Money spread, a
    template wall of $9.99 (digit-9 spike must dominate MAD), and a
    predicate whose literals are all '0.00' / non-numeric (must not
    appear at all).  Leading zeros and commas are exercised; every
    value equals the pure-Python replica."""
    from ehr_relation_extraction_spark.operators.triples import (
        benford_digits)

    pairs = []
    # Benford-ish: magnitudes 1..9 with roughly log-decaying counts
    for d in range(1, 10):
        for i in range(10 - d):
            pairs.append(("Money", f"${d},{100 + i:03d}.50"))
    # template wall: every literal starts with 9
    for i in range(12):
        pairs.append(("Price", f"$9.9{i}"))
    # excluded: all-zero or non-numeric literals
    pairs += [("Nil", "0.00"), ("Nil", "zero"), ("Nil", "0,000")]
    # leading-zero fraction: 0.042 -> first significant digit 4
    pairs.append(("Money", "0.042"))

    df = spark.createDataFrame(
        [("d0", "u0", "s0", f"s{i}", p, o)
         for i, (p, o) in enumerate(pairs)],
        ["doc_id", "url", "subj_id", "subj", "pred", "obj"])
    got = {(r.pred, r.digit): (r.n_obs, r.n_total, r.obs_micro6,
                               r.exp_micro6, r.dev_micro6,
                               r.mad_micro6)
           for r in benford_digits(df).collect()}
    want = _serial(pairs)
    assert got == want
    assert not any(p == "Nil" for p, _ in got)
    # the template wall: all 12 observations on digit 9
    assert got[("Price", 9)][0] == 12
    # Price's MAD is far above Money's (spike vs near-Benford)
    assert got[("Price", 1)][5] > got[("Money", 1)][5]
    # leading-zero fraction lands on digit 4
    assert got[("Money", 4)][0] >= 1
