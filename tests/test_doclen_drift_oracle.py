"""Cross-engine parity + serial ground truth for continuation
batch 131 (functions/textstats.doclen_drift)."""

from __future__ import annotations

import hashlib
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

    ok, msg = compare(QUERIES["doclen_drift"](spark, SF),
                      con.sql(ORACLE["doclen_drift"]).df())
    assert ok, msg


def _split(doc_id):
    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[30:32], 16)
    return "train" if b < 204 else ("dev" if b < 230 else "test")


def _serial(len_by_split):
    vals = sorted({x for c in len_by_split.values() for x in c})
    names = sorted(len_by_split)
    out = {}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ca, cb = len_by_split[a], len_by_split[b]
            na, nb = sum(ca.values()), sum(cb.values())
            cum_a = cum_b = 0
            ks = w1 = 0
            for j, x in enumerate(vals):
                cum_a += ca.get(x, 0)
                cum_b += cb.get(x, 0)
                d = abs(cum_a * nb - cum_b * na)
                ks = max(ks, d)
                gap = vals[j + 1] - x if j + 1 < len(vals) else 0
                w1 += d * gap
            out[(a, b)] = (na, nb, (1000000 * ks) // (na * nb),
                           (1000000 * w1) // (na * nb))
    return out


def test_matches_serial_ks_w1(spark):
    """Deterministic lengths with a deliberate shift pattern: both
    statistics must equal a serial ECDF replay per split pair."""
    from ehr_relation_extraction_spark.functions.textstats import (
        doclen_drift)

    rows = [(i, " ".join(["w"] * (3 + (i * 13) % 9 + (4 if i % 5 == 0
                                                      else 0))))
            for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.split_a, r.split_b): (r.n_a, r.n_b, r.ks_micro6,
                                    r.w1_micro6)
           for r in doclen_drift(df).collect()}

    len_by_split = {}
    for i, text in rows:
        len_by_split.setdefault(_split(i), Counter())[
            len(text.split())] += 1
    assert got == _serial(len_by_split)
    assert len(got) == 3


def test_identical_distributions_read_zero(spark):
    """Same length everywhere: KS and W1 must be exactly 0."""
    from ehr_relation_extraction_spark.functions.textstats import (
        doclen_drift)

    rows = [(i, "a b c") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for r in doclen_drift(df).collect():
        assert (r.ks_micro6, r.w1_micro6) == (0, 0)
