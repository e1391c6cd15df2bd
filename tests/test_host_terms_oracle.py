"""Cross-engine parity + serial ground truth for continuation
batch 69 (functions/textstats.distinctive_terms)."""

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

    ok, msg = compare(QUERIES["host_terms"](spark, SF),
                      con.sql(ORACLE["host_terms"]).df())
    assert ok, msg


def test_matches_serial_llr(spark):
    """The whole top-5 table equals a serial G² replica with the same
    per-cell micro6 floors — and a planted over-represented term wins
    its group."""
    from ehr_relation_extraction_spark.functions.textstats import (
        distinctive_terms)

    rows = []
    # group g0: term "x" 30 times vs background; g1/g2: background
    for g, mix in (("g0", ["x"] * 30 + ["a"] * 20 + ["b"] * 10),
                   ("g1", ["a"] * 30 + ["b"] * 25 + ["x"] * 2),
                   ("g2", ["b"] * 40 + ["a"] * 15)):
        rows += [(g, t) for t in mix]
    df = spark.createDataFrame(rows, ["grp", "term"])
    got = {(r.grp, r.rank): (r.term, r.n_grp, r.n_corpus, r.llr_micro6)
           for r in distinctive_terms(df, "grp", "term", 5).collect()}

    # serial replica
    from collections import Counter
    a = Counter(rows)
    rg = Counter(g for g, _ in rows)
    ct = Counter(t for _, t in rows)
    n = len(rows)

    def cell(o, e):
        return (o * math.floor(math.log(o * n / e) * 10**6)
                if o > 0 else 0)

    want_rows: dict[str, list] = {}
    for (g, t), av in a.items():
        if av * n <= rg[g] * ct[t]:
            continue
        llr = 2 * (cell(av, rg[g] * ct[t])
                   + cell(rg[g] - av, rg[g] * (n - ct[t]))
                   + cell(ct[t] - av, (n - rg[g]) * ct[t])
                   + cell(n - rg[g] - ct[t] + av,
                          (n - rg[g]) * (n - ct[t])))
        want_rows.setdefault(g, []).append((-llr, t, av, ct[t], llr))
    want = {}
    for g, lst in want_rows.items():
        for k, (_, t, av, c, llr) in enumerate(sorted(lst)[:5]):
            want[(g, k + 1)] = (t, av, c, llr)
    assert got == want
    assert got[("g0", 1)][0] == "x"  # planted term tops its group
