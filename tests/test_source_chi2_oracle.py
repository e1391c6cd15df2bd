"""Cross-engine parity + serial ground truth for continuation
batch 96 (functions/textstats.source_gate_chi2)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

OK_TEXT = ("the a of and to in " * 5 + "x y z w v u q r s t").strip()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["source_gate_chi2"](spark, SF),
                      con.sql(ORACLE["source_gate_chi2"]).df())
    assert ok, msg


def test_chi2_formula_exact_and_flags_biased_source(spark):
    """A source whose docs systematically fail the gate produces the
    dominant contribution; every value matches the integer formula
    serially replayed.  Keeps are driven through the REAL gate:
    passing docs are long/diverse/stopword-rich, failing docs are
    too short."""
    from ehr_relation_extraction_spark.functions.textstats import (
        source_gate_chi2)

    rows, doc = [], 0
    plan = {"good1": (10, 0), "good2": (9, 1), "bad": (2, 8)}
    for src, (n_ok, n_fail) in plan.items():
        for i in range(n_ok):
            rows.append((doc, src, OK_TEXT + " uniq%d" % doc))
            doc += 1
        for i in range(n_fail):
            rows.append((doc, src, "tiny doc %d" % doc))
            doc += 1
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {r.source: r for r in source_gate_chi2(df).collect()}

    N = sum(a + b for a, b in plan.values())
    K = sum(a for a, _ in plan.values())
    p = K * 10**6 // N
    denom = (p * (10**6 - p)) // 10**6
    total = 0
    for src, (n_ok, n_fail) in plan.items():
        n, k = n_ok + n_fail, n_ok
        r = got[src]
        rate = k * 10**6 // n
        chi2 = (n * (rate - p) * (rate - p)) // denom
        assert (r.n_docs, r.n_keep, r.rate_micro6,
                r.global_rate_micro6, r.chi2_micro6) == (
            n, k, rate, p, chi2)
        total += chi2
    assert all(r.chi2_total_micro6 == total for r in got.values())
    assert got["bad"].chi2_micro6 > 2 * got["good1"].chi2_micro6
    assert got["bad"].chi2_micro6 == max(
        r.chi2_micro6 for r in got.values())

    # degenerate: everything keeps -> p = 1e6 -> all contributions 0
    allok = spark.createDataFrame(
        [(i, "s%d" % (i % 2), OK_TEXT + " u%d" % i) for i in range(6)],
        ["doc_id", "source", "text"])
    for r in source_gate_chi2(allok).collect():
        assert r.chi2_micro6 == 0 and r.chi2_total_micro6 == 0
