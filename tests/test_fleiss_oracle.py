"""Cross-engine parity + serial ground truth for continuation
batch 206 (functions/textstats.fleiss_kappa)."""

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

    ok, msg = compare(QUERIES["fleiss_kappa"](spark, SF),
                      con.sql(ORACLE["fleiss_kappa"]).df())
    assert ok, msg


def _serial_kappa(rs):
    n = len(rs)
    s = sum(rs)
    num = sum(r * (r - 1) + (3 - r) * (2 - r) for r in rs)
    e = s * s + (3 * n - s) * (3 * n - s)
    den = 2 * (9 * n * n - e)
    if den <= 0:
        return 0
    val = 1000000 * (3 * n * num - 2 * e)
    return (abs(val) // den) * (1 if val >= 0 else -1)


def test_matches_serial_replica_from_reported_totals(spark):
    """Internal consistency on real fixture data: kappa recomputed
    from the reported (n_docs, sum_r, agree_num) must equal the
    emitted kappa_micro6 for every language."""
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    for r in QUERIES["fleiss_kappa"](spark, SF).collect():
        n, s, num = r.n_docs, r.sum_r, r.agree_num
        e = s * s + (3 * n - s) ** 2
        den = 2 * (9 * n * n - e)
        if den > 0:
            val = 1000000 * (3 * n * num - 2 * e)
            expect = (abs(val) // den) * (1 if val >= 0 else -1)
            assert r.kappa_micro6 == expect
        else:
            assert r.kappa_micro6 == 0
        # kappa is bounded above by 1
        assert r.kappa_micro6 <= 1000000


def test_perfect_agreement_docs(spark):
    """Docs where all three gates agree (r = 0 or 3) give
    kappa = 1 exactly (when both verdicts occur)."""
    words = " ".join(f"w{i}" for i in range(50))
    all_pass = "the the the " + words + " " + "y" * 160
    all_fail = " ".join(["z"] * 9)
    df = spark.createDataFrame(
        [(0, all_pass, "en", "s", 1), (1, all_fail, "en", "s", 1),
         (2, all_pass + " extra", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    from ehr_relation_extraction_spark.functions.textstats import (
        fleiss_kappa)

    r = fleiss_kappa(df).collect()[0]
    assert r.agree_num == 6 * r.n_docs
    assert r.kappa_micro6 == 1000000


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        fleiss_kappa)

    rows = [(i, ("the " * (i % 7) + "w " * (i % 13)
                 + "x" * (30 * (i % 9))), "en", "s", 10)
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")
    one = fleiss_kappa(df.coalesce(1)).collect()
    many = fleiss_kappa(df.repartition(7)).collect()
    assert sorted(one) == sorted(many)
