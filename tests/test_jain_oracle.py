"""Cross-engine parity + serial ground truth for continuation
batch 162 (functions/textstats.jain_fairness)."""

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

    ok, msg = compare(QUERIES["jain_fairness"](spark, SF),
                      con.sql(ORACLE["jain_fairness"]).df())
    assert ok, msg


def test_engineered_fairness(spark):
    """4 docs on one host + 4 spread over 4 langs: the lang key is
    perfectly fair (J = 1), the host key is maximally unfair over
    its 2 hosts when one holds 6 of 8 docs: J = 64/(2*40) = 0.8."""
    from ehr_relation_extraction_spark.functions.textstats import (
        jain_fairness)

    rows = []
    langs = ["en", "de", "es", "fr"] * 2
    for i in range(8):
        src = "hostA" if i < 6 else "hostB"
        rows.append((i, "t", langs[i], src, 1))
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {r.grouping: (r.n_groups, r.n_docs, r.sum_sq,
                        r.jain_micro6)
           for r in jain_fairness(df).collect()}
    # host: counts 6,2 -> J = 64 / (2 * (36+4)) = 0.8
    assert got["host"] == (2, 8, 40, 800_000)
    # lang: counts 2,2,2,2 -> J = 64 / (4 * 16) = 1.0
    assert got["lang"] == (4, 8, 16, 1_000_000)
    # md5 bucket row exists and is a valid index in (0, 1]
    nb, nd, ss, j = got["md5_bucket"]
    assert nd == 8 and 0 < j <= 1_000_000
    assert j == (1_000_000 * 64) // (nb * ss)
