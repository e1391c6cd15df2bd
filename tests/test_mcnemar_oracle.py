"""Cross-engine parity + serial ground truth for continuation
batch 151 (functions/textstats.mcnemar_gates)."""

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

    ok, msg = compare(QUERIES["mcnemar_gates"](spark, SF),
                      con.sql(ORACLE["mcnemar_gates"]).df())
    assert ok, msg


def test_engineered_cells(spark):
    """Four hand-built docs hit all four contingency cells exactly
    once; a fifth (long + stopword-free) lands in n10, making the
    discordant pair (n10=2, n01=1) => mcnemar = (2-1)^2/3."""
    from ehr_relation_extraction_spark.functions.textstats import (
        mcnemar_gates)

    long_stop = ("the of and to in " * 50).strip()      # A=1 B=1
    long_nostop = ("qqq www eee rrr " * 50).strip()     # A=1 B=0
    short_stop = "the of and"                           # A=0 B=1
    short_nostop = "qqq www"                            # A=0 B=0
    long_nostop2 = ("zzz xxx ccc vvv " * 50).strip()    # A=1 B=0
    rows = [(0, long_stop, "en", "s", len(long_stop)),
            (1, long_nostop, "en", "s", len(long_nostop)),
            (2, short_stop, "en", "s", len(short_stop)),
            (3, short_nostop, "en", "s", len(short_nostop)),
            (4, long_nostop2, "en", "s", len(long_nostop2))]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    r = mcnemar_gates(df).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.n11, row.n10, row.n01, row.n00) == (1, 2, 1, 1)
    assert row.mcnemar_micro6 == 333_333  # floor(1e6 * 1 / 3)


def test_empty_and_agreeing(spark):
    """Empty text passes the stopword gate vacuously (0 >= 0) and
    fails the length gate => pure n01; gates that always agree give
    mcnemar = 0 via the discordant-zero guard."""
    from ehr_relation_extraction_spark.functions.textstats import (
        mcnemar_gates)

    df = spark.createDataFrame(
        [(0, "", "de", "s", 0)],
        ["doc_id", "text", "lang", "source", "n_chars"])
    row = mcnemar_gates(df).collect()[0]
    assert (row.n11, row.n10, row.n01, row.n00) == (0, 0, 1, 0)
    assert row.mcnemar_micro6 == 1_000_000  # (0-1)^2 / 1

    both = ("the of and to " * 60).strip()
    df2 = spark.createDataFrame(
        [(0, both, "fr", "s", len(both)), (1, "q", "fr", "s", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"])
    row2 = mcnemar_gates(df2).collect()[0]
    # doc0: A=1,B=1; doc1: A=0,B=0 -> no discordance
    assert (row2.n11, row2.n10, row2.n01, row2.n00) == (1, 0, 0, 1)
    assert row2.mcnemar_micro6 == 0
