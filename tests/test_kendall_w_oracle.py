"""Cross-engine parity + serial ground truth for continuation
batch 199 (functions/textstats.kendall_w)."""

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

    ok, msg = compare(QUERIES["kendall_w"](spark, SF),
                      con.sql(ORACLE["kendall_w"]).df())
    assert ok, msg


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")


def test_perfect_concordance_is_one(spark):
    """Three docs where length, distinct-token count and stopword
    count all rank identically (strictly increasing, no ties):
    W must be exactly 1."""
    from ehr_relation_extraction_spark.functions.textstats import (
        kendall_w)

    rows = [
        (0, "the q", "en", "s", 0),
        (1, "the the b c x1", "en", "s", 0),
        (2, "the the the d e f x2 x3", "en", "s", 0),
    ]
    # lengths 5 < 14 < 23 strictly increase; distinct counts
    # 2 < 4 < 6; stopword counts 1 < 2 < 3 ('q'..'x3' are not in
    # STOPWORDS) — no ties anywhere.
    r = kendall_w(_mk(spark, rows)).collect()[0]
    assert r.n_docs == 3 and r.tie_cubes == 0
    assert r.w_micro6 == 1000000


def test_discordant_rankers_below_one(spark):
    """Make the stopword ranking run OPPOSITE to length: W drops
    strictly below 1 (and stays >= 0)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        kendall_w)

    rows = [
        (0, "the the the a", "en", "s", 0),
        (1, "the the b c d padpad", "en", "s", 0),
        (2, "the e f g h i j padpadpadpad", "en", "s", 0),
    ]
    r = kendall_w(_mk(spark, rows)).collect()[0]
    assert 0 <= r.w_micro6 < 1000000


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        kendall_w)

    rows = [(i, ("the " * (i % 5) + "w" + str(i % 7) + " "
                 + "x " * (i % 11) + "y" * (i % 13)), "en", "s", 0)
            for i in range(30)]
    df = _mk(spark, rows)
    one = kendall_w(df.coalesce(1)).collect()
    many = kendall_w(df.repartition(7)).collect()
    assert sorted(one) == sorted(many)
