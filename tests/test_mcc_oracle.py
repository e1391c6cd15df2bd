"""Cross-engine parity + serial ground truth for continuation
batch 152 (functions/textstats.mcc_scores)."""

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

    ok, msg = compare(QUERIES["mcc_scores"](spark, SF),
                      con.sql(ORACLE["mcc_scores"]).df())
    assert ok, msg


STOPFUL = "the of and to in the of and"   # 8 stopword tokens -> pred en
STOPLESS = "qqq www eee rrr"              # 0 stopwords -> pred unk


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, "s", len(t)) for i, (t, lang) in enumerate(rows)],
        ["doc_id", "text", "lang", "source", "n_chars"])


def test_engineered_confusion(spark):
    """2 TP + 1 FP + 1 FN + 2 TN by construction: num = 2*2 - 1*1
    = 3, den2 = 3*3*3*3 = 81, MCC = 3/9 = 1/3 => mcc2 = 1/9."""
    from ehr_relation_extraction_spark.functions.textstats import (
        mcc_scores)

    rows = [(STOPFUL, "en"), (STOPFUL, "en"),        # TP, TP
            (STOPFUL, "de"),                          # FP
            (STOPLESS, "en"),                         # FN
            (STOPLESS, "de"), (STOPLESS, "fr")]       # TN, TN
    r = mcc_scores(_df(spark, rows)).collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (2, 1, 1, 2)
    assert (r.mcc_num, r.mcc_den2, r.mcc_sign) == (3, 81, 1)
    assert r.mcc2_micro6 == 111_111  # floor(1e6 * 9 / 81)


def test_perfect_and_degenerate(spark):
    """Perfect separation gives MCC = 1 exactly; a single-class gold
    column zeroes a margin and falls to the conventional MCC = 0."""
    from ehr_relation_extraction_spark.functions.textstats import (
        mcc_scores)

    perfect = mcc_scores(_df(spark, [
        (STOPFUL, "en"), (STOPLESS, "de")])).collect()[0]
    assert (perfect.tp, perfect.tn, perfect.mcc_sign) == (1, 1, 1)
    assert perfect.mcc2_micro6 == 1_000_000

    degen = mcc_scores(_df(spark, [
        (STOPFUL, "en"), (STOPLESS, "en")])).collect()[0]
    assert degen.mcc_den2 == 0 and degen.mcc2_micro6 == 0
