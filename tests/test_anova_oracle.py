"""Cross-engine parity + serial ground truth for continuation
batch 203 (functions/textstats.anova_f)."""

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

    ok, msg = compare(QUERIES["anova_f"](spark, SF),
                      con.sql(ORACLE["anova_f"]).df())
    assert ok, msg


def _docs(spark, groups):
    rows, did = [], 0
    for lang, vals in groups.items():
        for v in vals:
            rows.append((did, "x", lang, "s", v))
            did += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")


def test_matches_serial_replica(spark):
    """Textbook two-group case A=[1,2,3], B=[5,6,7]: group means
    2 and 6, grand mean 4, SSB = 3*4 + 3*4 = 24, SSW = 2+2 = 4,
    F = (24/1)/(4/4) = 24, eta2 = 24/28."""
    from ehr_relation_extraction_spark.functions.textstats import (
        anova_f)

    r = anova_f(_docs(spark, {"a": [1, 2, 3],
                              "b": [5, 6, 7]})).collect()[0]
    assert r.k_groups == 2 and r.n_total == 6
    assert r.ssb_x1e6 == 24 * 1000000
    assert r.ssw_x1e6 == 4 * 1000000
    assert r.f_milli3 == 24000
    assert r.eta2_micro6 == 1000000 * 24 // 28


def test_identical_groups_f_zero(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        anova_f)

    vals = [3, 7, 11]
    r = anova_f(_docs(spark, {"a": vals,
                              "b": list(vals)})).collect()[0]
    assert -2 <= r.ssb_x1e6 <= 0  # per-group floors may dip 1-2
    assert r.f_milli3 <= 0 or r.f_milli3 == 0
    assert r.eta2_micro6 <= 0


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        anova_f)

    d = _docs(spark, {"a": [10, 14, 9, 22], "b": [5, 8, 30],
                      "c": [17, 17, 2, 40, 11]})
    one = anova_f(d.coalesce(1)).collect()
    many = anova_f(d.repartition(7)).collect()
    assert one == many
