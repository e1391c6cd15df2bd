"""Cross-engine parity + serial ground truth for continuation
batch 204 (functions/textstats.levene_test)."""

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

    ok, msg = compare(QUERIES["levene_test"](spark, SF),
                      con.sql(ORACLE["levene_test"]).df())
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


def test_hand_checked_spread_difference(spark):
    """a tight around 10 (|z| = [1,0,1], median 10), b wide around
    10 (|z| = [8,0,8], median 10): z-groups means 2/3 vs 16/3,
    SSB_z = 3*(2/3-3)^2+3*(16/3-3)^2 = 98/3 * ... serial replica
    below is the assertion."""
    from ehr_relation_extraction_spark.functions.textstats import (
        levene_test)

    ga = [9, 10, 11]
    gb = [2, 10, 18]
    r = levene_test(_docs(spark, {"a": ga, "b": gb})).collect()[0]
    za = [abs(x - 10) for x in ga]
    zb = [abs(x - 10) for x in gb]
    sa, sb = sum(za), sum(zb)
    st = sa + sb
    s2t = sum(z * z for z in za + zb)
    q = (10**6 * sa * sa) // 3 + (10**6 * sb * sb) // 3
    ssb = q - (10**6 * st * st) // 6
    ssw = 10**6 * s2t - q
    assert r.k_groups == 2 and r.n_total == 6
    assert r.ssb_z_x1e6 == ssb
    assert r.ssw_z_x1e6 == ssw
    assert r.w_milli3 == 1000 * ssb * 4 // ssw


def test_equal_spread_w_near_zero(spark):
    """Same shape shifted: deviations identical -> SSB_z ~ 0."""
    from ehr_relation_extraction_spark.functions.textstats import (
        levene_test)

    r = levene_test(_docs(spark, {"a": [1, 5, 9],
                                  "b": [101, 105, 109]})).collect()[0]
    assert -2 <= r.ssb_z_x1e6 <= 0
    assert r.w_milli3 <= 0


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        levene_test)

    d = _docs(spark, {"a": [10, 14, 9, 22, 9], "b": [5, 8, 30],
                      "c": [17, 17, 2, 40]})
    one = levene_test(d.coalesce(1)).collect()
    many = levene_test(d.repartition(7)).collect()
    assert one == many
