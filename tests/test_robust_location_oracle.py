"""Cross-engine parity + serial ground truth for continuation
batch 183 (functions/textstats.robust_location)."""

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

    ok, msg = compare(QUERIES["robust_location"](spark, SF),
                      con.sql(ORACLE["robust_location"]).df())
    assert ok, msg


def test_matches_serial_sorted_definition(spark):
    """Histogram rank arithmetic == the textbook sorted-list
    definition, on a group with heavy ties and outliers (n = 40,
    k = 2): drop the 2 smallest and 2 largest, winsorize clamps
    them to the cut values."""
    from ehr_relation_extraction_spark.functions.textstats import (
        robust_location)

    vals = ([1, 1] + [5] * 16 + [7] * 18 + [9000, 10000]
            + [6, 6])                       # n = 40
    assert len(vals) == 40
    sv = sorted(vals)
    n, k = len(sv), len(sv) * 5 // 100
    trimmed = sv[k:n - k]
    lo_cut, hi_cut = sv[k], sv[n - k - 1]
    docs = spark.createDataFrame([("en", v) for v in vals],
                                 "lang string, n_chars long")
    r = robust_location(docs).collect()[0]
    assert (r.n, r.k) == (n, k)
    assert (r.lo_cut, r.hi_cut) == (lo_cut, hi_cut)
    assert r.trimmed_sum == sum(trimmed)
    assert r.trimmed_mean_micro6 == 10**6 * sum(trimmed) // (n - 2 * k)
    wins = sum(trimmed) + k * (lo_cut + hi_cut)
    assert r.winsor_sum == wins == sum(
        [max(lo_cut, min(hi_cut, v)) for v in sv])
    assert r.winsor_mean_micro6 == 10**6 * wins // n


def test_small_group_trims_nothing(spark):
    """n < 20 at 5% -> k = 0: trimmed == winsorized == plain sum."""
    from ehr_relation_extraction_spark.functions.textstats import (
        robust_location)

    docs = spark.createDataFrame(
        [("de", v) for v in [3, 100, 9]], "lang string, n_chars long")
    r = robust_location(docs).collect()[0]
    assert r.k == 0
    assert r.trimmed_sum == r.winsor_sum == 112
    assert r.lo_cut == 3 and r.hi_cut == 100
    assert r.trimmed_mean_micro6 == r.winsor_mean_micro6 \
        == 10**6 * 112 // 3
