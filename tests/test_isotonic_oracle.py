"""Cross-engine parity + serial PAVA ground truth for continuation
batch 112 (functions/textstats.isotonic_fit)."""

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

    ok, msg = compare(QUERIES["isotonic_calibration"](spark, SF),
                      con.sql(ORACLE["isotonic_calibration"]).df())
    assert ok, msg


def _pava(w, y_num):
    """Classic sequential pool-adjacent-violators on weighted rates,
    exact rationals; returns per-bucket floor(1e6 * fit)."""
    blocks = [[wi, yi] for wi, yi in zip(w, y_num)]  # [weight, y_sum]
    merged = []
    for b in blocks:
        merged.append(b)
        while len(merged) >= 2 and \
                merged[-2][1] * merged[-1][0] > \
                merged[-1][1] * merged[-2][0]:  # prev rate > next rate
            b2 = merged.pop()
            merged[-1][0] += b2[0]
            merged[-1][1] += b2[1]
    out = []
    for wi, yi in merged:
        # the block spans several buckets; its pooled rate applies to
        # each — reconstruct the span from accumulated weight
        out.append((wi, (1000000 * yi) // wi))
    fit = []
    i = 0
    for wi, rate in out:
        consumed = 0
        while consumed < wi:
            consumed += w[i]
            fit.append(rate)
            i += 1
    return fit


@pytest.mark.parametrize("w,y_num", [
    # already monotone: fit == observed rates
    ([10, 10, 10, 10], [1, 3, 5, 9]),
    # one violator pools with its neighbor
    ([10, 10, 10, 10], [1, 6, 4, 9]),
    # long decreasing run pools into one block
    ([5, 5, 5, 5, 5], [5, 4, 3, 2, 1]),
    # uneven weights steer the pooled mean
    ([1, 100, 1, 1], [1, 10, 0, 1]),
])
def test_matches_sequential_pava(spark, w, y_num):
    from ehr_relation_extraction_spark.functions.textstats import (
        isotonic_fit)

    rows = [(i, wi, yi) for i, (wi, yi) in enumerate(zip(w, y_num))]
    df = spark.createDataFrame(rows, ["bucket", "n_docs", "n_keep"])
    got = [r.iso_micro6 for r in isotonic_fit(df)
           .orderBy("bucket").collect()]
    assert got == _pava(w, y_num)
    # monotone non-decreasing by construction
    assert got == sorted(got)


def test_driver_fit_is_monotone(spark):
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    rows = QUERIES["isotonic_calibration"](spark, SF) \
        .orderBy("bucket").collect()
    iso = [r.iso_micro6 for r in rows]
    assert iso == sorted(iso)
    # pooled blocks conserve mass: total fit-weighted docs ~= keeps
    assert len(rows) == 10
