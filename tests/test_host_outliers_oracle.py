"""Cross-engine parity + serial ground truth for continuation
batch 95 (functions/textstats.host_outliers)."""

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

    ok, msg = compare(QUERIES["host_outliers"](spark, SF),
                      con.sql(ORACLE["host_outliers"]).df())
    assert ok, msg


def test_median_mad_cut_matches_serial(spark):
    """A planted crawler-trap host among near-agreeing hosts: only
    the trap is flagged, the mean-based z-score would have been
    masked (the trap inflates the mean by ~4x), and every column
    equals a serial replica.  Volumes are driven through real text
    (token counts), not synthetic columns."""
    from ehr_relation_extraction_spark.functions.textstats import (
        host_outliers)

    # hosts h0..h8: ~100 tokens each; trap: 10x volume
    rows = []
    vols = {"h%d" % i: 100 + i for i in range(9)}
    vols["trap"] = 1000
    doc = 0
    for src, v in vols.items():
        rows.append((doc, src, " ".join("w%d" % j for j in range(v))))
        doc += 1
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {r.source: r for r in host_outliers(df).collect()}

    totals = sorted((v, k) for k, v in vols.items())
    med = totals[(len(totals) - 1) // 2][0]
    devs = sorted(abs(v - med) for v in vols.values())
    mad = devs[(len(devs) - 1) // 2]
    for src, v in vols.items():
        r = got[src]
        assert (r.total_tokens, r.med_tokens, r.mad_tokens,
                r.abs_dev) == (v, med, mad, abs(v - med))
        assert r.is_outlier == int(abs(v - med) * 10 > 35 * mad)
    assert got["trap"].is_outlier == 1
    assert sum(r.is_outlier for r in got.values()) == 1

    # MAD = 0 degenerate: all-identical hosts flag nothing, a single
    # deviant flags itself
    same = spark.createDataFrame(
        [(i, "s%d" % i, "a b c") for i in range(4)]
        + [(9, "odd", "a b c d")],
        ["doc_id", "source", "text"])
    g2 = {r.source: r for r in host_outliers(same).collect()}
    assert g2["odd"].is_outlier == 1
    assert sum(r.is_outlier for r in g2.values()) == 1
