"""Cross-engine parity + serial ground truth for continuation
batch 166 (functions/textstats.bitmap_runs)."""

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

    ok, msg = compare(QUERIES["bitmap_runs"](spark, SF),
                      con.sql(ORACLE["bitmap_runs"]).df())
    assert ok, msg


def _runs(spark, ids_by_lang):
    from ehr_relation_extraction_spark.functions.textstats import (
        bitmap_runs)

    rows = [(i, "t", lang, "s", 1)
            for lang, ids in ids_by_lang.items() for i in ids]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    return {r.lang: r for r in bitmap_runs(df).collect()}


def test_engineered_islands(spark):
    """en ids {1,2,3, 7, 9,10} = 3 runs (longest 3); de is one
    dense run 100..104 where RLE wins; es is two far-apart ids
    where the raw list beats the huge bitmap span."""
    got = _runs(spark, {
        "en": [1, 2, 3, 7, 9, 10],
        "de": [100, 101, 102, 103, 104],
        "es": [0, 1_000_000],
    })
    en = got["en"]
    assert (en.n_docs, en.n_runs, en.longest_run, en.span) == (
        6, 3, 3, 10)
    assert en.avg_run_x1000 == 2000
    de = got["de"]
    assert (de.n_runs, de.bits_run, de.bits_bitmap, de.bits_list) \
        == (1, 128, 5, 320)
    # 5-bit bitmap beats both? span 5 < 128 and < 320 -> bitmap
    assert de.verdict == "bitmap"
    es = got["es"]
    assert (es.n_runs, es.span) == (2, 1_000_001)
    # 2 single-id runs cost 256 bits — the 128-bit raw list wins
    # (and both crush the ~1e6-bit bitmap span)
    assert es.bits_run == 256 and es.bits_list == 128
    assert es.verdict == "list"
