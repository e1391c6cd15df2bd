"""Cross-engine parity + serial ground truth for continuation
batch 148 (functions/textstats.zonemap_pruning)."""

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

    ok, msg = compare(QUERIES["zonemap_pruning"](spark, SF),
                      con.sql(ORACLE["zonemap_pruning"]).df())
    assert ok, msg


def test_engineered_pruning(spark):
    """Hand-built corpus where the serial packing and every per-
    predicate stat are enumerable by hand: capacity 100, docs of 50
    chars each => 2 docs per file; lang-clustered order puts all 'en'
    docs in dedicated files, so lang=en skips every non-en file,
    while an n_chars predicate that matches one straggler doc scans
    its whole file (amplification 2x)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        zonemap_pruning)

    rows = []
    did = 0
    for lang, n in [("de", 4), ("en", 4)]:
        for _ in range(n):
            rows.append((did, "t", lang, "s", 50))
            did += 1
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {r.pred: (r.n_files, r.files_skipped, r.rows_scanned,
                    r.rows_matched, r.scan_amp_micro6)
           for r in zonemap_pruning(df, capacity=100).collect()}
    # 8 docs x 50 chars, capacity 100 => 4 files: de/de, de/de,
    # en/en, en/en (exclusive cumsum 0,50,...,350 // 100)
    # lang=en: files 0,1 skipped (max_l='de'), scans 4 rows, all 4
    # match => amp 1.0
    assert got["lang=en"] == (4, 2, 4, 4, 1000000)
    # n_chars>=400: no doc matches; every file skipped (max_n=50)
    assert got["n_chars>=400"] == (4, 4, 0, 0, 0)
    # n_chars<60: every doc matches, nothing skippable => amp 1.0
    assert got["n_chars<60"] == (4, 0, 8, 8, 1000000)
