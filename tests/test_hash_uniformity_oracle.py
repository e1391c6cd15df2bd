"""Cross-engine parity + serial ground truth for continuation
batch 137 (functions/sketches.hash_uniformity)."""

from __future__ import annotations

import hashlib
from collections import Counter

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

    ok, msg = compare(QUERIES["hash_uniformity"](spark, SF),
                      con.sql(ORACLE["hash_uniformity"]).df())
    assert ok, msg


def test_matches_serial_chi2(spark):
    """Serial replay of the bucket census over known ids, plus the
    statistical sanity band: the chi-square numerator over B*N sits
    within a few multiples of its uniform expectation B-1."""
    from ehr_relation_extraction_spark.functions.sketches import (
        hash_uniformity)

    n = 2000
    rows = [(i, "t") for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = hash_uniformity(df).collect()[0]

    cnt = Counter(
        int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16)
        for i in range(n))
    full = [cnt.get(b, 0) for b in range(256)]
    chi2_num = sum((256 * c - n) ** 2 for c in full)
    assert (r.n_buckets, r.n_items, r.occupied, r.max_bucket,
            r.min_bucket, r.chi2_num) == (
        256, n, sum(1 for c in full if c), max(full), min(full),
        chi2_num)
    # chi2 = chi2_num/(B*N) ~ ChiSq(255): expect within [150, 400]
    # for any decent hash (md5 easily passes; a constant hash would
    # read ~255*N = 510000)
    chi2 = chi2_num / (256 * n)
    assert 150 < chi2 < 400
