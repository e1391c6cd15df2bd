"""Cross-engine parity + serial ground truth for continuation
batch 94 (functions/textstats.quality_calibration)."""

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

    ok, msg = compare(QUERIES["quality_calibration"](spark, SF),
                      con.sql(ORACLE["quality_calibration"]).df())
    assert ok, msg


def test_buckets_are_rank_deciles_and_counts_are_exact(spark):
    """Invariants the table must satisfy on real data: buckets
    partition the corpus (sum n_docs == n docs), bucket ids are the
    rank-decile formula applied to the score order (equal scores
    share a bucket), rates are floor-scaled exactly, and score
    ranges are non-overlapping ascending."""
    from ehr_relation_extraction_spark.functions.textstats import (
        lm_quality, quality_calibration)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = sorted(
        quality_calibration(docs).collect(), key=lambda r: r.bucket)
    n_docs_total = docs.count()
    assert sum(r.n_docs for r in rows) == n_docs_total

    scores = sorted(
        r.lm_score_micro6
        for r in lm_quality(docs).select("lm_score_micro6").collect())
    # serial decile of each distinct score by its cum-before rank
    import bisect
    want = {}
    for s in sorted(set(scores)):
        cum_before = bisect.bisect_left(scores, s)
        want.setdefault(cum_before * 10 // len(scores),
                        []).append(s)
    assert {r.bucket for r in rows} == set(want)
    for r in rows:
        assert r.score_lo == min(want[r.bucket])
        assert r.score_hi == max(want[r.bucket])
        assert r.keep_rate_micro6 == r.n_keep * 10**6 // r.n_docs
    for a, b in zip(rows, rows[1:]):
        assert a.score_hi < b.score_lo          # disjoint ascending
