"""Cross-engine parity + serial ground truth for continuation
batch 172 (functions/textstats.pareto_knee)."""

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

    ok, msg = compare(QUERIES["pareto_knee"](spark, SF),
                      con.sql(ORACLE["pareto_knee"]).df())
    assert ok, msg


def _knee(spark, host_counts):
    from ehr_relation_extraction_spark.functions.textstats import (
        pareto_knee)

    rows = []
    did = 0
    for h, c in host_counts.items():
        for _ in range(c):
            rows.append((did, "t", "en", h, 1))
            did += 1
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    return pareto_knee(df).collect()[0]


def test_engineered_knee(spark):
    """Counts 8,1,1,1,1: the curve jumps to 8/12 at rank 1 then
    climbs linearly — the knee is rank 1 by the serial cross-product
    replay (area = |5*8 - 12*1| = 28, strictly the max)."""
    r = _knee(spark, {"h1": 8, "h2": 1, "h3": 1, "h4": 1, "h5": 1})
    counts = [8, 1, 1, 1, 1]
    h, n = 5, 12
    cum = 0
    best = None
    for k, c in enumerate(counts, 1):
        cum += c
        area = abs(h * cum - n * k)
        if best is None or area > best[0]:
            best = (area, k, cum)
    assert (r.knee_rank, r.knee_cum_docs, r.knee_2area) == (
        best[1], best[2], best[0])
    assert r.knee_rank == 1 and r.knee_2area == 28
    assert r.knee_coverage_micro6 == (1_000_000 * 8) // 12


def test_uniform_ties_to_first(spark):
    """A perfectly flat distribution has area 0 everywhere — the
    deterministic tie-break lands on rank 1."""
    r = _knee(spark, {"a": 2, "b": 2, "c": 2})
    assert (r.knee_rank, r.knee_2area) == (1, 0)
