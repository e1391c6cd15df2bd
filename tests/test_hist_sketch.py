"""Histogram sketch (functions/sketches.hist_*): cross-engine parity,
merge law, quantile-estimate error bound vs the exact percentile."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_doclen_hist_oracle(spark, con):
    from ehr_relation_extraction_spark.driver_queries import (
        ORACLE, QUERIES)

    ok, msg = compare(QUERIES["doclen_hist"](spark, SF),
                      con.sql(ORACLE["doclen_hist"]).df())
    assert ok, msg


def test_hist_merge_law(spark, docs):
    from ehr_relation_extraction_spark.functions.sketches import (
        hist_merge, hist_registers)

    full = sorted(map(tuple, hist_registers(
        docs.select("n_chars"), "n_chars").collect()))
    halves = hist_merge(
        hist_registers(docs.where("doc_id % 2 = 0").select("n_chars"),
                       "n_chars"),
        hist_registers(docs.where("doc_id % 2 = 1").select("n_chars"),
                       "n_chars"))
    assert sorted(map(tuple, halves.collect())) == full


def test_hist_quantile_error_bound(spark, docs):
    """The sketch's quantile estimate sits within one bucket width of
    the exact percentile, for every decile."""
    from ehr_relation_extraction_spark.functions.sketches import (
        HIST_WIDTH, hist_quantile, hist_registers)

    rows = hist_registers(docs.select("n_chars"), "n_chars").collect()
    vals = sorted(r.n_chars for r in docs.select("n_chars").collect())
    n = len(vals)
    for q in range(10, 100, 10):
        est = hist_quantile(rows, q)
        exact = vals[min(n - 1, (n * q + 99) // 100 - 1)]
        assert abs(est - exact) <= HIST_WIDTH, (q, est, exact)


def test_hist_total_mass(spark, docs):
    from ehr_relation_extraction_spark.functions.sketches import (
        hist_registers)

    got = (hist_registers(docs.select("n_chars"), "n_chars")
           .agg(F.sum("cnt")).first()[0])
    assert got == docs.count()
