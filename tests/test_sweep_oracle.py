"""Cross-engine parity + serial ground truth for continuation
batch 167 (operators/triples.sweep_concurrency)."""

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

    ok, msg = compare(QUERIES["sweep_concurrency"](spark, SF),
                      con.sql(ORACLE["sweep_concurrency"]).df())
    assert ok, msg


def _sweep(spark, ivs):
    """ivs: list of (pred, from, to-or-None)."""
    from ehr_relation_extraction_spark.operators.triples import (
        sweep_concurrency)

    df = spark.createDataFrame(
        [(p, f, t) for p, f, t in ivs],
        "pred string, valid_from long, valid_to long")
    return {r.pred: (r.n_intervals, r.n_open_ended,
                     r.max_concurrent, r.t_at_max)
            for r in sweep_concurrency(df).collect()}


def test_engineered_sweep(spark):
    """Three stacked intervals peak at 3 exactly when the third
    opens (t=20); a TOUCHING pair ([0,10) then [10,20)) never
    overlaps — the close-before-open tie rule keeps max at 1."""
    got = _sweep(spark, [
        ("stack", 0, 100), ("stack", 10, 50), ("stack", 20, 30),
        ("touch", 0, 10), ("touch", 10, 20),
    ])
    assert got["stack"] == (3, 0, 3, 20)
    assert got["touch"] == (2, 0, 1, 0)


def test_open_ended(spark):
    """Open-ended intervals (NULL valid_to) never close: two
    open-ended plus one closed peak at 3 inside the closed one's
    window, and the open count is reported."""
    got = _sweep(spark, [
        ("p", 0, None), ("p", 5, None), ("p", 7, 9),
    ])
    assert got["p"] == (3, 2, 3, 7)
