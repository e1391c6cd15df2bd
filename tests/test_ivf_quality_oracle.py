"""Cross-engine parity + serial ground truth for continuation
batch 171 (operators/similarity.ivf_quality)."""

from __future__ import annotations

import math

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

    ok, msg = compare(QUERIES["ivf_quality"](spark, SF),
                      con.sql(ORACLE["ivf_quality"]).df())
    assert ok, msg


def test_engineered_margins(spark):
    """2 axis-aligned centroids (vec_ids 0, 1); members at exact
    30/45-degree angles give hand-computable cosines: the 45-degree
    vector has margin 0 (equidistant, tie to cell 0), the 30-degree
    vector has margin floor(1e6*cos30) - floor(1e6*cos60)."""
    from ehr_relation_extraction_spark.operators.similarity import (
        ivf_quality)

    rows = [
        (0, [1.0, 0.0]),             # centroid cell 0
        (1, [0.0, 1.0]),             # centroid cell 1
        (2, [1.0, 1.0]),             # 45 deg: tie, cell 0
        (3, [math.sqrt(3.0), 1.0]),  # 30 deg from x-axis: cell 0
    ]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>")
    got = {r.cell: (r.n, r.min_own_s6, r.min_margin_s6)
           for r in ivf_quality(df, n_cells=2).collect()}
    # cell 1 holds only its centroid (own 1e6, margin 1e6 - s(90deg))
    assert got[1][0] == 1
    # cell 0: centroid (margin 1e6-0), the 45-deg tie (margin 0),
    # and the 30-deg member
    n0, min_own0, min_m0 = got[0]
    assert n0 == 3
    assert min_m0 == 0  # the 45-degree tie
    # the LOOSEST member of cell 0 is the 45-degree vector:
    # cos(45) = 0.70710678 -> floor at micro6
    assert min_own0 in (707106, 707107)
