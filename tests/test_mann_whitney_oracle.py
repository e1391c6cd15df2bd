"""Cross-engine parity + serial ground truth for continuation
batch 177 (functions/textstats.mann_whitney)."""

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

    ok, msg = compare(QUERIES["mann_whitney"](spark, SF),
                      con.sql(ORACLE["mann_whitney"]).df())
    assert ok, msg


def test_engineered_two_groups(spark):
    """A = [1,2,3], B = [2,3,4]: by brute force over the 9 pairs,
    #{a>b} = 1 (3>2) and #{a=b} = 2 ((2,2),(3,3)), so 2U_a = 4.
    Ties: t=2 at v=2 and v=3 -> tie_cubes = 6+6 = 12.  With
    n=6, n^3-n = 210: z2_micro6 = floor(1e6 * (4-9)^2 * 3*6*5
    / (9 * (210-12))) = floor(1e6 * 2250 / 1782) = 1262626."""
    from ehr_relation_extraction_spark.functions.textstats import (
        mann_whitney)

    docs = spark.createDataFrame(
        [("A", 1), ("A", 2), ("A", 3), ("B", 2), ("B", 3), ("B", 4)],
        "lang string, n_chars long")
    rows = mann_whitney(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.group_a, r.group_b) == ("A", "B")
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.u2_a == 4
    assert r.tie_cubes == 12
    assert r.shift_sign == -1
    assert r.z2_micro6 == 1262626


def test_engineered_identical_groups(spark):
    """Two identical single-value groups: U is exactly n1*n2/2
    (all ties), variance collapses to 0 -> z2_micro6 guard fires."""
    from ehr_relation_extraction_spark.functions.textstats import (
        mann_whitney)

    docs = spark.createDataFrame(
        [("A", 7), ("A", 7), ("B", 7), ("B", 7)],
        "lang string, n_chars long")
    r = mann_whitney(docs).collect()[0]
    assert r.u2_a == 2 * r.n_a * r.n_b // 2 * 2 // 2  # 2U = n_a*n_b
    assert r.u2_a == r.n_a * r.n_b
    assert r.shift_sign == 0
    assert r.z2_micro6 == 0
