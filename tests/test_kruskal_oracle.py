"""Cross-engine parity + serial ground truth for continuation
batch 188 (functions/textstats.kruskal_wallis)."""

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

    ok, msg = compare(QUERIES["kruskal_wallis"](spark, SF),
                      con.sql(ORACLE["kruskal_wallis"]).df())
    assert ok, msg


def _mk_docs(spark, groups):
    """groups: dict lang -> list of n_chars values."""
    rows, did = [], 0
    for lang, vals in groups.items():
        for v in vals:
            rows.append((did, "x" * 3, lang, "s", v))
            did += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")


def test_textbook_no_ties(spark):
    """A=[1,2], B=[3]: pooled ranks 1,2,3 (doubled 2,4,6);
    H = 12/(3*4) * (3^2/2 + 3^2/1) - 3*4 = 1.5 exactly; no ties so
    the corrected H equals the uncorrected one."""
    from ehr_relation_extraction_spark.functions.textstats import (
        kruskal_wallis)

    df = kruskal_wallis(_mk_docs(spark, {"a": [1, 2], "b": [3]}))
    rows = {r.group: r for r in df.collect()}
    assert rows["a"].n == 2 and rows["a"].r2_sum == 2 + 4
    assert rows["b"].n == 1 and rows["b"].r2_sum == 6
    assert rows["a"].n_total == 3 and rows["a"].tie_cubes == 0
    assert rows["a"].h_micro6 == 1500000
    assert rows["a"].h_corr_micro6 == 1500000


def test_tie_correction(spark):
    """A=[1,1], B=[2]: tied pair at v=1 (doubled mid-rank 3),
    tie_cubes = 2^3-2 = 6, H_unc = 1.5, correction factor
    1 - 6/(27-3) = 3/4, so H_corr = 2.0 — scipy.stats.kruskal
    agrees ([1,1],[2] -> H = 2.0)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        kruskal_wallis)

    df = kruskal_wallis(_mk_docs(spark, {"a": [1, 1], "b": [2]}))
    rows = {r.group: r for r in df.collect()}
    assert rows["a"].r2_sum == 3 + 3
    assert rows["b"].r2_sum == 6
    assert rows["a"].tie_cubes == 6
    assert rows["a"].h_micro6 == 1500000
    assert rows["a"].h_corr_micro6 == 2000000


def test_identical_groups_h_zero(spark):
    """Two identical samples: every group's mean doubled rank is the
    pooled mean, so H is 0 up to the per-term floor (>= -2e-6)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        kruskal_wallis)

    vals = [5, 7, 7, 9, 11]
    df = kruskal_wallis(_mk_docs(spark, {"a": vals, "b": list(vals)}))
    r = df.collect()[0]
    assert -2 <= r.h_micro6 <= 0
    assert r.n_total == 10


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        kruskal_wallis)

    docs = _mk_docs(spark, {"a": [1, 4, 4, 9], "b": [2, 4, 8],
                            "c": [3, 3, 10, 12, 12]})
    one = kruskal_wallis(docs.coalesce(1)).collect()
    many = kruskal_wallis(docs.repartition(7)).collect()
    key = lambda r: r.group
    assert sorted(one, key=key) == sorted(many, key=key)
