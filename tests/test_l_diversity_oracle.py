"""Cross-engine parity + serial ground truth for continuation
batch 153 (functions/textstats.l_diversity)."""

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

    ok, msg = compare(QUERIES["l_diversity"](spark, SF),
                      con.sql(ORACLE["l_diversity"]).df())
    assert ok, msg


def test_engineered_diversity(spark):
    """Two QI classes with identical token counts per lang (so the
    decile bucket is constant within lang): 'en' holds 2 hosts
    (l-div 2), 'de' holds 1 host (l-div 1).  With l=2 only the
    de-class violates; its 2 docs are exposed out of 6.  The
    de-class's host distribution (all hostC) vs global (2/6, 2/6,
    2/6) gives TVD = (1 - 2/6) = 2/3 exactly."""
    from ehr_relation_extraction_spark.functions.textstats import (
        l_diversity)

    rows = [
        (0, "w w w", "en", "hostA", 5),
        (1, "w w w", "en", "hostA", 5),
        (2, "w w w", "en", "hostB", 5),
        (3, "w w w", "en", "hostB", 5),
        (4, "w w w", "de", "hostC", 5),
        (5, "w w w", "de", "hostC", 5),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {r.l: (r.n_classes, r.n_violating_classes, r.n_exposed_docs,
                 r.exposed_share_micro6, r.max_tvd_micro6)
           for r in l_diversity(df).collect()}
    # l=2: de violates (1 distinct host) -> 2 exposed of 6
    assert got[2] == (2, 1, 2, 333_333, 666_666)
    # l=3: BOTH violate (en has 2 < 3) -> all 6 exposed
    assert got[3] == (2, 2, 6, 1_000_000, 666_666)
    assert got[5] == got[3]


def test_tvd_zero_when_uniform(spark):
    """When every class mirrors the global host mix exactly, the
    t-closeness TVD is 0 and nothing violates l=2."""
    from ehr_relation_extraction_spark.functions.textstats import (
        l_diversity)

    rows = []
    did = 0
    for lang in ("en", "de"):
        for host in ("h1", "h2"):
            rows.append((did, "w w", lang, host, 3))
            did += 1
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {r.l: (r.n_violating_classes, r.max_tvd_micro6)
           for r in l_diversity(df).collect()}
    assert got[2] == (0, 0)
