"""Cross-engine parity + serial ground truth for continuation
batch 123 (functions/textstats.k_anonymity)."""

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

    ok, msg = compare(QUERIES["k_anonymity"](spark, SF),
                      con.sql(ORACLE["k_anonymity"]).df())
    assert ok, msg


def test_matches_serial_audit(spark):
    """Engineered classes: one host/lang cell with 12 identical-
    length docs (safe at every k), one with 3 (violates k=5,10), two
    singletons (violate everything) — counts must match a dict
    replay."""
    from ehr_relation_extraction_spark.functions.textstats import (
        k_anonymity)

    rows = []
    did = 0
    # all docs same length (1 token) -> single bucket; classes are
    # purely (host, lang)
    for _ in range(12):
        rows.append((did, "x", "en", "h0")); did += 1
    for _ in range(3):
        rows.append((did, "x", "de", "h0")); did += 1
    rows.append((did, "x", "fr", "h1")); did += 1
    rows.append((did, "x", "zh", "h2")); did += 1
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source"])
    got = {r.k: (r.n_classes, r.n_violating_classes, r.n_exposed_docs,
                 r.exposed_share_micro6)
           for r in k_anonymity(df).collect()}

    sizes = [12, 3, 1, 1]
    total = sum(sizes)
    for k in (2, 5, 10):
        viol = [s for s in sizes if s < k]
        assert got[k] == (len(sizes), len(viol), sum(viol),
                          (1000000 * sum(viol)) // total)
    # the monotone property k-anonymity audits exist for
    assert got[2][2] <= got[5][2] <= got[10][2]
