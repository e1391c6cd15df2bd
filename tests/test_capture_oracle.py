"""Cross-engine parity + serial ground truth for continuation
batch 207 (functions/textstats.capture_recapture)."""

from __future__ import annotations

import hashlib

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

    ok, msg = compare(QUERIES["capture_recapture"](spark, SF),
                      con.sql(ORACLE["capture_recapture"]).df())
    assert ok, msg


def _captured(g, doc_id):
    nib = int(hashlib.md5(f"{g}|{doc_id}".encode())
              .hexdigest()[0], 16)
    return nib >= 3


def test_matches_python_md5_replica(spark):
    """The capture flags and both estimators must match a plain
    hashlib replica on a constructed host."""
    from ehr_relation_extraction_spark.functions.textstats import (
        capture_recapture)

    ids = list(range(200))
    df = spark.createDataFrame(
        [(i, "x", "en", "h", 1) for i in ids],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    r = capture_recapture(df).collect()[0]
    c1 = [i for i in ids if _captured(0, i)]
    c2 = [i for i in ids if _captured(1, i)]
    m = len(set(c1) & set(c2))
    assert r.n_true == 200
    assert r.n_cap1 == len(c1) and r.n_cap2 == len(c2)
    assert r.n_both == m
    assert r.lp_est == len(c1) * len(c2) // m
    assert r.chapman_est == ((len(c1) + 1) * (len(c2) + 1)
                             // (m + 1) - 1)
    # with ~81% capture rates the estimate should bracket the truth
    assert abs(r.chapman_est - 200) <= 20


def test_zero_overlap_guard(spark):
    """A 1-doc host: if both passes miss or only one captures,
    lp_est = 0 and chapman stays defined."""
    from ehr_relation_extraction_spark.functions.textstats import (
        capture_recapture)

    # find a doc_id missed by pass 0
    did = next(i for i in range(1000) if not _captured(0, i))
    df = spark.createDataFrame(
        [(did, "x", "en", "h", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    r = capture_recapture(df).collect()[0]
    assert r.n_cap1 == 0 and r.n_both == 0
    assert r.lp_est == 0
    assert r.chapman_est == (0 + 1) * (r.n_cap2 + 1) // 1 - 1


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        capture_recapture)

    df = spark.createDataFrame(
        [(i, "x", "en", f"h{i % 3}", 1) for i in range(90)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    one = capture_recapture(df.coalesce(1)).collect()
    many = capture_recapture(df.repartition(7)).collect()
    assert sorted(one) == sorted(many)
