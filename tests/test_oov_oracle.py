"""Cross-engine parity + serial ground truth for continuation
batch 173 (functions/textstats.oov_rate)."""

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

    ok, msg = compare(QUERIES["oov_rate"](spark, SF),
                      con.sql(ORACLE["oov_rate"]).df())
    assert ok, msg


def _bucket(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[30:32],
               16)


def test_engineered_oov(spark):
    """Pick ids whose md5 buckets land in train / dev by replaying
    the split device serially, then plant a known OOV token: the
    dev doc carries one seen and one unseen token."""
    train_id = next(i for i in range(1000) if _bucket(i) < 204)
    dev_id = next(i for i in range(1000)
                  if 204 <= _bucket(i) < 230)
    rows = [
        (train_id, "alpha beta Alpha", "en", "s", 16),
        (dev_id, "ALPHA zeta zeta", "en", "s", 15),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])
    from ehr_relation_extraction_spark.functions.textstats import (
        oov_rate)

    got = {r.split: (r.n_tokens, r.n_types, r.oov_tokens,
                     r.oov_types, r.oov_token_micro6)
           for r in oov_rate(df).collect()}
    # dev: tokens alpha (seen), zeta, zeta (unseen): 2/3 OOV tokens,
    # 1/2 OOV types
    assert got == {"dev": (3, 2, 2, 1, 666_666)}
