"""Cross-engine parity + serial ground truth for continuation
batch 168 (functions/sketches.hash_collisions)."""

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

    ok, msg = compare(QUERIES["hash_collisions"](spark, SF),
                      con.sql(ORACLE["hash_collisions"]).df())
    assert ok, msg


def test_serial_replay(spark):
    """The whole statistic replayed serially with hashlib on a
    hand-made vocabulary (12 distinct tokens after lowercasing —
    'Apple' and 'apple' collapse)."""
    from ehr_relation_extraction_spark.functions.sketches import (
        hash_collisions)

    words = ["Apple", "apple", "banana", "cherry", "date", "egg",
             "fig", "grape", "honey", "ice", "jam", "kiwi", "lime"]
    text = " ".join(words)
    df = spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        ["doc_id", "text", "lang", "source", "n_chars"])

    vocab = sorted({w.lower() for w in words})
    assert len(vocab) == 12
    want = {}
    for w in (8, 12, 16):
        buckets = {}
        for tok in vocab:
            h16 = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16)
            b = h16 // (65536 // (1 << w))
            buckets[b] = buckets.get(b, 0) + 1
        want[w] = (
            sum(buckets.values()), len(buckets),
            sum(c for c in buckets.values() if c > 1),
            sum(c * (c - 1) // 2 for c in buckets.values()),
            (1_000_000 * sum(buckets.values())) // len(buckets))

    got = {r.width: (r.n_keys, r.n_buckets_used, r.n_colliding_keys,
                     r.n_collision_pairs, r.keys_per_bucket_micro6)
           for r in hash_collisions(df).collect()}
    assert got == want
    # monotonicity: wider hashes collide no more than narrower ones
    assert got[16][3] <= got[12][3] <= got[8][3]
