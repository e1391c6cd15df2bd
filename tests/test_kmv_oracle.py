"""Cross-engine parity + serial ground truth + merge property for
continuation batch 59: KMV bottom-k theta distinct sketch
(functions/sketches.kmv_with_exact)."""

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


def _h60(val: str) -> int:
    return int(hashlib.md5(f"kmv:{val}".encode()).hexdigest()[:15], 16)


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["kmv_entities"](spark, SF),
                      con.sql(ORACLE["kmv_entities"]).df())
    assert ok, msg


def test_matches_serial_kmv(spark):
    """Hashes, bottom-k, estimator, and the exact audit column
    replicated serially with hashlib.md5 — proves the windowed
    bottom-k computes the textbook KMV estimator."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.functions.sketches import (
        KMV_K, _KMV_POW60)
    from pyspark.sql import functions as F

    _, linked, _ = dq._linked(spark, SF)
    rows = (linked.select(
        F.regexp_extract("url", r"^https?://([^/]*)", 1).alias("host"),
        "canonical_id").collect())
    ents: dict[str, set[str]] = {}
    for r in rows:
        if r.canonical_id is not None:
            ents.setdefault(r.host, set()).add(r.canonical_id)
    assert ents

    got = {r.host: r for r in
           dq.QUERIES["kmv_entities"](spark, SF).collect()}
    assert set(got) == set(ents)
    for host, es in ents.items():
        hs = sorted({_h60(e) for e in es})
        bott = hs[:KMV_K]
        n_seen, kth = len(bott), max(bott)
        est = (n_seen if n_seen < KMV_K
               else (KMV_K - 1) * _KMV_POW60 // kth)
        r = got[host]
        assert (r.n_seen, r.kth_hval, r.est_distinct,
                r.exact_distinct) == (n_seen, kth, est, len(es)), host

    # estimator sanity on groups that actually saturated the sketch
    sat = [(r.est_distinct, r.exact_distinct)
           for r in got.values() if r.n_seen == KMV_K]
    if sat:
        worst = max(abs(e - x) / x for e, x in sat)
        assert worst <= 1.5  # k=8 is a coarse sketch; regression pin


def test_merge_equals_whole(spark):
    """kmv_merge(sketch(A), sketch(B)) == sketch(A union B) — the
    mergeability contract that makes the sketch shippable between
    shards without rescanning."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.functions.sketches import (
        kmv_merge, kmv_sketch)
    from pyspark.sql import functions as F

    _, linked, _ = dq._linked(spark, SF)
    he = linked.select(
        F.regexp_extract("url", r"^https?://([^/]*)", 1).alias("host"),
        "canonical_id")
    # split on a deterministic hash of the entity (he has only
    # host + canonical_id)
    split = F.md5(F.col("canonical_id")).substr(1, 1) \
        .isin(*list("01234567"))
    a, b = he.where(split), he.where(~split)
    merged = kmv_merge(kmv_sketch(a, "host", "canonical_id"),
                       kmv_sketch(b, "host", "canonical_id"))
    whole = kmv_sketch(he, "host", "canonical_id")
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, whole.collect()))
    assert got == want
