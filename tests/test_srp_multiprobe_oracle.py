"""Cross-engine parity + serial ground truth for continuation
batch 81 (operators/similarity.srp_multiprobe_topk)."""

from __future__ import annotations

import hashlib
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

    ok, msg = compare(QUERIES["srp_multiprobe"](spark, SF),
                      con.sql(ORACLE["srp_multiprobe"]).df())
    assert ok, msg


def _vecs(n, dim=64):
    """Deterministic pseudo-random unit-ish vectors."""
    out = {}
    for i in range(n):
        v = [int(hashlib.md5(f"v:{i}:{d}".encode()).hexdigest()[:4],
                 16) % 1000 / 500.0 - 1.0 for d in range(dim)]
        out[i] = v
    return out


def test_matches_serial_and_superset(spark):
    """Whole-table equality against a serial numpy-free replica, plus
    the property multi-probe exists for: every query's candidate set
    is a SUPERSET of its single-bucket candidate set, and on this
    fixture at least one query gains a cross-bucket neighbor."""
    from ehr_relation_extraction_spark.config import (ANN_SIGN_BITS,
                                                      srp_planes)
    from ehr_relation_extraction_spark.operators.similarity import (
        srp_multiprobe_topk)

    vecs = _vecs(24)
    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    got = {(r.query_id, r.rank): (r.neighbor_id, r.sim_micro6)
           for r in srp_multiprobe_topk(emb).collect()}

    planes = srp_planes()
    bucket = {}
    for i, v in vecs.items():
        b = 0
        for bi, p in enumerate(planes):
            if sum(x * w for x, w in zip(v, p)) >= 0:
                b |= 1 << bi
        bucket[i] = b
    nrm = {i: math.sqrt(sum(x * x for x in v))
           for i, v in vecs.items()}
    want = {}
    gained = 0
    for qi, qv in vecs.items():
        probes = {bucket[qi]} | {bucket[qi] ^ (1 << b)
                                 for b in range(ANN_SIGN_BITS)}
        cands = [c for c in vecs
                 if c != qi and bucket[c] in probes]
        same = [c for c in cands if bucket[c] == bucket[qi]]
        assert set(same) <= set(cands)
        if len(cands) > len(same):
            gained += 1
        scored = sorted(
            ((math.floor(sum(a * b for a, b in zip(qv, vecs[c]))
                         / (nrm[qi] * nrm[c]) * 10**6), c)
             for c in cands), key=lambda t: (-t[0], t[1]))
        for rk, (s, c) in enumerate(scored[:3], 1):
            want[(qi, rk)] = (c, s)
    assert got == want
    assert gained > 0
