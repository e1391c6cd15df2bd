"""Cross-engine parity + serial ground truth for continuation
batch 185 (operators/skew.hash_ring)."""

from __future__ import annotations

import hashlib

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

RING = 1 << 32


def _pos(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _serial_ring(nodes: list[str], vnodes: int):
    pts = sorted((_pos(f"{n}#{i}"), n, i)
                 for n in nodes for i in range(vnodes))
    arcs = {}
    for j, (p, n, _) in enumerate(pts):
        nxt = pts[j + 1][0] if j + 1 < len(pts) else pts[0][0] + RING
        arcs.setdefault(n, []).append(nxt - p)
    return arcs


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["hash_ring"](spark, SF),
                      con.sql(ORACLE["hash_ring"]).df())
    assert ok, msg


def test_matches_serial_ring(spark):
    """The arc geometry equals a plain-Python md5 ring, wrap-around
    arc included; arcs cover the whole keyspace exactly once."""
    from ehr_relation_extraction_spark.operators.skew import hash_ring

    nodes = ["alpha", "beta", "gamma"]
    truth = _serial_ring(nodes, 8)
    docs = spark.createDataFrame([(n,) for n in nodes],
                                 "source string")
    got = {r.node: r for r in hash_ring(docs, vnodes=8).collect()}
    total = 0
    for n in nodes:
        assert got[n].n_vnodes == 8
        assert got[n].arc_sum == sum(truth[n])
        assert got[n].max_arc == max(truth[n])
        assert got[n].share_micro6 == 10**6 * sum(truth[n]) // RING
        assert (got[n].skew_micro6
                == 10**6 * sum(truth[n]) * len(nodes) // RING)
        total += got[n].arc_sum
    assert total == RING


def test_more_vnodes_tightens_balance(spark):
    """The reason vnodes exist: at 64 vnodes the worst node share
    must sit closer to fair (1e6/n) than at 1 vnode."""
    from ehr_relation_extraction_spark.operators.skew import hash_ring

    nodes = [f"host{i}" for i in range(5)]
    docs = spark.createDataFrame([(n,) for n in nodes],
                                 "source string")
    def spread(v):
        rows = hash_ring(docs, vnodes=v).collect()
        return max(abs(r.skew_micro6 - 10**6) for r in rows)
    assert spread(64) < spread(1)
