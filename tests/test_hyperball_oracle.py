"""Cross-engine parity + a full serial replica for continuation
batch 42: HyperBall neighborhood function over the entity co-mention
graph (graph_algos.hyperball_nf)."""

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

    ok, msg = compare(QUERIES["hyperball"](spark, SF),
                      con.sql(ORACLE["hyperball"]).df())
    assert ok, msg


def _rho(h: str) -> int:
    tail = h[1:13]
    stripped = tail.lstrip("0")
    if not stripped:
        return 49
    first = int(stripped[0], 16)
    zb = 0 if first >= 8 else 1 if first >= 4 else 2 if first >= 2 else 3
    return (12 - len(stripped)) * 4 + zb + 1


def test_serial_replica(spark):
    """The distributed run bit-equals a plain-Python HyperBall on the
    collected graph — register init, 3 max-merge rounds, and the
    clamped integer estimator all replicated independently."""
    from ehr_relation_extraction_spark import driver_queries as dq

    edges, nodes = dq._comention_graph(spark, SF)
    nbrs: dict[str, set] = {}
    for r in edges.collect():
        nbrs.setdefault(r.src, set()).add(r.dst)
        nbrs.setdefault(r.dst, set()).add(r.src)
    allnodes = [r.node for r in nodes.collect()]

    regs: dict[str, dict[int, int]] = {}
    for n in allnodes:
        h = hashlib.md5(n.encode()).hexdigest()
        regs[n] = {int(h[0], 16): _rho(h)}

    def est_rows(d):
        out = {}
        for n in allnodes:
            s = 16 * (1 << 20) - sum(
                (1 << 20) - (1 << (20 - min(r, 20)))
                for r in regs[n].values())
            out[(n, d)] = (s, (673 * 256 * (1 << 20)) // s)
        return out

    expect = est_rows(0)
    for d in (1, 2, 3):
        new = {}
        for n in allnodes:
            merged = dict(regs[n])
            for m in nbrs.get(n, ()):
                for reg, r in regs[m].items():
                    if r > merged.get(reg, 0):
                        merged[reg] = r
            new[n] = merged
        regs = new
        expect.update(est_rows(d))

    got = {(r.node, r.dist): (r.s_x2p20, r.est_milli)
           for r in dq.QUERIES["hyperball"](spark, SF).collect()}
    assert got == expect and got


def test_monotone_balls(spark):
    """Registers only grow, so s_x2p20 is non-increasing and the
    ball estimate non-decreasing in dist for every node."""
    from ehr_relation_extraction_spark import driver_queries as dq

    per: dict[str, list] = {}
    for r in dq.QUERIES["hyperball"](spark, SF).collect():
        per.setdefault(r.node, []).append((r.dist, r.s_x2p20, r.est_milli))
    for n, rows in per.items():
        rows.sort()
        assert [d for d, _, _ in rows] == [0, 1, 2, 3], n
        ss = [s for _, s, _ in rows]
        es = [e for _, _, e in rows]
        assert ss == sorted(ss, reverse=True), n
        assert es == sorted(es), n
