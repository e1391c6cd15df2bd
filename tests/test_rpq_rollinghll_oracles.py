"""Cross-engine parity + brute-force semantics for continuation
batches 48 (bounded property-path reachability) and 49 (rolling
per-day HLL distinct estimates)."""

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


@pytest.mark.parametrize("key", ["rpq_reach", "rolling_entity_hll"])
def test_oracle_parity(spark, con, key):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[key](spark, SF),
                      con.sql(ORACLE[key]).df())
    assert ok, msg


def test_rpq_brute_force(spark):
    """The pair set equals BFS-bounded reachability (<= 4 hops) over
    the top-predicate edge set computed in plain Python."""
    from ehr_relation_extraction_spark import driver_queries as dq

    facts = (dq._frames(spark, SF).triples
             .select("pred", "subj", "obj").distinct().collect())
    cnt: dict[str, int] = {}
    for r in facts:
        cnt[r.pred] = cnt.get(r.pred, 0) + 1
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    adj: dict[str, set] = {}
    for r in facts:
        if r.pred == top:
            adj.setdefault(r.subj, set()).add(r.obj)
    expect = set()
    for s in adj:
        frontier = {s}
        seen: set = set()
        for _ in range(4):
            frontier = {d for f in frontier for d in adj.get(f, ())}
            frontier -= seen
            seen |= frontier
        expect |= {(s, d) for d in seen}

    got = {(r.src, r.dst)
           for r in dq.QUERIES["rpq_reach"](spark, SF).collect()}
    assert got == expect and got


def _rho(h: str) -> int:
    tail = h[1:13]
    stripped = tail.lstrip("0")
    if not stripped:
        return 49
    first = int(stripped[0], 16)
    zb = 0 if first >= 8 else 1 if first >= 4 else 2 if first >= 2 else 3
    return (12 - len(stripped)) * 4 + zb + 1


def test_rolling_hll_serial_replica(spark):
    """Day sketches + window merges + clamped estimator replicated in
    plain Python over the collected (day, entity) stream."""
    from ehr_relation_extraction_spark import driver_queries as dq

    _, linked, _ = dq._linked(spark, SF)
    rows = linked.select("doc_id", "canonical_id").collect()
    daily: dict[int, dict[int, int]] = {}
    for r in rows:
        day = (1704067200 + int(r.doc_id)) // 86400
        h = hashlib.md5(r.canonical_id.encode()).hexdigest()
        regs = daily.setdefault(day, {})
        reg = int(h[0], 16)
        regs[reg] = max(regs.get(reg, 0), _rho(h))
    days = sorted(daily)
    expect = {}
    for d in days:
        merged: dict[int, int] = {}
        nd = 0
        for d0 in range(d - 2, d + 1):
            if d0 in daily:
                nd += 1
                for reg, rho in daily[d0].items():
                    merged[reg] = max(merged.get(reg, 0), rho)
        s = 16 * (1 << 20) - sum(
            (1 << 20) - (1 << (20 - min(r, 20)))
            for r in merged.values())
        expect[d] = (nd, s, (673 * 256 * (1 << 20)) // s)

    got = {r.day_idx: (r.n_days_merged, r.s_x2p20, r.est_milli)
           for r in dq.QUERIES["rolling_entity_hll"](spark, SF).collect()}
    assert got == expect and got
