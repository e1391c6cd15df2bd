"""Cross-engine parity + a serial SimRank replica for continuation
batches 43 (neighborhood-function distribution) and 44 (fixed-round
integer SimRank)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("key", ["nf_distribution", "simrank"])
def test_oracle_parity(spark, con, key):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[key](spark, SF),
                      con.sql(ORACLE[key]).df())
    assert ok, msg


def test_nf_rollup_consistent(spark):
    """The rollup equals a groupBy over the hyperball query itself."""
    from ehr_relation_extraction_spark import driver_queries as dq

    hb = dq.QUERIES["hyperball"](spark, SF).collect()
    expect: dict[int, list] = {}
    for r in hb:
        expect.setdefault(r.dist, []).append(r.est_milli)
    got = {r.dist: (r.n_nodes, r.nf_sum_milli)
           for r in dq.QUERIES["nf_distribution"](spark, SF).collect()}
    assert got == {d: (len(v), sum(v)) for d, v in expect.items()}
    assert sorted(got) == [0, 1, 2, 3]


def test_simrank_serial_replica(spark):
    """The distributed run bit-equals a plain-Python fixed-round
    SimRank (micro6 floors, C=4/5, s(x,x)=1e6 pinned) on the
    collected precedence graph."""
    from ehr_relation_extraction_spark import driver_queries as dq

    edges, _ = dq._prec_graph(spark, SF)
    ins: dict[str, list] = {}
    for r in edges.select("src", "dst").distinct().collect():
        ins.setdefault(r.dst, []).append(r.src)
    nodes = sorted(ins)

    def key(x, y):
        return (x, y) if x < y else (y, x)

    def s_of(state, i, j):
        if i == j:
            return 1000000
        return state.get(key(i, j), 0)

    state: dict = {}
    for _ in range(3):
        new = {}
        for ai in range(len(nodes)):
            for bi in range(ai + 1, len(nodes)):
                a, b = nodes[ai], nodes[bi]
                tot = sum(s_of(state, i, j)
                          for i in ins[a] for j in ins[b])
                s = (4 * tot) // (5 * len(ins[a]) * len(ins[b]))
                if s > 0:
                    new[(a, b)] = s
        state = new

    got = {(r.node_a, r.node_b): r.simrank_micro6
           for r in dq.QUERIES["simrank"](spark, SF).collect()}
    assert got == state and got
