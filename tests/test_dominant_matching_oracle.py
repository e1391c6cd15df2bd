"""Cross-engine parity + serial ground truth for continuation
batch 80 (operators/graph_algos.dominant_matching)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


def _serial_matching(edges, n_rounds=6):
    """Reference Preis matching: per round keep edges whose
    (w, src, dst) key is max at both endpoints."""
    live = {(a, b): w for a, b, w in edges}
    out = []
    for r in range(1, n_rounds + 1):
        if not live:
            break
        best = {}
        for (a, b), w in live.items():
            for n in (a, b):
                k = (w, a, b)
                if n not in best or k > best[n]:
                    best[n] = k
        m = [(a, b, w) for (a, b), w in live.items()
             if best[a] == (w, a, b) and best[b] == (w, a, b)]
        gone = {n for a, b, _ in m for n in (a, b)}
        out += [(a, b, w, r) for a, b, w in m]
        live = {(a, b): w for (a, b), w in live.items()
                if a not in gone and b not in gone}
    return sorted(out)


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["dominant_matching"](spark, SF),
                      con.sql(ORACLE["dominant_matching"]).df())
    assert ok, msg


def test_matches_serial_and_is_matching(spark):
    """Whole-table equality against the serial Preis replica on a
    weighted path + triangle + star, plus the properties the operator
    exists for: the result IS a matching (each node at most once),
    the globally heaviest edge is always in it, and the greedy weight
    is >= 1/2 the maximum matching weight on the fixture."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        dominant_matching)

    # path p1-p2-p3-p4 with middle edge heaviest; triangle with
    # distinct weights; star s0 center (only one star edge can match)
    edges = [("p1", "p2", 5), ("p2", "p3", 9), ("p3", "p4", 5),
             ("t1", "t2", 7), ("t1", "t3", 3), ("t2", "t3", 4),
             ("s0", "s1", 2), ("s0", "s2", 8), ("s0", "s3", 6)]
    edf = spark.createDataFrame(edges, ["src", "dst", "weight"])
    got = sorted((r.src, r.dst, r.weight, r.matched_round)
                 for r in dominant_matching(edf).collect())
    assert got == _serial_matching(edges)

    nodes = [n for a, b, _, _ in got for n in (a, b)]
    assert len(nodes) == len(set(nodes))        # a matching
    ms = {(a, b) for a, b, _, _ in got}
    assert ("p2", "p3") in ms                   # global max edge
    assert ("t1", "t2") in ms and ("s0", "s2") in ms
    # greedy >= 1/2 OPT (OPT here: 5+5+7+8 = 25)
    assert sum(w for _, _, w, _ in got) * 2 >= 25
