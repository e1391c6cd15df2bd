"""Cross-engine parity + serial ground truth for continuation
batch 104 (operators/similarity.mmr_rerank)."""

from __future__ import annotations

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

    ok, msg = compare(QUERIES["mmr_rerank"](spark, SF),
                      con.sql(ORACLE["mmr_rerank"]).df())
    assert ok, msg


def _sim_micro6(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return math.floor(dot / (na * nb) * 10**6)


def _serial_mmr(vecs, query_id=0, n_candidates=50, k=10, lam=70):
    rel = {i: _sim_micro6(v, vecs[query_id])
           for i, v in vecs.items() if i != query_id}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:n_candidates]
    # None until the first pick: cosine can be negative, so a 0 init
    # would clamp the diversity penalty (mirrors the operator's NULL)
    picked, maxsim = [], {i: None for i in cand}
    for rank in range(1, k + 1):
        rest = [i for i in cand if i not in {p[1] for p in picked}]
        if not rest:
            break

        def _score(i):
            return lam * rel[i] - (100 - lam) * (maxsim[i] or 0)

        best = min(rest, key=lambda i: (-_score(i), i))
        picked.append((rank, best, rel[best], maxsim[best] or 0,
                       _score(best)))
        for i in rest:
            if i != best:
                s = _sim_micro6(vecs[i], vecs[best])
                maxsim[i] = s if maxsim[i] is None else max(
                    maxsim[i], s)
    return picked


def test_greedy_matches_serial_replica_and_diversifies(spark):
    """Planted geometry: a tight near-duplicate cluster hugging the
    query plus a slightly-less-relevant but diverse spread.  Pure
    relevance ranking would fill the page with the clones; MMR must
    interleave the diverse arm after the first clone.  Every value
    equals the serial replica."""
    from ehr_relation_extraction_spark.operators.similarity import (
        mmr_rerank)

    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],            # query
        1: [0.95, 0.31225, 0.0, 0.0],       # top hit
        2: [0.94, 0.315, 0.0008, 0.0],      # near-clone of 1
        3: [0.9, 0.0, 0.436, 0.0],          # diverse: sim(3,1)=.855
        4: [0.9, 0.0, 0.0, 0.436],          # diverse
        5: [0.9, 0.436, 0.0, 0.0],          # same direction as 1
    }

    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    got = [(r.pick_rank, r.vec_id, r.rel_micro6, r.maxsim_micro6,
            r.mmr_score)
           for r in mmr_rerank(df, query_id=0, n_candidates=50,
                               k=5, lam_pct=70)
           .orderBy("pick_rank").collect()]
    want = _serial_mmr(vecs, k=5)
    assert got == want
    # pick 1 is the top hit; its near-clone (id 2, rel only 0.00003
    # lower than the diverse arm's penalty edge) must be displaced by
    # the two orthogonal-arm results — pure relevance would slot the
    # clone second
    assert got[0][1] == 1
    assert {got[1][1], got[2][1]} == {3, 4}
    assert got[3][1] == 2


def test_fewer_candidates_than_k_stops_early(spark):
    from ehr_relation_extraction_spark.operators.similarity import (
        mmr_rerank)

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    out = mmr_rerank(df, query_id=0, k=10).collect()
    assert len(out) == 2
