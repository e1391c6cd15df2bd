"""Cross-engine parity + semantics for continuation batch 24: the
integer-quantized TransE fact scores and the filtered link-prediction
ranking evaluation.  Same compare as the driver replica, at sf0.001."""

from __future__ import annotations

import hashlib

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

KEYS = ["transe_scores", "transe_ranks"]


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", KEYS)
def test_oracle_parity(spark, con, name):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[name](spark, SF),
                      con.sql(ORACLE[name]).df())
    assert ok, f"{name}: {msg}"


def _nib(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[0], 16) - 8


def _score(h: str, r: str, t: str, dim: int = 8) -> int:
    return sum(abs(_nib(f"{h}:{d}") + _nib(f"P:{r}:{d}")
                   - _nib(f"{t}:{d}")) for d in range(dim))


def test_transe_scores_vs_python_replica(spark):
    """The unrolled codegen expression equals a pure-Python md5
    replica on every fact (bit-level device check)."""
    from ehr_relation_extraction_spark import driver_queries as dq

    rows = dq.QUERIES["transe_scores"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.score == _score(r.subj, r.pred, r.obj), \
            (r.subj, r.pred, r.obj)


def test_transe_ranks_vs_brute_force(spark):
    """The join-based filtered ranking equals a driver-side brute
    force (candidate cap, true-fact filtering, optimistic ties)."""
    from collections import defaultdict

    from ehr_relation_extraction_spark import driver_queries as dq

    facts = {(r.subj, r.pred, r.obj) for r in
             dq._frames(spark, SF).triples
             .select("subj", "pred", "obj").collect()}
    objs = defaultdict(set)
    for _s, p, o in facts:
        objs[p].add(o)
    cands = {p: sorted(v, key=lambda o: (hashlib.md5(o.encode())
                                         .hexdigest(), o))[:100]
             for p, v in objs.items()}
    per_pred = defaultdict(lambda: [0, 0, 0, 0])  # n, sum, h1, hk
    for s, p, o in facts:
        st = _score(s, p, o)
        nb = sum(1 for c in cands[p]
                 if (s, p, c) not in facts and _score(s, p, c) < st)
        rank = 1 + nb
        a = per_pred[p]
        a[0] += 1
        a[1] += rank
        a[2] += rank == 1
        a[3] += rank <= 10
    got = {r.pred: (r.n_test, r.sum_rank, r.hits_at_1, r.hits_at_k,
                    r.n_cands, r.mean_rank_micro6)
           for r in dq.QUERIES["transe_ranks"](spark, SF).collect()}
    expect = {p: (a[0], a[1], a[2], a[3], len(cands[p]),
                  a[1] * 10**6 // a[0]) for p, a in per_pred.items()}
    assert got == expect and got


def test_transe_rank_bounds(spark):
    """Ranks are within [1, n_cands + 1]: sum_rank <= n_test *
    (n_cands + 1) and hits_at_1 <= hits_at_k <= n_test."""
    from ehr_relation_extraction_spark import driver_queries as dq

    rows = dq.QUERIES["transe_ranks"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_cands <= 100
        assert r.n_test <= r.sum_rank <= r.n_test * (r.n_cands + 1)
        assert 0 <= r.hits_at_1 <= r.hits_at_k <= r.n_test
