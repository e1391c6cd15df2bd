"""Cross-engine parity + brute-force optimality for continuation
batch 68 (operators/triples.timeline_repair)."""

from __future__ import annotations

from itertools import combinations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"
INF = 1 << 62


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["timeline_repair"](spark, SF),
                      con.sql(ORACLE["timeline_repair"]).df())
    assert ok, msg


def _brute_best(ivs):
    """Max weight over ALL non-overlapping subsets (exponential)."""
    n = len(ivs)
    best = 0
    for r in range(1, n + 1):
        for sub in combinations(range(n), r):
            ok = all(ivs[a][1] <= ivs[b][0] or ivs[b][1] <= ivs[a][0]
                     for ai, a in enumerate(sub) for b in sub[ai + 1:])
            if ok:
                best = max(best, sum(ivs[i][2] for i in sub))
    return best


def test_fixture_claims_are_optimal_and_consistent(spark):
    """Every claim's kept set is pairwise non-overlapping, its weight
    matches claim_weight, and claim_weight equals the brute-force
    optimum (claims here have few intervals, so exhaustive search is
    the independent ground truth)."""
    from ehr_relation_extraction_spark import driver_queries as dq

    all_iv: dict[tuple, list] = {}
    for r in dq.q_triple_snapshots(spark, SF).collect():
        e = INF if r.valid_to is None else r.valid_to
        all_iv.setdefault((r.url, r.subj, r.pred), []).append(
            (r.valid_from, e, r.n_snaps))

    kept: dict[tuple, list] = {}
    cw: dict[tuple, int] = {}
    for r in dq.QUERIES["timeline_repair"](spark, SF).collect():
        e = INF if r.valid_to is None else r.valid_to
        k = (r.url, r.subj, r.pred)
        kept.setdefault(k, []).append((r.valid_from, e, r.weight))
        cw[k] = r.claim_weight

    assert set(kept) == set(all_iv)
    n_multi = 0
    for k, ivs in kept.items():
        ivs.sort()
        for (s1, e1, _), (s2, _, _) in zip(ivs, ivs[1:]):
            assert e1 <= s2, k  # non-overlapping
        assert sum(w for _, _, w in ivs) == cw[k], k
        assert cw[k] == _brute_best(all_iv[k]), k
        if len(all_iv[k]) > 1:
            n_multi += 1
    # the fixture exercises real choices (claims with >1 interval)
    assert n_multi > 0


def test_conflicting_claims_pick_heavier_timeline(spark):
    """Synthetic flapping fact: two mutually overlapping runs plus a
    clean successor — the DP keeps the heavy run + the successor and
    drops the light overlapping one."""
    from ehr_relation_extraction_spark.operators.triples import (
        timeline_repair)

    iv = spark.createDataFrame(
        [("u", "s", "p", "heavy", 0, 100, 3),
         ("u", "s", "p", "light", 50, 150, 1),
         ("u", "s", "p", "succ", 100, None, 2)],
        "url string, subj string, pred string, obj string, "
        "valid_from long, valid_to long, n_snaps long")
    got = sorted((r.obj, r.claim_weight)
                 for r in timeline_repair(iv).collect())
    assert got == [("heavy", 5), ("succ", 5)]
