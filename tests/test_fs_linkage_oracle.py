"""Cross-engine parity + serial ground truth for continuation batch
57: Fellegi-Sunter probabilistic record linkage
(operators/linking.fs_linkage_weights / fs_linkage_scores)."""

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


@pytest.mark.parametrize("key", ["fs_weights", "fs_scores"])
def test_oracle_parity(spark, con, key):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[key](spark, SF), con.sql(ORACLE[key]).df())
    assert ok, msg


def test_matches_serial_fs(spark):
    """Weights and scores replicated serially in Python from the
    labeled pairs — the textbook Fellegi-Sunter estimator, proving
    the distributed aggregate computes the right statistic (not an
    artifact both engines share)."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.operators.linking import (
        FS_FEATURES, fs_labeled_pairs, gazetteer_df)

    fr = dq._frames(spark, SF)
    lp = fs_labeled_pairs(fr.mentions, gazetteer_df(spark)).collect()
    assert lp, "fixture should generate candidate pairs"
    nm = sum(r.label for r in lp)
    nu = len(lp) - nm
    assert nm > 0 and nu > 0, \
        "fixture should have both matches and non-matches"

    weights = {}
    for f in FS_FEATURES:
        am = sum(r[f] for r in lp if r.label == 1)
        au = sum(r[f] for r in lp if r.label == 0)
        wa = math.floor(math.log(
            ((am + 1) * (nu + 2)) / ((nm + 2) * (au + 1))) * 1_000_000)
        wd = math.floor(math.log(
            ((nm + 1 - am) * (nu + 2))
            / ((nm + 2) * (nu + 1 - au))) * 1_000_000)
        weights[f] = (nm, nu, am, au, wa, wd)

    got_w = {r.feature: (r.n_match, r.n_unmatch, r.n_agree_match,
                         r.n_agree_unmatch, r.w_agree_micro6,
                         r.w_disagree_micro6)
             for r in dq.QUERIES["fs_weights"](spark, SF).collect()}
    assert got_w == weights

    # agreement on a discriminative feature must carry positive weight
    assert any(w[4] > 0 for w in weights.values())

    exp_scores = {}
    for r in lp:
        s = sum(weights[f][4] if r[f] == 1 else weights[f][5]
                for f in FS_FEATURES)
        exp_scores[(r.host, r.ent_type, r.surf_a, r.surf_b,
                    r.pos_gap)] = (r.label, s)
    got_s = dq.QUERIES["fs_scores"](spark, SF).collect()
    assert len(got_s) == len(lp)
    for r in got_s:
        lab, s = exp_scores[(r.host, r.ent_type, r.surf_a, r.surf_b,
                             r.pos_gap)]
        assert (r.label, r.score_micro6) == (lab, s)

    # the score separates: mean match score above mean non-match score
    ms = [s for lab, s in exp_scores.values() if lab == 1]
    us = [s for lab, s in exp_scores.values() if lab == 0]
    assert sum(ms) / len(ms) > sum(us) / len(us)
