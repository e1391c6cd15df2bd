"""Cross-engine parity + serial ground truth for continuation
batch 60: theta-sketch set operations between host entity sets
(functions/sketches.theta_set_ops)."""

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


def _h60(val: str) -> int:
    return int(hashlib.md5(f"kmv:{val}".encode()).hexdigest()[:15], 16)


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["theta_host_sets"](spark, SF),
                      con.sql(ORACLE["theta_host_sets"]).df())
    assert ok, msg


def _serial_theta(ents: dict[str, set[str]], k: int, domain: int,
                  top_n: int):
    """Textbook theta set-ops replica with hashlib.md5."""
    sk, theta, est = {}, {}, {}
    for g, es in ents.items():
        hs = sorted({_h60(e) for e in es})[:k]
        sk[g] = hs
        theta[g] = hs[-1] if len(hs) == k else domain
        est[g] = (len(hs) if len(hs) < k
                  else (k - 1) * domain // hs[-1])
    top = sorted(ents, key=lambda g: (-est[g], g))[:top_n]
    out = {}
    for a in sorted(top):
        for b in sorted(top):
            if a >= b:
                continue
            t = min(theta[a], theta[b])
            sa = {h for h in sk[a] if h < t}
            sb = {h for h in sk[b] if h < t}
            n_i, n_u = len(sa & sb), len(sa | sb)
            ei = n_i * (domain // t) + (n_i * (domain % t)) // t
            eu = n_u * (domain // t) + (n_u * (domain % t)) // t
            xi = len(ents[a] & ents[b])
            xu = len(ents[a] | ents[b])
            out[(a, b)] = (t, n_i, n_u, ei, eu,
                           ei * 10**6 // eu if eu > 0 else 0, xi, xu)
    return out


def test_matches_serial_theta(spark):
    """The full pair table (thetas, retained counts, split-division
    estimates, exact audits) equals a serial hashlib replica — proves
    the sketch-join pipeline computes the textbook theta algebra."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.functions.sketches import (
        KMV_K, THETA_DOMAIN)
    from pyspark.sql import functions as F

    _, linked, _ = dq._linked(spark, SF)
    rows = (linked.select(
        F.regexp_extract("url", r"^https?://([^/]*)", 1).alias("host"),
        "canonical_id").collect())
    ents: dict[str, set[str]] = {}
    for r in rows:
        if r.canonical_id is not None:
            ents.setdefault(r.host, set()).add(r.canonical_id)
    want = _serial_theta(ents, KMV_K, THETA_DOMAIN, 12)

    got = {(r.host_a, r.host_b):
           (r.theta, r.n_inter_ret, r.n_union_ret, r.est_inter,
            r.est_union, r.est_jaccard_micro6, r.exact_inter,
            r.exact_union)
           for r in dq.QUERIES["theta_host_sets"](spark, SF).collect()}
    assert got == want

    # the top hosts must actually exercise the saturated (sampling)
    # regime at this SF
    assert any(v[0] < THETA_DOMAIN for v in got.values())


def test_exact_regime_on_small_groups(spark):
    """When BOTH sketches are unsaturated, theta is the full domain
    and every estimate equals the exact audit column — the sketch IS
    the set.  Exercised on a synthetic frame (the corpus top hosts
    are all saturated)."""
    from ehr_relation_extraction_spark.functions.sketches import (
        KMV_K, THETA_DOMAIN, theta_set_ops)

    rows = ([("a", f"e{i}") for i in range(3)]
            + [("b", f"e{i}") for i in range(2, 6)]
            + [("c", f"x{i}") for i in range(40)])
    df = spark.createDataFrame(rows, ["grp", "val"])
    got = {(r.grp_a, r.grp_b): r
           for r in theta_set_ops(df, "grp", "val", KMV_K, 12)
           .collect()}
    ab = got[("a", "b")]
    assert ab.theta == THETA_DOMAIN
    assert (ab.est_inter, ab.est_union) == (1, 6)
    assert (ab.exact_inter, ab.exact_union) == (1, 6)
    assert ab.est_jaccard_micro6 == 10**6 // 6
    # pairs touching the saturated group fall back to sampling
    assert got[("a", "c")].theta < THETA_DOMAIN
    assert got[("a", "c")].exact_inter == 0
