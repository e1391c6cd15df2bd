"""Cross-engine parity + semantic invariants for continuation batch
35: RDFS-style domain/range type inference
(operators/linking.rdfs_type_inference)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.fixture(scope="module")
def rows(spark):
    from ehr_relation_extraction_spark import driver_queries as dq

    return dq.QUERIES["type_inference"](spark, SF).collect()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["type_inference"](spark, SF),
                      con.sql(ORACLE["type_inference"]).df())
    assert ok, msg


def test_sources_and_flags(rows):
    """declared rows are never is_new; inferred rows are flagged
    is_new exactly when their (entity, type) pair is undeclared."""
    assert rows
    declared = {(r.canonical_id, r.ent_type)
                for r in rows if r.source == "declared"}
    assert declared, "declared types must be non-empty"
    for r in rows:
        assert r.source in ("declared", "domain", "range"), r
        if r.source == "declared":
            assert r.is_new == 0, r
        else:
            assert r.is_new == (0 if (r.canonical_id, r.ent_type)
                                in declared else 1), r


def test_axiom_election_majority(spark):
    """Each elected domain type really is the at-least-half plurality
    subject type for its predicate (recomputed in plain Python)."""
    from ehr_relation_extraction_spark import driver_queries as dq

    fr, linked, _ = dq._linked(spark, SF)
    j = fr.triples.join(
        linked.selectExpr("url", "ent_id AS subj_id", "canonical_id",
                          "ent_type AS st"), ["url", "subj_id"])
    per: dict[str, dict[str, int]] = {}
    for r in j.select("pred", "st").collect():
        per.setdefault(r.pred, {}).setdefault(r.st, 0)
        per[r.pred][r.st] += 1
    elected = {}
    for pred, cnt in per.items():
        tot = sum(cnt.values())
        t, n = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if 2 * n >= tot:
            elected[pred] = t

    got_dom = {(r.canonical_id, r.ent_type)
               for r in dq.QUERIES["type_inference"](spark, SF).collect()
               if r.source == "domain"}
    expect = {(r.canonical_id, elected[r.pred])
              for r in j.select("pred", "canonical_id").collect()
              if r.pred in elected}
    assert got_dom == expect
