"""Filtered KG negative sampling (operators/triples.
kg_negative_samples): cross-engine parity + the filtered-sampling
invariants (no true triple, no self-corruption, bucket discipline,
determinism)."""

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


@pytest.fixture(scope="module")
def sampled(spark):
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    return QUERIES["kg_neg_samples"](spark, SF).collect()


def test_neg_samples_oracle(spark, con):
    from ehr_relation_extraction_spark.driver_queries import (
        ORACLE, QUERIES)

    ok, msg = compare(QUERIES["kg_neg_samples"](spark, SF),
                      con.sql(ORACLE["kg_neg_samples"]).df())
    assert ok, msg


def test_neg_samples_invariants(spark, sampled):
    from ehr_relation_extraction_spark.driver_queries import _frames

    truth = {(r.subj, r.pred, r.obj) for r in
             _frames(spark, SF).triples
             .select("subj", "pred", "obj").dropDuplicates().collect()}
    assert len(sampled) > 0
    for r in sampled:
        # filtered: the corrupted triple is never a true corpus triple
        assert (r.subj, r.pred, r.neg_obj) not in truth
        assert r.neg_obj != r.obj
        # bucket discipline: the draw honored the md5 target bucket
        tgt = int(hashlib.md5(
            f"{r.neg_j}|{r.subj}|{r.pred}|{r.obj}".encode())
            .hexdigest()[0], 16)
        got = int(hashlib.md5(r.neg_obj.encode()).hexdigest()[0], 16)
        assert got == tgt


def test_neg_samples_deterministic(spark, sampled):
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    again = QUERIES["kg_neg_samples"](spark, SF)
    a = sorted(map(tuple, sampled))
    b = sorted(map(tuple, again.repartition(13, "subj").collect()))
    assert a == b
