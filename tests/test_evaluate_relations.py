"""Hand-computed checks for the relation-span eval (E2 arg-span match +
E3 pare-down, Track2-evaluate-ver4.py:86-93/:322-333) — the driver
contract exact-checks it end-to-end; these pin the algebra on a case
small enough to verify by eye."""

from __future__ import annotations

from ehr_relation_extraction_spark.operators.evaluate import prf_relations

COLS = ("url string, rel_type string, hub_start int, hub_end int, "
        "attr_start int, attr_end int")


def test_lenient_overlap_scores_and_pares_down(spark):
    # one gold relation; two system relations overlap BOTH its args ->
    # lenient matches both, pare-down keeps one: tp=1, fp=1, fn=0
    gold = spark.createDataFrame([("u", "Money-Topic", 10, 15, 30, 35)], COLS)
    sys_ = spark.createDataFrame(
        [("u", "Money-Topic", 11, 14, 31, 34),
         ("u", "Money-Topic", 12, 16, 29, 33)], COLS)
    row = prf_relations(gold, sys_, strict=False).first()
    assert (row["tp"], row["n_gold"], row["n_pred"]) == (1, 1, 2)
    assert (row["fp"], row["fn"]) == (1, 0)
    assert row["r_micro6"] == 1_000_000 and row["p_micro6"] == 500_000


def test_strict_requires_exact_spans(spark):
    gold = spark.createDataFrame([("u", "Money-Topic", 10, 15, 30, 35)], COLS)
    drifted = spark.createDataFrame([("u", "Money-Topic", 11, 14, 31, 34)], COLS)
    assert prf_relations(gold, drifted, strict=True).first()["tp"] == 0
    exact = spark.createDataFrame([("u", "Money-Topic", 10, 15, 30, 35)], COLS)
    assert prf_relations(gold, exact, strict=True).first()["tp"] == 1


def test_one_arg_overlap_is_not_a_match(spark):
    # hub overlaps but attr disjoint -> Relation.equals requires BOTH
    gold = spark.createDataFrame([("u", "Money-Topic", 10, 15, 30, 35)], COLS)
    half = spark.createDataFrame([("u", "Money-Topic", 11, 14, 50, 55)], COLS)
    row = prf_relations(gold, half, strict=False).first()
    assert (row["tp"], row["fp"], row["fn"]) == (0, 1, 1)


def test_rel_type_must_match(spark):
    gold = spark.createDataFrame([("u", "Money-Topic", 10, 15, 30, 35)], COLS)
    other = spark.createDataFrame([("u", "Event-Topic", 10, 15, 30, 35)], COLS)
    out = {r["rel_type"]: r for r in prf_relations(gold, other).collect()}
    assert out["Money-Topic"]["tp"] == 0 and out["Money-Topic"]["fn"] == 1
    assert out["Event-Topic"]["fp"] == 1
