"""Cross-engine parity + serial ground truth for continuation
batch 142 (operators/evaluate.ner_confusion)."""

from __future__ import annotations

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

    ok, msg = compare(QUERIES["ner_confusion"](spark, SF),
                      con.sql(ORACLE["ner_confusion"]).df())
    assert ok, msg


def test_known_confusion(spark):
    """Hand spans: agreement, a type swap, an a-only and a b-only
    span — every cell exact, and total mass reconciles with both
    input sizes."""
    from ehr_relation_extraction_spark.operators.evaluate import (
        ner_confusion)

    a = spark.createDataFrame(
        [(0, 0, 5, "Org"), (0, 10, 15, "Org"), (1, 0, 4, "Loc"),
         (1, 8, 12, "Date")],
        ["doc_id", "start", "end", "ent_type"])
    b = spark.createDataFrame(
        [(0, 0, 5, "Org"), (0, 10, 15, "Loc"), (1, 0, 4, "Loc"),
         (2, 0, 3, "Money")],
        ["doc_id", "start", "end", "ent_type"])
    got = {(r.type_a, r.type_b): r.n
           for r in ner_confusion(a, b).collect()}
    assert got == {
        ("Org", "Org"): 1,       # exact agreement
        ("Org", "Loc"): 1,       # type swap on the same span
        ("Loc", "Loc"): 1,
        ("Date", "<none>"): 1,   # a-only span
        ("<none>", "Money"): 1,  # b-only span
    }
    # mass conservation: each side's spans all appear exactly once
    a_mass = sum(n for (ta, _), n in got.items() if ta != "<none>")
    b_mass = sum(n for (_, tb), n in got.items() if tb != "<none>")
    assert (a_mass, b_mass) == (4, 4)
