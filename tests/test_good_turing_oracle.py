"""Cross-engine parity + serial ground truth for continuation
batch 114 (functions/textstats.good_turing)."""

from __future__ import annotations

from collections import Counter

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

    ok, msg = compare(QUERIES["good_turing"](spark, SF),
                      con.sql(ORACLE["good_turing"]).df())
    assert ok, msg


def _grams(words, n=3):
    return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]


def test_matches_serial_good_turing(spark):
    """Hand-built corpus with engineered trigram counts incl. a
    frequency gap (so c*=0 rows appear) — the table must equal a
    Counter replay over a serial n-gram scan and classic GT
    identities must hold."""
    from ehr_relation_extraction_spark.functions.textstats import (
        good_turing)

    # repeated block engineers multi-count trigrams; tail singles
    words = ("a b c d " * 3 + "p q r s t u v w").split()
    df = spark.createDataFrame([(0, " ".join(words))],
                               ["doc_id", "text"])
    got = {r.c: (r.n_types, r.mass, r.c_star_micro6)
           for r in good_turing(df).collect()}

    cnt = Counter(Counter(_grams(words)).values())  # c -> N_c
    for c, n in cnt.items():
        nxt = cnt.get(c + 1, 0)
        cstar = 0 if nxt == 0 else (1000000 * (c + 1) * nxt) // n
        assert got[c] == (n, c * n, cstar)
    assert set(got) == set(cnt)
    # every count present in the corpus appears, none fabricated;
    # the highest observed count has no successor -> c* = 0 there
    assert got[max(cnt)][2] == 0


def test_unseen_mass_and_short_docs(spark):
    """P0 = N_1 / N over trigram mass, and docs shorter than n
    tokens contribute nothing (the sequence(1,0)-descends guard)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        good_turing)

    rows_in = [(0, "a b c d e"), (1, "a b c d e"), (2, "x y"),
               (3, ""), (4, "solo")]
    df = spark.createDataFrame(rows_in, ["doc_id", "text"])
    rows = {r.c: r for r in good_turing(df).collect()}
    # each 5-token doc has 3 trigrams, duplicated across the 2 docs:
    # 3 types each with count 2; the short docs add nothing
    assert set(rows) == {2}
    assert rows[2].n_types == 3 and rows[2].mass == 6
