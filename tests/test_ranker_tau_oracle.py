"""Cross-engine parity + serial ground truth for continuation
batch 113 (functions/textstats.ranker_tau)."""

from __future__ import annotations

import itertools

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

    ok, msg = compare(QUERIES["ranker_tau"](spark, SF),
                      con.sql(ORACLE["ranker_tau"]).df())
    assert ok, msg


def _serial(items):
    """items: [(item, x, y)] for one group."""
    C = D = tx = ty = tb = 0
    for (i, xi, yi), (j, xj, yj) in itertools.combinations(items, 2):
        sx = (xi > xj) - (xi < xj)
        sy = (yi > yj) - (yi < yj)
        if sx == 0 and sy == 0:
            tb += 1
        elif sx == 0:
            tx += 1
        elif sy == 0:
            ty += 1
        elif sx == sy:
            C += 1
        else:
            D += 1
    n = len(items) * (len(items) - 1) // 2

    def idiv(a, b):  # trunc toward zero, both engines' measured rule
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    tau = idiv(1000000 * (C - D), n)
    gamma = 0 if C + D == 0 else idiv(1000000 * (C - D), C + D)
    return (len(items), n, C, D, tx, ty, tb, tau, gamma)


@pytest.mark.parametrize("xs,ys", [
    ([5, 4, 3, 2, 1], [5, 4, 3, 2, 1]),       # identical order: tau 1
    ([5, 4, 3, 2, 1], [1, 2, 3, 4, 5]),       # reversed: tau -1
    ([5, 5, 3, 3, 1], [1, 2, 3, 4, 5]),       # x ties
    ([9, 7, 7, 2, 2], [3, 3, 8, 8, 1]),       # mixed ties both sides
])
def test_matches_serial_kendall(spark, xs, ys):
    from ehr_relation_extraction_spark.functions.textstats import (
        ranker_tau)

    items = [(f"d{i}", x, y) for i, (x, y) in enumerate(zip(xs, ys))]
    df = spark.createDataFrame(
        [("t",) + it for it in items],
        ["term", "doc_id", "score_micro6", "tf"])
    row = ranker_tau(df).collect()[0]
    assert (row.n_items, row.n_pairs, row.concordant, row.discordant,
            row.ties_x, row.ties_y, row.ties_both, row.tau_a_micro6,
            row.gamma_micro6) == _serial(items)


def test_identity_and_reversal_bounds(spark):
    """tau-a hits exactly +-1e6 at the extremes and pair-count
    accounting is conserved: C + D + all tie classes == n_pairs."""
    from ehr_relation_extraction_spark.functions.textstats import (
        ranker_tau)

    rows = [("a", f"d{i}", i * 10, i) for i in range(8)] \
        + [("b", f"d{i}", i * 10, 100 - i) for i in range(8)]
    df = spark.createDataFrame(
        rows, ["term", "doc_id", "score_micro6", "tf"])
    got = {r.term: r for r in ranker_tau(df).collect()}
    assert got["a"].tau_a_micro6 == 1000000
    assert got["b"].tau_a_micro6 == -1000000
    for r in got.values():
        assert (r.concordant + r.discordant + r.ties_x + r.ties_y
                + r.ties_both) == r.n_pairs
