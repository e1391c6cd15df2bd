"""Cross-engine parity + serial ground truth for continuation
batch 120 (operators/events.transition_gini)."""

from __future__ import annotations

import datetime as dt

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

    ok, msg = compare(QUERIES["transition_gini"](spark, SF),
                      con.sql(ORACLE["transition_gini"]).df())
    assert ok, msg


def test_matches_serial_transitions(spark):
    """One user, two sessions separated by a >30-min gap: the session
    boundary must NOT create a cross-session transition, the
    deterministic chain must read gini 0, and the mixed chain must
    match the exact formula with the struct-max tie-break."""
    from ehr_relation_extraction_spark.operators.events import (
        transition_gini)

    base = dt.datetime(2024, 1, 1)
    # session 1: a->b, b->a, a->b (a always followed by b, b by a)
    s1 = ["a", "b", "a", "b"]
    # session 2 (2h later): c->a, a->c, c->b  (c successors: a, b tie)
    s2 = ["c", "a", "c", "b"]
    rows = []
    for i, e in enumerate(s1):
        rows.append((i, base + dt.timedelta(minutes=i), 7, e, 0.0, ""))
    for i, e in enumerate(s2):
        rows.append((10 + i, base + dt.timedelta(hours=2, minutes=i),
                     7, e, 0.0, ""))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])
    got = {r.prev_type: r for r in transition_gini(df).collect()}

    # transitions: s1 gives a->b, b->a, a->b; s2 gives c->a, a->c,
    # c->b.  NO b->c (session break).
    a = got["a"]           # successors: b:2, c:1
    assert (a.n_transitions, a.n_successors) == (3, 2)
    assert a.top_next == "b" and a.top_share_micro6 == 666666
    assert a.gini_micro6 == (1000000 * (9 - 4 - 1)) // 9
    b = got["b"]           # deterministic: always -> a
    assert (b.n_transitions, b.gini_micro6, b.top_next) == (1, 0, "a")
    c = got["c"]           # a:1, b:1 tie -> struct max picks 'b'
    assert (c.n_transitions, c.n_successors) == (2, 2)
    assert c.top_next == "b" and c.gini_micro6 == 500000
