"""Cross-engine parity + serial ground truth for continuation
batch 191 (operators/events.markov_stationary)."""

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

    ok, msg = compare(QUERIES["markov_stationary"](spark, SF),
                      con.sql(ORACLE["markov_stationary"]).df())
    assert ok, msg


def _mk_events(spark, chains):
    """chains: list of event-type sequences, one user per chain,
    events 1 second apart (single session)."""
    t0 = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for uid, chain in enumerate(chains):
        for j, et in enumerate(chain):
            rows.append((eid, t0 + dt.timedelta(seconds=j), uid,
                         et, 0.0, ""))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_absorbing_pair_attracts_mass(spark):
    """Chain a->b, b->a deterministic plus an absorbing-ish type c
    that only feeds itself: after 5 rounds with uniform start, a
    and b keep trading their mass while c keeps its own third plus
    the dangling redistribution — hand-simulated below."""
    from ehr_relation_extraction_spark.operators.events import (
        markov_stationary)

    # a->b, b->a (x many), c->c
    ev = _mk_events(spark, [["a", "b", "a", "b", "a"],
                            ["c", "c", "c", "c"]])
    out = {r.event_type: r for r in markov_stationary(ev).collect()}
    scale = 10 ** 12
    # serial replica
    conf = {("a", "b"): 2, ("b", "a"): 2, ("c", "c"): 3}
    n_i = {"a": 2, "b": 2, "c": 3}
    types = ["a", "b", "c"]
    v = {t: scale // 3 for t in types}
    for _ in range(5):
        flow = {t: 0 for t in types}
        for (i, j), c in conf.items():
            flow[j] += (v[i] * c) // n_i[i]
        dang = sum(v[t] for t in types if t not in n_i)
        v = {t: flow[t] + dang // 3 for t in types}
    for t in types:
        assert out[t].mass_u == v[t], (t, out[t].mass_u, v[t])
    assert out["a"].n_events == 3
    assert out["a"].emp_micro6 == 1000000 * 3 // 9


def test_uniform_cycle_is_uniform(spark):
    """A perfect 3-cycle a->b->c->a keeps the uniform distribution
    fixed: every type retains scale//3 after any number of rounds."""
    from ehr_relation_extraction_spark.operators.events import (
        markov_stationary)

    ev = _mk_events(spark, [["a", "b", "c"] * 4])
    out = {r.event_type: r for r in markov_stationary(ev).collect()}
    # transition counts: a->b 4, b->c 4, c->a 3 — c also dangles? no:
    # c->a occurs 3 times (last c ends the chain), all rows have
    # out-transitions, rows are stochastic per type, so uniform stays
    # fixed up to floor effects; masses must be equal for a and b
    # (identical in/out structure) and all three within floor slack.
    masses = sorted(r.mass_u for r in out.values())
    assert masses[-1] - masses[0] <= masses[-1] // 3
    total = sum(masses)
    assert abs(total - 10 ** 12) <= 10 ** 7


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.operators.events import (
        markov_stationary)

    ev = _mk_events(spark, [["a", "b", "a"], ["b", "c", "b"],
                            ["c", "a", "c", "b"]])
    one = markov_stationary(ev.coalesce(1)).collect()
    many = markov_stationary(ev.repartition(7)).collect()
    key = lambda r: r.event_type
    assert sorted(one, key=key) == sorted(many, key=key)
