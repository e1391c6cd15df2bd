"""Cross-engine parity + serial ground truth for continuation
batch 189 (operators/events.wilcoxon_signed)."""

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

    ok, msg = compare(QUERIES["wilcoxon_signed"](spark, SF),
                      con.sql(ORACLE["wilcoxon_signed"]).df())
    assert ok, msg


def _mk_events(spark, per_user):
    """per_user: dict user_id -> (n_early, n_late).  The window is
    pinned to [day 0, day 10]; early events land on day 1, late on
    day 9, plus two anchor events (user 0) at the exact bounds."""
    t0 = dt.datetime(2024, 3, 1)
    rows = [(0, t0, 0, "x", 0.0, ""),
            (1, t0 + dt.timedelta(days=10), 0, "x", 0.0, "")]
    eid = 2
    for uid, (ne, nl) in per_user.items():
        for j in range(ne):
            rows.append((eid, t0 + dt.timedelta(days=1, seconds=j),
                         uid, "x", 0.0, ""))
            eid += 1
        for j in range(nl):
            rows.append((eid, t0 + dt.timedelta(days=9, seconds=j),
                         uid, "x", 0.0, ""))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_hand_checked_ties(spark):
    """User deltas (ignoring the +0 anchor user): +1, +1, -1 ->
    all |d| = 1 tie at doubled mid-rank 4, W2+ = 8, n = 3 used +
    1 zero (anchor user 0 has one early + one late event), tie
    term 24, z2 = 3*(16-12)^2/(168-24) = 1/3."""
    from ehr_relation_extraction_spark.operators.events import (
        wilcoxon_signed)

    ev = _mk_events(spark, {1: (0, 1), 2: (1, 2), 3: (2, 1)})
    r = wilcoxon_signed(ev).collect()[0]
    assert r.n_pairs == 4 and r.n_zero == 1 and r.n_used == 3
    assert r.w2_plus == 8
    assert r.tie_cubes == 24
    assert r.shift_sign == 1
    assert r.z2_micro6 == 333333


def test_balanced_shift_is_zero(spark):
    """Deltas +1, +2, -3 (distinct |d|): W2+ = 2 + 4 = 6 equals
    n(n+1)/2 = 6, so z2 = 0 and the sign is 0."""
    from ehr_relation_extraction_spark.operators.events import (
        wilcoxon_signed)

    ev = _mk_events(spark, {1: (0, 1), 2: (1, 3), 3: (4, 1)})
    r = wilcoxon_signed(ev).collect()[0]
    assert r.n_used == 3 and r.w2_plus == 6
    assert r.tie_cubes == 0
    assert r.shift_sign == 0 and r.z2_micro6 == 0


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.operators.events import (
        wilcoxon_signed)

    ev = _mk_events(spark, {1: (2, 5), 2: (3, 1), 3: (1, 1),
                            4: (0, 4), 5: (6, 2)})
    one = wilcoxon_signed(ev.coalesce(1)).collect()
    many = wilcoxon_signed(ev.repartition(7)).collect()
    assert one == many
