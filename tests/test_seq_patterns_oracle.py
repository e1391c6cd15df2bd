"""Cross-engine parity + serial ground truth for continuation
batch 180 (operators/events.seq_patterns)."""

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

    ok, msg = compare(QUERIES["seq_patterns"](spark, SF),
                      con.sql(ORACLE["seq_patterns"]).df())
    assert ok, msg


def test_engineered_gapped_support(spark):
    """One user, one session with types [a, b, a, c]:
    pairs (i<j): (a,b) 1, (a,a) 1, (a,c) 2, (b,a) 1, (b,c) 1.
    Note (a,c) counts TWO pairs (both a's precede c) but only ONE
    supporting session — n_pairs vs n_sessions diverge, which is the
    gapped semantics session_trigrams cannot express.  A second
    single-event session changes only the support denominator."""
    from ehr_relation_extraction_spark.operators.events import (
        seq_patterns)

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0 + dt.timedelta(seconds=i), 10, ty, 0.0, "")
        for i, ty in enumerate(["a", "b", "a", "c"])
    ] + [(9, t0 + dt.timedelta(hours=5), 20, "b", 0.0, "")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {(r.t1, r.t2): (r.n_pairs, r.n_sessions, r.support_micro6)
           for r in seq_patterns(ev).collect()}
    assert got == {
        ("a", "b"): (1, 1, 500000),
        ("a", "a"): (1, 1, 500000),
        ("a", "c"): (2, 1, 500000),
        ("b", "a"): (1, 1, 500000),
        ("b", "c"): (1, 1, 500000),
    }


def test_gap_splits_sessions(spark):
    """a ... (31 min gap) ... b: no session supports (a -> b)."""
    from ehr_relation_extraction_spark.operators.events import (
        seq_patterns)

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [(1, t0, 10, "a", 0.0, ""),
         (2, t0 + dt.timedelta(minutes=31), 10, "b", 0.0, "")],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")
    assert seq_patterns(ev).count() == 0
