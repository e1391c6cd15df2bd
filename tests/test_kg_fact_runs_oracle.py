"""Cross-engine parity + semantics for continuation batch 30: the
per-fact SCD2 run/gap/uptime profile."""

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

    ok, msg = compare(QUERIES["fact_runs"](spark, SF),
                      con.sql(ORACLE["fact_runs"]).df())
    assert ok, f"fact_runs: {msg}"


def test_fact_runs_vs_interval_replica(spark):
    """Run counts, uptime, gaps equal a driver-side fold over the
    collected intervals; multi-run (flapping) facts exist."""
    from collections import defaultdict

    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.oracle.sqlgen import (
        FACT_RUNS_HORIZON)

    runs = defaultdict(list)
    for r in dq.q_triple_snapshots(spark, SF).collect():
        runs[(r.url, r.subj, r.pred, r.obj)].append(
            (r.valid_from, r.valid_to))
    expect = {}
    for k, iv in runs.items():
        iv.sort()
        live = sum((t if t is not None else FACT_RUNS_HORIZON) - f
                   for f, t in iv)
        gaps = [iv[i + 1][0] - iv[i][1] for i in range(len(iv) - 1)]
        expect[k] = (len(iv), iv[0][0], live,
                     int(any(t is None for _f, t in iv)),
                     max(gaps) if gaps else 0)
    got = {(r.url, r.subj, r.pred, r.obj):
           (r.n_runs, r.first_from, r.live_s, r.is_current,
            r.max_gap_s)
           for r in dq.QUERIES["fact_runs"](spark, SF).collect()}
    assert got == expect and got
    # the presence-flip device must actually produce flapping facts
    assert any(v[0] > 1 for v in expect.values())
    # open runs close earlier runs: every gap is positive
    for k, iv in runs.items():
        for i in range(len(iv) - 1):
            assert iv[i][1] is not None and iv[i + 1][0] > iv[i][1]


def test_fact_runs_invariants(spark):
    """live_s > 0, first_from is the min valid_from, current facts
    have an open last run, single-run facts have no gap."""
    from ehr_relation_extraction_spark import driver_queries as dq

    rows = dq.QUERIES["fact_runs"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.live_s > 0
        assert r.is_current in (0, 1)
        assert r.max_gap_s >= 0
        if r.n_runs == 1:
            assert r.max_gap_s == 0
