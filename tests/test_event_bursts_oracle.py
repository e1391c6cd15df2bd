"""Cross-engine parity + serial ground truth + a known-burst
synthetic stream for continuation batch 63
(operators/events.kleinberg_bursts)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

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

    ok, msg = compare(QUERIES["event_bursts"](spark, SF),
                      con.sql(ORACLE["event_bursts"]).df())
    assert ok, msg


def _serial_bursts(series: dict[str, dict[int, int]]):
    """Textbook 2-state Kleinberg replica over (type -> day -> r)
    with the same smoothing / single-ln floors / tie-breaks."""
    days = sorted({d for s in series.values() for d in s})
    dtot = {d: sum(s.get(d, 0) for s in series.values()) for d in days}
    big_d = sum(dtot.values())
    out = {}
    for et, s in series.items():
        big_r = sum(s.values())
        r1, d2 = big_r + 1, big_d + 2
        if 2 * r1 < d2:
            p1n, p1d = 2 * r1, d2
        else:
            p1n, p1d = r1 + d2, 2 * d2
        lnp0 = math.floor(math.log(r1 / d2) * 10**6)
        ln1p0 = math.floor(math.log((d2 - r1) / d2) * 10**6)
        lnp1 = math.floor(math.log(p1n / p1d) * 10**6)
        ln1p1 = math.floor(math.log((p1d - p1n) / p1d) * 10**6)
        trans = math.floor(math.log(len(days)) * 10**6)
        c0 = c1 = 0
        back = []
        for i, day in enumerate(days):
            r, d = s.get(day, 0), dtot[day]
            e0 = -(r * lnp0 + (d - r) * ln1p0)
            e1 = -(r * lnp1 + (d - r) * ln1p1)
            if i == 0:
                n0, n1, b0, b1 = e0, e1 + trans, -1, -1
            else:
                b0 = 0 if c0 <= c1 else 1
                n0 = e0 + min(c0, c1)
                b1 = 0 if c0 + trans <= c1 else 1
                n1 = e1 + min(c0 + trans, c1)
            back.append((b0, b1))
            c0, c1 = n0, n1
        state, total = (0, c0) if c0 <= c1 else (1, c1)
        states = [0] * len(days)
        for i in range(len(days) - 1, -1, -1):
            states[i] = state
            if i > 0:
                state = back[i][state]
        for i, day in enumerate(days):
            out[(et, day)] = (s.get(day, 0), dtot[day], states[i], total)
    return out


def test_matches_serial_viterbi(spark):
    from ehr_relation_extraction_spark import driver_queries as dq

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    series: dict[str, dict[int, int]] = {}
    for r in ev:
        day = int(r.ts.timestamp()) // 86400
        series.setdefault(r.event_type, {})
        series[r.event_type][day] = series[r.event_type].get(day, 0) + 1
    want = _serial_bursts(series)

    got = {(r.event_type, r.day_idx):
           (r.n_events, r.n_total, r.in_burst, r.total_cost_micro6)
           for r in dq.QUERIES["event_bursts"](spark, SF).collect()}
    assert got == want
    # the sf0.001 stream actually contains a burst day (regression
    # pin: the decode is not the all-zero trivial labeling)
    assert sum(v[2] for v in got.values()) >= 1


def test_synthetic_burst_is_found(spark):
    """A planted 5x-rate window must come out labeled as burst days
    (and quiet days must not)."""
    from ehr_relation_extraction_spark.operators.events import (
        kleinberg_bursts)

    base = datetime(2024, 3, 1)
    rows = []
    eid = 0
    for day in range(20):
        # background: hot 2/day among two 30/day steady types (no
        # type dominates, so nobody's NORMAL share exceeds its capped
        # burst rate); burst: days 8-11 get 40 extra 'hot' events
        n_hot = 2 + (40 if 8 <= day <= 11 else 0)
        for i in range(n_hot):
            rows.append((eid, base + timedelta(days=day, minutes=i),
                         "hot"))
            eid += 1
        for et in ("cold", "filler"):
            for i in range(30):
                rows.append((eid, base + timedelta(days=day,
                                                   minutes=200 + i),
                             et))
                eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    got = {(r.event_type, r.day_idx): r.in_burst
           for r in kleinberg_bursts(ev).collect()}
    day0 = min(d for (_, d) in got)
    for day in range(20):
        expect = 1 if 8 <= day <= 11 else 0
        assert got[("hot", day0 + day)] == expect, day
        assert got[("cold", day0 + day)] == 0, day
        assert got[("filler", day0 + day)] == 0, day
