"""Cross-engine parity + serial ground truth for continuation
batch 147 (operators/events.zorder_locality)."""

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

    ok, msg = compare(QUERIES["zorder_locality"](spark, SF),
                      con.sql(ORACLE["zorder_locality"]).df())
    assert ok, msg


def _morton(h, d):
    z = 0
    for i in range(4):
        z += ((h >> i) & 1) << (2 * i + 1)
        z += ((d >> i) & 1) << (2 * i)
    return z


def test_engineered_layouts(spark):
    """4 users x 4 days x 4 events = 64 rows, rows_per_file=16: under
    z-order each day-bucket's rows sit in FEWER distinct files than
    under the user-major sort, and every per-bucket stat matches a
    serial numpy-free replay of the exact packing arithmetic."""
    from ehr_relation_extraction_spark.operators.events import (
        zorder_locality)

    base = dt.datetime(2024, 1, 1)  # epoch day 19723
    rows = []
    eid = 0
    for u in range(4):
        for day in range(4):
            for _ in range(4):
                rows.append((eid, base + dt.timedelta(days=day),
                             u, "x", 0.0, ""))
                eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])

    # serial replay
    recs = [(e, u % 16, (19723 + d_) % 16)
            for (e, _, u, *_), d_ in zip(
                rows, [d for _ in range(4) for d in range(4)
                       for _ in range(4)])]
    zs = sorted(recs, key=lambda r: (_morton(r[1], r[2]), r[0]))
    lex = sorted(recs, key=lambda r: (r[1], r[2], r[0]))
    zf = {r[0]: i // 16 for i, r in enumerate(zs)}
    lf = {r[0]: i // 16 for i, r in enumerate(lex)}
    want = {}
    for db in sorted({r[2] for r in recs}):
        sel = [r[0] for r in recs if r[2] == db]
        zfs = {zf[e] for e in sel}
        lfs = {lf[e] for e in sel}
        want[db] = (len(sel), len(zfs), len(lfs),
                    max(zfs) - min(zfs) + 1, max(lfs) - min(lfs) + 1)

    got = {r.day_bucket: (r.n_events, r.z_files, r.lex_files,
                          r.z_span, r.lex_span)
           for r in zorder_locality(df, rows_per_file=16).collect()}
    assert got == want
    # the point of the layout: day-scoped scans touch fewer files
    # under z-order than under the user-major sort
    assert all(g[1] <= g[2] for g in got.values())
    assert any(g[1] < g[2] for g in got.values())
