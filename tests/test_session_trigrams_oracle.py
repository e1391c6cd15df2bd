"""Cross-engine parity + serial ground truth for continuation
batch 66 (operators/events.session_trigrams)."""

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

    ok, msg = compare(QUERIES["session_trigrams"](spark, SF),
                      con.sql(ORACLE["session_trigrams"]).df())
    assert ok, msg


def test_matches_serial_replica(spark):
    """Sessionize + trigram-count replicated serially: sessions from
    the 30-minute gap rule over (ts, event_id) order, trigrams from
    consecutive positions."""
    from ehr_relation_extraction_spark import driver_queries as dq

    ev = sorted(spark.read.parquet(f"{SF}/events.parquet").collect(),
                key=lambda r: (r.user_id, r.ts, r.event_id))
    sessions: dict[tuple, list[str]] = {}
    last_sec: dict[int, int] = {}
    sid: dict[int, int] = {}
    for r in ev:
        sec = int(r.ts.timestamp())
        if r.user_id not in sid:
            sid[r.user_id] = 0
        elif sec - last_sec[r.user_id] > 1800:
            sid[r.user_id] += 1
        last_sec[r.user_id] = sec
        sessions.setdefault((r.user_id, sid[r.user_id]), []) \
            .append(r.event_type)

    occ: dict[tuple, int] = {}
    sess_sup: dict[tuple, set] = {}
    for key, types in sessions.items():
        for i in range(len(types) - 2):
            tri = tuple(types[i:i + 3])
            occ[tri] = occ.get(tri, 0) + 1
            sess_sup.setdefault(tri, set()).add(key)
    tot = len(sessions)
    want = {tri: (occ[tri], len(sess_sup[tri]),
                  len(sess_sup[tri]) * 10**6 // tot) for tri in occ}

    got = {(r.t1, r.t2, r.t3):
           (r.n_occurrences, r.n_sessions, r.support_micro6)
           for r in dq.QUERIES["session_trigrams"](spark, SF).collect()}
    assert got == want
    assert got  # fixture sessions are long enough for trigrams
