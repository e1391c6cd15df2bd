"""Cross-engine parity + serial ground truth for continuation
batch 186 (functions/textstats.ta_depth_audit)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

DEPTHS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


def _serial(items, k=5, depths=DEPTHS):
    """items: list of (id, s1, s2).  Returns {depth: row} of the TA
    audit computed straight from the definition."""
    r1 = {i[0]: r + 1 for r, i in enumerate(
        sorted(items, key=lambda x: (-x[1], x[0])))}
    r2 = {i[0]: r + 1 for r, i in enumerate(
        sorted(items, key=lambda x: (-x[2], x[0])))}
    s1_at = {r: s for (i, s, _), r in
             ((it, r1[it[0]]) for it in items)}
    s2_at = {r: s for (i, _, s), r in
             ((it, r2[it[0]]) for it in items)}
    out = {}
    n = len(items)
    for d in depths:
        thr = (s1_at[d] + s2_at[d]) if d <= n else None
        seen = sum(1 for it in items if min(r1[it[0]], r2[it[0]]) <= d)
        above = (None if thr is None else
                 sum(1 for it in items
                     if min(r1[it[0]], r2[it[0]]) <= d
                     and it[1] + it[2] >= thr))
        stopped = 1 if (thr is None or (above or 0) >= k) else 0
        out[d] = (thr, seen, above, stopped)
    return out


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["ta_depth_audit"](spark, SF),
                      con.sql(ORACLE["ta_depth_audit"]).df())
    assert ok, msg


def test_matches_serial_definition(spark):
    """30 items with anti-correlated scores (the TA worst-ish case:
    top of list 1 sits at the bottom of list 2), plus ties."""
    from ehr_relation_extraction_spark.functions.textstats import (
        ta_depth_audit)

    items = [(i, 1000 - 7 * i, 100 + 5 * (i % 11)) for i in range(30)]
    truth = _serial(items)
    df = spark.createDataFrame(
        [("g", i, a, b) for i, a, b in items],
        "group string, doc_id long, s1 long, s2 long")
    got = {r.depth: (r.threshold, r.n_seen, r.n_above, r.stopped)
           for r in ta_depth_audit(df).collect()}
    assert got == truth


def test_stop_rule_monotone_and_sound(spark):
    """Once stopped, deeper probes stay stopped; and at any stopped
    depth with a threshold, the true top-k combined scores are all
    >= every unseen item's best possible score (TA soundness)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        ta_depth_audit)

    items = [(i, (i * 37) % 200, (i * 91) % 150) for i in range(60)]
    df = spark.createDataFrame(
        [("g", i, a, b) for i, a, b in items],
        "group string, doc_id long, s1 long, s2 long")
    rows = sorted(ta_depth_audit(df).collect(),
                  key=lambda r: r.depth)
    flags = [r.stopped for r in rows]
    assert flags == sorted(flags)            # monotone 0...0 1...1
    combined = sorted((a + b for _, a, b in items), reverse=True)
    kth = combined[4]
    for r in rows:
        if r.stopped and r.threshold is not None:
            assert kth >= r.threshold or r.n_above >= 5
