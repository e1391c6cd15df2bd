"""Cross-engine parity + serial ground truth for continuation
batch 139 (operators/events.q1_pricing)."""

from __future__ import annotations

import math

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

    ok, msg = compare(QUERIES["q1_pricing"](spark, SF),
                      con.sql(ORACLE["q1_pricing"]).df())
    assert ok, msg


def test_matches_serial_cents(spark):
    """Hand rows incl. awkward float cents (19.99, 0.07 discount):
    every emitted integer equals the serial cent-quantized replay,
    and the result is invariant to repartitioning (the property
    float SUM cannot give)."""
    from ehr_relation_extraction_spark.operators.events import (
        q1_pricing)

    rows = [
        ("A", "F", 17.0, 19.99, 0.07, 0.02),
        ("A", "F", 3.0, 1000.01, 0.10, 0.08),
        ("N", "O", 25.0, 0.03, 0.00, 0.00),
    ]
    cols = ["l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax"]
    df = spark.createDataFrame(rows, cols)
    got = {(r.l_returnflag, r.l_linestatus): r
           for r in q1_pricing(df).collect()}

    agg = {}
    for rf, ls, q, p, d, t in rows:
        c = math.floor(p * 100)
        dc = math.floor(d * 100)
        tc = math.floor(t * 100)
        a = agg.setdefault((rf, ls), [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += math.floor(q)
        a[2] += c
        a[3] += c * (100 - dc)
        a[4] += c * (100 - dc) * (100 + tc)
    for k, (n, sq, sc, sd, sg) in agg.items():
        r = got[k]
        assert (r.n_rows, r.sum_qty, r.sum_base_cents,
                r.sum_disc_x10000, r.sum_charge_x1000000) == \
            (n, sq, sc, sd, sg)
        assert r.avg_qty_micro6 == (1000000 * sq) // n
        assert r.avg_price_cents == sc // n

    got2 = {(r.l_returnflag, r.l_linestatus): tuple(r)
            for r in q1_pricing(df.repartition(7)).collect()}
    assert got2 == {k: tuple(v) for k, v in got.items()}
