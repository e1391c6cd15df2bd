"""Cross-engine parity + serial ground truth for continuation
batch 145 (operators/events.type_covariance)."""

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

    ok, msg = compare(QUERIES["type_covariance"](spark, SF),
                      con.sql(ORACLE["type_covariance"]).df())
    assert ok, msg


def _mk_events(spark, day_counts):
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for etype, counts in day_counts.items():
        for day, c in enumerate(counts):
            for k in range(c):
                rows.append((eid, base + dt.timedelta(days=day,
                                                      seconds=k),
                             1, etype, 0.0, ""))
                eid += 1
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])


def test_coupled_and_anticoupled(spark):
    """Series b tracks a exactly, series c mirrors it: cov(a,b) > 0,
    cov(a,c) < 0, cov(b,c) < 0 — every number equals the serial
    n-scaled replay and Cauchy-Schwarz bounds hold."""
    from ehr_relation_extraction_spark.operators.events import (
        type_covariance)

    series = {"a": [1, 5, 2, 8, 3, 9],
              "b": [2, 10, 4, 16, 6, 18],
              "c": [9, 5, 8, 2, 7, 1]}
    df = _mk_events(spark, series)
    got = {(r.etype_a, r.etype_b): r
           for r in type_covariance(df).collect()}

    n = 6
    cent = {k: [n * x - sum(v) for x in v] for k, v in series.items()}
    var = {k: sum(x * x for x in c) for k, c in cent.items()}
    for a in "abc":
        for b in "abc":
            if a < b:
                cov = sum(x * y for x, y in zip(cent[a], cent[b]))
                r = got[(a, b)]
                assert (r.n_days, r.cov_n, r.var_a, r.var_b) == \
                    (n, cov, var[a], var[b])
                assert r.cov_sign == (cov > 0) - (cov < 0)
                assert cov * cov <= var[a] * var[b]   # Cauchy-Schwarz
    assert got[("a", "b")].cov_sign == 1
    assert got[("a", "c")].cov_sign == -1
    # perfectly proportional pair: equality in Cauchy-Schwarz
    ab = got[("a", "b")]
    assert ab.cov_n * ab.cov_n == ab.var_a * ab.var_b
