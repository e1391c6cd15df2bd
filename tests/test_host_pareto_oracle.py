"""Cross-engine parity + serial ground truth for continuation
batch 117 (functions/textstats.host_pareto)."""

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

    ok, msg = compare(QUERIES["host_pareto"](spark, SF),
                      con.sql(ORACLE["host_pareto"]).df())
    assert ok, msg


def test_matches_serial_pareto(spark):
    """Skewed host distribution 64/16/8/8/2/1/1: the minimal prefix
    per threshold must match a serial scan exactly."""
    from ehr_relation_extraction_spark.functions.textstats import (
        host_pareto)

    sizes = {"h0": 64, "h1": 16, "h2": 8, "h3": 8, "h4": 2,
             "h5": 1, "h6": 1}
    rows = [(i, "txt", h) for h, n in sizes.items()
            for i in range(n)]
    rows = [(j, t, h) for j, (_, t, h) in enumerate(rows)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r.threshold_pct: (r.n_hosts, r.covered_docs, r.total_docs,
                             r.share_micro6)
           for r in host_pareto(df).collect()}

    ordered = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(sizes.values())
    for t in (50, 80, 90, 95, 99):
        cum = 0
        for k, (_, n) in enumerate(ordered, start=1):
            cum += n
            if 100 * cum >= t * total:
                assert got[t] == (k, cum, total,
                                  (1000000 * cum) // total)
                break
    # 64 of 100 docs on one host: the 50% threshold needs ONE host
    assert got[50][0] == 1
    # curve is monotone in hosts needed
    ks = [got[t][0] for t in (50, 80, 90, 95, 99)]
    assert ks == sorted(ks)
