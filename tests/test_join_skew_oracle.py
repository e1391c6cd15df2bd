"""Cross-engine parity + serial ground truth for continuation
batch 87 (functions/textstats.join_skew_profile)."""

from __future__ import annotations

from collections import Counter

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

    ok, msg = compare(QUERIES["join_skew"](spark, SF),
                      con.sql(ORACLE["join_skew"]).df())
    assert ok, msg


def test_profile_matches_serial_counter(spark):
    """sum_sq is the EXACT self-equi-join row count and max/avg the
    exact straggler ratio — verified against a plain Counter on two
    families with deliberately different skew."""
    from ehr_relation_extraction_spark.functions.textstats import (
        join_skew_profile)

    flat = ["k%d" % (i % 7) for i in range(21)]          # uniform 3x7
    hot = ["hot"] * 50 + ["c%d" % i for i in range(10)]  # one hot key
    frames = {
        "flat": spark.createDataFrame([(k,) for k in flat], ["key"]),
        "hot": spark.createDataFrame([(k,) for k in hot], ["key"]),
    }
    got = {r.family: r for r in join_skew_profile(frames).collect()}

    for fam, keys in (("flat", flat), ("hot", hot)):
        c = Counter(keys)
        r = got[fam]
        assert r.n_keys == len(c)
        assert r.n_rows == len(keys)
        assert r.max_rows == max(c.values())
        assert r.sum_sq == sum(v * v for v in c.values())
        assert r.top1_share_micro6 == max(c.values()) * 10**6 // len(keys)
        assert (r.max_over_avg_micro6
                == max(c.values()) * len(c) * 10**6 // len(keys))

    # the alarm fires on the hot family only
    assert got["flat"].max_over_avg_micro6 == 10**6            # exactly avg
    assert got["hot"].max_over_avg_micro6 > 9 * 10**6          # 9x+ avg
