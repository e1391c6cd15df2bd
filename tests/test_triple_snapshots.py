"""SCD2 triple validity intervals (operators/triples.triple_intervals):
hand-checked islands semantics + cross-engine oracle parity for the
registered triple_snapshots query."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_triple_intervals_islands(spark):
    """A triple observed at crawls {0, 1, 3} of a 4-crawl url yields
    TWO rows: [ts0, ts2) closed by the crawl that dropped it, and
    [ts3, NULL) current — disappear-and-return is two SCD2 versions.
    A triple live at every crawl yields one open row; ts arithmetic
    follows the per-url schedule."""
    from ehr_relation_extraction_spark.operators.triples import (
        triple_intervals)

    obs = spark.createDataFrame(
        [("u", g, "s", "p", "o") for g in (0, 1, 3)]
        + [("u", g, "s", "p", "o2") for g in (0, 1, 2, 3)]
        + [("v", 2, "x", "p", "y")],
        "url string, snap_id int, subj string, pred string, obj string")
    snaps = spark.createDataFrame(
        [("u", g, 100 + 10 * g) for g in range(4)]
        + [("v", g, 500 + g) for g in range(3)],
        "url string, snap_id int, snap_ts long")
    got = {(r.url, r.subj, r.obj, r.valid_from, r.valid_to, r.n_snaps)
           for r in triple_intervals(obs, snaps).collect()}
    assert got == {
        ("u", "s", "o", 100, 120, 2),     # run {0,1} closed by crawl 2
        ("u", "s", "o", 130, None, 1),    # returned at 3, current
        ("u", "s", "o2", 100, None, 4),   # live throughout
        ("v", "x", "y", 502, None, 1),    # current at v's last crawl
    }


def test_triple_snapshots_oracle(spark, con):
    from ehr_relation_extraction_spark.driver_queries import (
        ORACLE, QUERIES)

    ok, msg = compare(QUERIES["triple_snapshots"](spark, SF),
                      con.sql(ORACLE["triple_snapshots"]).df())
    assert ok, msg


def test_triple_snapshots_partition_invariance(spark):
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    a = QUERIES["triple_snapshots"](spark, SF)
    rows = sorted(map(tuple, a.collect()))
    b = sorted(map(tuple, a.repartition(13, "subj").collect()))
    assert rows == b
