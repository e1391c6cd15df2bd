"""Cross-engine parity + serial ground truth for continuation
batch 208 (functions/textstats.stump_split)."""

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

    ok, msg = compare(QUERIES["stump_split"](spark, SF),
                      con.sql(ORACLE["stump_split"]).df())
    assert ok, msg


def test_separable_threshold_found(spark):
    """Docs where the English label is perfectly separated by
    length at 50 chars: the n_chars stump must find a threshold in
    [short-max, 49] with cost 0 and gain == root impurity."""
    from ehr_relation_extraction_spark.functions.textstats import (
        stump_split)

    rows = []
    for i in range(10):
        rows.append((i, "x" * (30 + i), "de", "s", 1))       # short
    for i in range(10, 22):
        rows.append((i, "y" * (50 + i), "en", "s", 1))       # long
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")
    out = {r.feature: r for r in stump_split(df).collect()}
    r = out["n_chars"]
    assert 39 <= r.best_threshold < 60
    assert r.cost_micro6 == 0
    assert r.pos_left == 0 and r.pos_right == 12
    assert r.gain_micro6 == r.root_micro6
    # root gini of 12/22 positives: 1e6*(22^2-12^2-10^2)//22
    assert r.root_micro6 == 1000000 * (22 * 22 - 144 - 100) // 22


def test_serial_replica_on_mixed_data(spark):
    """Brute-force the n_chars stump in plain Python and compare."""
    from ehr_relation_extraction_spark.functions.textstats import (
        stump_split)

    lens = [11, 25, 25, 40, 7, 33, 25, 18, 40, 52, 11, 60]
    labels = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 0, 1]
    rows = [(i, "z" * L, "en" if y else "fr", "s", 1)
            for i, (L, y) in enumerate(zip(lens, labels))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")
    r = {x.feature: x for x in stump_split(df).collect()}["n_chars"]

    pts = sorted(zip(lens, labels))
    vals = sorted(set(lens))[:-1]
    best = None
    for t in vals:
        nl = sum(1 for L, _ in pts if L <= t)
        pl = sum(y for L, y in pts if L <= t)
        nr = len(pts) - nl
        pr = sum(labels) - pl
        cost = (1000000 * (nl * nl - pl * pl
                           - (nl - pl) ** 2) // nl
                + 1000000 * (nr * nr - pr * pr
                             - (nr - pr) ** 2) // nr)
        if best is None or (cost, t) < best:
            best = (cost, t)
    assert (r.cost_micro6, r.best_threshold) == best


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        stump_split)

    rows = [(i, "w " * (i % 9) + "x" * (i % 17),
             "en" if i % 3 else "de", "s", 1) for i in range(50)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")
    one = stump_split(df.coalesce(1)).collect()
    many = stump_split(df.repartition(7)).collect()
    key = lambda r: r.feature
    assert sorted(one, key=key) == sorted(many, key=key)
