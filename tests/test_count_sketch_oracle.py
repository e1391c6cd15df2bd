"""Cross-engine parity + serial ground truth for continuation
batch 127 (functions/sketches.count_sketch_estimates)."""

from __future__ import annotations

import hashlib
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

    ok, msg = compare(QUERIES["count_sketch"](spark, SF),
                      con.sql(ORACLE["count_sketch"]).df())
    assert ok, msg


def _serial_cs(counts, depth=5, width=256):
    cells = {}
    keyed = {}
    for item, c in counts.items():
        for r in range(depth):
            h = hashlib.md5(f"{r}:{item}".encode()).hexdigest()
            col = int(h[:2], 16)
            sign = 1 - 2 * (int(h[2], 16) % 2)
            cells[(r, col)] = cells.get((r, col), 0) + sign * c
            keyed[(item, r)] = (col, sign)
    out = {}
    for item, c in counts.items():
        ests = sorted(keyed[(item, r)][1]
                      * cells[(r, keyed[(item, r)][0])]
                      for r in range(depth))
        est = ests[2]
        out[item] = (c, est, abs(est - c))
    return out


def test_matches_serial_count_sketch(spark):
    """Hand corpus with a heavy hitter and a tail: the Spark audit
    must equal a dict replay of the same md5 column/sign/median
    arithmetic, and the heavy hitter's estimate must be close."""
    from ehr_relation_extraction_spark.functions.sketches import (
        count_sketch_estimates)

    words = ["hh"] * 200 + [f"t{i}" for i in range(40)] * 2
    df = spark.createDataFrame(
        [(0, " ".join(words))], ["doc_id", "text"])
    got = {r.item: (r.true_cnt, r.est_cnt, r.abs_err)
           for r in count_sketch_estimates(df).collect()}
    want = _serial_cs(Counter(words))
    assert got == want
    # median-of-5 keeps the heavy hitter within the tail mass
    assert got["hh"][2] <= 8


def test_signed_estimates_are_two_sided(spark):
    """The unbiasedness signature: under forced collisions (16
    columns, 60 items) some estimates land BELOW truth — count-min
    can never do this.  At the driver geometry (256 columns, 31
    vocab items) collisions are absent and every estimate is exact —
    asserted too, as the collision-free contract."""
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.functions.sketches import (
        count_sketch_estimates)

    words = [w for i in range(60) for w in [f"w{i:02d}"] * (i + 1)]
    df = spark.createDataFrame(
        [(0, " ".join(words))], ["doc_id", "text"])
    rows = count_sketch_estimates(df, n_nib=1).collect()
    assert any(r.est_cnt < r.true_cnt for r in rows)
    assert any(r.est_cnt > r.true_cnt for r in rows)

    driver_rows = QUERIES["count_sketch"](spark, SF).collect()
    assert driver_rows and all(r.abs_err == 0 for r in driver_rows)
