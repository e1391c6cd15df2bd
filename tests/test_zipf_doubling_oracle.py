"""Cross-engine parity + serial ground truth for continuation
batch 115 (functions/textstats.zipf_doubling)."""

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

    ok, msg = compare(QUERIES["zipf_doubling"](spark, SF),
                      con.sql(ORACLE["zipf_doubling"]).df())
    assert ok, msg


def test_matches_serial_zipf(spark):
    """Synthetic exact-Zipf corpus (word w_r repeated 64//r times as
    isolated trigram blocks): every doubling ratio must be exactly
    2.0 and the serial rank table must match row for row."""
    from ehr_relation_extraction_spark.functions.textstats import (
        zipf_doubling)

    docs = []
    doc_id = 0
    # distinct trigram 'a{r} b{r} c{r}' appears 64 // r times for
    # r = 1..8 plus filler ranks so doubling targets exist
    for r in range(1, 17):
        for _ in range(max(64 // r, 1)):
            docs.append((doc_id, f"a{r} b{r} c{r}"))
            doc_id += 1
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.rank: (r.freq_r, r.freq_2r, r.ratio_micro6)
           for r in zipf_doubling(df, max_rank=8).collect()}

    cnt = Counter()
    for _, text in docs:
        cnt[text] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    for r in (1, 2, 4, 8):
        fr, f2r = ranked[r - 1][1], ranked[2 * r - 1][1]
        assert got[r] == (fr, f2r, (1000000 * fr) // f2r)
    # exact-Zipf input: ratio == 2.0 at every doubling point
    assert all(v[2] == 2000000 for v in got.values())
