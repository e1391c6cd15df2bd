"""Cross-engine parity + serial ground truth for continuation
batch 100 (functions/textstats.vocab_growth)."""

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

    ok, msg = compare(QUERIES["vocab_growth"](spark, SF),
                      con.sql(ORACLE["vocab_growth"]).df())
    assert ok, msg


def test_curve_matches_serial_scan_and_saturates(spark):
    """Docs drawn from a closed 30-word vocabulary: the curve must
    equal a serial first-occurrence scan bucket by bucket, the final
    vocab_size must equal the true type count, and late buckets must
    contribute zero new types (saturation) while volume keeps
    growing linearly."""
    from ehr_relation_extraction_spark.functions.textstats import (
        vocab_growth)

    vocab = ["w%d" % i for i in range(30)]
    rows = []
    for doc in range(12):
        # each doc uses words doc*3 .. doc*3+9 (overlapping slide),
        # all capped into the 30-word vocabulary
        words = [vocab[(doc * 3 + j) % 30] for j in range(10)]
        rows.append((doc, " ".join(words)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.bucket: r for r in vocab_growth(df, bucket_docs=4)
           .collect()}

    seen, serial = set(), {}
    for doc, text in rows:
        b = doc // 4
        st = serial.setdefault(b, [0, 0, 0])   # docs, toks, new
        st[0] += 1
        for w in text.split():
            st[1] += 1
            if w not in seen:
                seen.add(w)
                st[2] += 1
    cum_t = cum_v = 0
    for b in sorted(serial):
        st = serial[b]
        cum_t += st[1]
        cum_v += st[2]
        r = got[b]
        assert (r.n_docs, r.n_tokens, r.n_new_types,
                r.cum_tokens, r.vocab_size) == (
            st[0], st[1], st[2], cum_t, cum_v)
    last = got[max(got)]
    assert last.vocab_size == 30            # closed vocabulary reached
    assert last.n_new_types == 0            # saturated tail
    assert last.cum_tokens == 120           # volume still linear
