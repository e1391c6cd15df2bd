"""Cross-engine parity + serial ground truth for continuation
batch 70 (functions/textstats.retrieval_ndcg)."""

from __future__ import annotations

import math
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

    ok, msg = compare(QUERIES["retrieval_ndcg"](spark, SF),
                      con.sql(ORACLE["retrieval_ndcg"]).df())
    assert ok, msg


def test_discount_constants():
    """The micro6 discount tuple is exactly floor(ln2/ln(i+1)*1e6) —
    the same expression the oracle bakes into its VALUES list."""
    from ehr_relation_extraction_spark.functions.textstats import (
        NDCG_DISCOUNTS_MICRO6)

    assert NDCG_DISCOUNTS_MICRO6 == tuple(
        math.floor(math.log(2) / math.log(i + 1) * 10**6)
        for i in range(1, 11))
    assert NDCG_DISCOUNTS_MICRO6[0] == 10**6  # rank 1 undiscounted


def test_matches_serial_ndcg(spark):
    """Whole-table equality against a serial replica that recomputes
    BM25 (exact-rational k1/b, single-ln idf) and both DCG sums, plus
    the two analytic endpoints: a term whose BM25 order equals the tf
    order scores exactly 1e6, and any reordering scores strictly
    less."""
    from ehr_relation_extraction_spark.functions.textstats import (
        NDCG_DISCOUNTS_MICRO6, retrieval_ndcg)

    # doc 0: "apple" 5x in a SHORT doc (bm25 favors it, tf agrees).
    # docs 1-4: decreasing apple tf inside increasingly long docs so
    # length normalization flips at least one adjacent pair vs raw tf.
    # "pear" appears once everywhere -> ties broken by doc_id on both
    # sides -> ndcg exactly 1e6.
    texts = {
        0: " ".join(["apple"] * 5 + ["pear"]),
        1: " ".join(["apple"] * 4 + ["filler"] * 40 + ["pear"]),
        2: " ".join(["apple"] * 4 + ["filler"] * 2 + ["pear"]),
        3: " ".join(["apple"] * 2 + ["filler"] * 80 + ["pear"]),
        4: " ".join(["apple"] * 3 + ["filler"] * 300 + ["pear"]),
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"])
    terms = spark.createDataFrame([("apple",), ("pear",)], ["alias"])
    got = {r.term: (r.n_matched, r.dcg_micro6, r.idcg_micro6,
                    r.ndcg_micro6)
           for r in retrieval_ndcg(docs, terms).collect()}

    # --- serial replica ---------------------------------------------
    toks = {i: t.split() for i, t in texts.items()}
    dl = {i: len(ts) for i, ts in toks.items()}
    total_t, n_docs = sum(dl.values()), len(dl)
    want = {}
    for term in ("apple", "pear"):
        tf = {i: Counter(ts)[term] for i, ts in toks.items()
              if Counter(ts)[term] > 0}
        df_ = len(tf)
        idf = math.floor(
            math.log((2 * n_docs + 2) / (2 * df_ + 1)) * 10**6)
        # score = idf * 44*T*tf // (20*T*tf + 6*T + 18*dl*N)
        score = {i: idf * (44 * total_t * v)
                 // (20 * total_t * v + 6 * total_t
                     + 18 * dl[i] * n_docs)
                 for i, v in tf.items()}
        bm_order = sorted(tf, key=lambda i: (-score[i], i))[:10]
        tf_order = sorted(tf, key=lambda i: (-tf[i], i))[:10]
        dcg = sum(tf[i] * NDCG_DISCOUNTS_MICRO6[r]
                  for r, i in enumerate(bm_order))
        idcg = sum(tf[i] * NDCG_DISCOUNTS_MICRO6[r]
                   for r, i in enumerate(tf_order))
        want[term] = (len(tf), dcg, idcg, dcg * 10**6 // idcg)
    assert got == want

    # analytic endpoints
    assert got["pear"][3] == 10**6           # orders agree -> NDCG=1
    assert got["apple"][3] < 10**6           # dl-penalty reordered
    assert 0 < got["apple"][3]
