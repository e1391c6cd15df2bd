"""Cross-engine parity + serial ground truth for continuation
batch 216 (functions/textstats.lexical_topk)."""

from __future__ import annotations

import collections
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

    ok, msg = compare(QUERIES["lexical_topk"](spark, SF),
                      con.sql(ORACLE["lexical_topk"]).df())
    assert ok, msg


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _replica(texts, k=5, max_df=20):
    """Serial integer replica of the Dice-weighted tf-idf top-k."""
    n = len(texts)
    tf = [collections.Counter(w.lower() for w in t.split() if w)
          for t in texts]
    df = collections.Counter(w for c in tf for w in c)
    idf = {w: math.floor(math.log((2 * n + 2) / (2 * d + 1)) * 1000000)
           for w, d in df.items()}
    tv = [{w: c * idf[w] for w, c in doc.items()} for doc in tf]
    n2 = [sum(v * v for v in doc.values()) for doc in tv]
    cand = set()
    for a in range(n):
        for b in range(a + 1, n):
            if any(2 <= df[w] <= max_df
                   for w in tv[a].keys() & tv[b].keys()):
                cand.add((a, b))
    out = collections.defaultdict(list)
    for a, b in cand:
        dot = sum(tv[a][w] * tv[b][w]
                  for w in tv[a].keys() & tv[b].keys())
        out[a].append((2000000 * dot // (n2[a] + n2[b]), b))
    rows = []
    for a, lst in out.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        for rank, (sim, b) in enumerate(lst[:k], 1):
            rows.append((a, b, sim, rank))
    return sorted(rows)


def test_python_replica(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        lexical_topk)

    texts = ["apple banana cherry date", "apple banana cherry elm",
             "banana cherry elm fig", "grape melon kiwi",
             "grape melon kiwi lime", "solo unique words here"]
    got = sorted(tuple(r) for r in
                 lexical_topk(_docs(spark, texts)).collect())
    assert got == _replica(texts)


def test_rare_term_blocking(spark):
    """Pairs sharing ONLY a term with df > max_df are never
    candidates; pairs sharing a 2..max_df term are."""
    from ehr_relation_extraction_spark.functions.textstats import (
        lexical_topk)

    # 'common' appears in all 4 docs; with max_df=3 it blocks
    # nothing, so only the 'rare'-sharing pair (0,1) survives.
    texts = ["common rare", "common rare", "common x", "common y"]
    rows = lexical_topk(_docs(spark, texts), max_df=3).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == {(0, 1)}
    # But the dot product over the candidate still counts ALL
    # shared terms (incl. 'common'), per the replica.
    got = sorted(tuple(r) for r in rows)
    assert got == _replica(texts, max_df=3)


def test_identical_docs_sim_is_one(spark):
    """Dice-weighted sim hits exactly 1.0 (1000000 micro6) iff the
    tf-idf vectors coincide — the no-sqrt exactness device."""
    from ehr_relation_extraction_spark.functions.textstats import (
        lexical_topk)

    texts = ["twin words here", "twin words here", "twin other stuff"]
    rows = {(r.doc_a, r.doc_b): r.sim_micro6
            for r in lexical_topk(_docs(spark, texts)).collect()}
    assert rows[(0, 1)] == 1000000
    assert rows[(0, 2)] < 1000000


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        lexical_topk)

    texts = ["apple banana cherry date", "apple banana cherry elm",
             "banana cherry elm fig", "grape melon kiwi",
             "grape melon kiwi lime"]
    d = _docs(spark, texts)
    a = sorted(tuple(r) for r in
               lexical_topk(d.coalesce(1)).collect())
    b = sorted(tuple(r) for r in
               lexical_topk(d.repartition(7)).collect())
    assert a == b
