"""Cross-engine parity + brute-force semantics for continuation
batches 52 (boolean-retrieval read path) and 53 (mention Gini)."""

from __future__ import annotations

import re

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("key", ["boolean_search", "mention_gini"])
def test_oracle_parity(spark, con, key):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[key](spark, SF),
                      con.sql(ORACLE[key]).df())
    assert ok, msg


def test_boolean_brute_force(spark):
    """Operator counts equal plain-Python retrieval over the token
    streams (same tokenization, same top-2 pick, phrase = adjacency
    in the filtered sequence)."""
    from ehr_relation_extraction_spark import driver_queries as dq

    streams = {}
    for r in dq._docs(spark, SF).select("doc_id", "text").collect():
        streams[int(r.doc_id)] = [
            t for t in re.split(r"[\n \t]", r.text.lower()) if t]
    df: dict[str, set] = {}
    for d, ts in streams.items():
        for t in set(ts):
            df.setdefault(t, set()).add(d)
    (ta, da), (tb, db) = sorted(
        ((t, len(ds)) for t, ds in df.items()),
        key=lambda kv: (-kv[1], kv[0]))[:2]
    docs_a, docs_b = df[ta], df[tb]
    n_phrase = sum(
        1 for d, ts in streams.items()
        if any(x == ta and y == tb for x, y in zip(ts, ts[1:])))

    row = dq.QUERIES["boolean_search"](spark, SF).collect()
    assert len(row) == 1
    g = row[0]
    assert (g.term_a, g.term_b, g.df_a, g.df_b) == (ta, tb, da, db)
    assert g.n_and == len(docs_a & docs_b)
    assert g.n_or == len(docs_a | docs_b)
    assert g.n_phrase == n_phrase
    assert g.n_and <= min(da, db) and g.n_or >= max(da, db)


def test_gini_brute_force(spark):
    """The Gini row equals the sorted-rank identity computed in
    plain Python over the collected mention counts."""
    from ehr_relation_extraction_spark import driver_queries as dq

    _, linked, _ = dq._linked(spark, SF)
    cnt: dict[str, int] = {}
    for r in linked.select("canonical_id").collect():
        cnt[r.canonical_id] = cnt.get(r.canonical_id, 0) + 1
    xs = sorted(cnt.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(xs)
    s0 = sum(x for _, x in xs)
    s1 = sum((i + 1) * x for i, (_, x) in enumerate(xs))
    gini = (2 * s1 - (n + 1) * s0) * 1000000 // (n * s0)
    top1 = max(x for _, x in xs) * 1000000 // s0

    row = dq.QUERIES["mention_gini"](spark, SF).collect()
    assert len(row) == 1
    g = row[0]
    assert (g.n_entities, g.total_mentions, g.gini_micro6,
            g.top1_share_micro6) == (n, s0, gini, top1)
    assert 0 <= g.gini_micro6 < 1000000
