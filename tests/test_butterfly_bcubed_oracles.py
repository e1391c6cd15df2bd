"""Cross-engine parity + brute-force semantics for continuation
batches 38 (bipartite butterfly counts) and 39 (B-cubed clustering
evaluation)."""

from __future__ import annotations

from itertools import combinations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("key", ["butterflies", "bcubed"])
def test_oracle_parity(spark, con, key):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[key](spark, SF),
                      con.sql(ORACLE[key]).df())
    assert ok, msg


def test_butterflies_brute_force(spark):
    """Per-node butterfly counts match direct 4-cycle enumeration
    over the collected doc-entity incidence."""
    from ehr_relation_extraction_spark import driver_queries as dq

    _, linked, _ = dq._linked(spark, SF)
    docs_of: dict[str, set] = {}
    for r in linked.select("doc_id", "canonical_id").distinct().collect():
        docs_of.setdefault(r.canonical_id, set()).add(r.doc_id)
    ents = sorted(docs_of)
    bf = {e: 0 for e in ents}
    partners = {e: 0 for e in ents}
    for x, y in combinations(ents, 2):
        d = len(docs_of[x] & docs_of[y])
        if d:
            partners[x] += 1
            partners[y] += 1
            c2 = d * (d - 1) // 2
            bf[x] += c2
            bf[y] += c2
    got = {r.node: (r.n_copartners, r.n_butterflies)
           for r in dq.QUERIES["butterflies"](spark, SF).collect()}
    assert got == {e: (partners[e], bf[e]) for e in ents}
    assert any(v[1] > 0 for v in got.values()), \
        "corpus should contain at least one butterfly"


def test_bcubed_brute_force(spark):
    """The single output row equals the textbook per-item B-cubed
    computation (floored micro6 protocol) in plain Python."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.operators import triples as tri_op
    from pyspark.sql import functions as F

    fr, linked, _ = dq._linked(spark, SF)
    pred = {r.subj: r.cluster for r in
            tri_op.attr_merge_clusters(fr.triples).collect()}
    gold_rows = (fr.triples
                 .join(linked.selectExpr("url", "ent_id AS subj_id",
                                         "canonical_id"),
                       ["url", "subj_id"])
                 .groupBy("subj")
                 .agg(F.min("canonical_id").alias("label")).collect())
    gold = {r.subj: r.label for r in gold_rows}
    items = sorted(set(pred) & set(gold))
    assert items
    csize: dict = {}
    gsize: dict = {}
    inter: dict = {}
    for i in items:
        csize[pred[i]] = csize.get(pred[i], 0) + 1
        gsize[gold[i]] = gsize.get(gold[i], 0) + 1
        k = (pred[i], gold[i])
        inter[k] = inter.get(k, 0) + 1
    sp = sum(inter[(pred[i], gold[i])] * 1000000 // csize[pred[i]]
             for i in items)
    sr = sum(inter[(pred[i], gold[i])] * 1000000 // gsize[gold[i]]
             for i in items)
    n = len(items)
    p, r = sp // n, sr // n
    f1 = (2 * p * r) // (p + r) if p + r else 0

    row = dq.QUERIES["bcubed"](spark, SF).collect()
    assert len(row) == 1
    got = row[0]
    assert (got.n_items, got.bcubed_p_micro6, got.bcubed_r_micro6,
            got.bcubed_f1_micro6) == (n, p, r, f1)
    assert 0 < p <= 1000000 and 0 < r <= 1000000
