"""Cross-engine parity + semantic invariants for continuation batches
36 (sorted-neighborhood blocking) and 37 (truncated integer Katz
centrality)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("key", ["sn_pairs", "katz_scores"])
def test_oracle_parity(spark, con, key):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[key](spark, SF),
                      con.sql(ORACLE[key]).df())
    assert ok, msg


def test_sn_window_semantics(spark):
    """Each block's pairs are exactly the (i, i+1) and (i, i+2)
    successors of its sorted distinct surface list."""
    from ehr_relation_extraction_spark import driver_queries as dq

    got = {}
    for r in dq.QUERIES["sn_pairs"](spark, SF).collect():
        got.setdefault((r.host, r.ent_type), set()).add(
            (r.surf_a, r.surf_b, r.pos_gap))

    m = dq._frames(spark, SF).mentions
    from pyspark.sql import functions as F
    host = F.substring_index(F.substring_index("url", "//", -1), "/", 1)
    recs = (m.select(host.alias("host"), "ent_type",
                     F.lower("ent_text").alias("s"))
            .dropDuplicates().collect())
    blocks: dict[tuple, list] = {}
    for r in recs:
        blocks.setdefault((r.host, r.ent_type), []).append(r.s)
    expect = {}
    for k, surfs in blocks.items():
        surfs.sort()
        pairs = set()
        for i, a in enumerate(surfs):
            for g in (1, 2):
                if i + g < len(surfs):
                    pairs.add((a, surfs[i + g], g))
        if pairs:
            expect[k] = pairs
    assert got == expect and got


def test_katz_walk_counts(spark):
    """w1/w2/w3 equal brute-force walk counts (adjacency power column
    sums) on the collected co-mention graph; katz_x512 = 64*w1 +
    8*w2 + w3."""
    from ehr_relation_extraction_spark import driver_queries as dq

    edges, nodes = dq._comention_graph(spark, SF)
    nbrs: dict[str, list] = {}
    for r in edges.collect():
        nbrs.setdefault(r.src, []).append(r.dst)
        nbrs.setdefault(r.dst, []).append(r.src)
    allnodes = [r.node for r in nodes.collect()]
    w1 = {n: len(nbrs.get(n, [])) for n in allnodes}
    w2 = {n: sum(w1[m] for m in nbrs.get(n, [])) for n in allnodes}
    w3 = {n: sum(w2[m] for m in nbrs.get(n, [])) for n in allnodes}

    rows = dq.QUERIES["katz_scores"](spark, SF).collect()
    assert sorted(r.node for r in rows) == sorted(allnodes)
    for r in rows:
        assert (r.w1, r.w2, r.w3) == (w1[r.node], w2[r.node], w3[r.node])
        assert r.katz_x512 == 64 * r.w1 + 8 * r.w2 + r.w3
