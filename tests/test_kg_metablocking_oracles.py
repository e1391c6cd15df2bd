"""Cross-engine parity + semantics for continuation batch 26:
token-blocking with block purging and CBS/WNP meta-blocking over the
subject surface forms."""

from __future__ import annotations

import re
from collections import defaultdict

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

KEYS = ["token_blocks", "meta_block_edges"]


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", KEYS)
def test_oracle_parity(spark, con, name):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES[name](spark, SF),
                      con.sql(ORACLE[name]).df())
    assert ok, f"{name}: {msg}"


def _blocks(spark, SF):
    from ehr_relation_extraction_spark import driver_queries as dq

    facts = {(r.subj.lower(), r.obj.lower())
             for r in dq._frames(spark, SF).triples
             .select("subj", "obj").collect()}
    toks = defaultdict(set)
    for e, v in facts:
        for t in re.split(r"[^a-z0-9]+", f"{e} {v}"):
            if t:
                toks[t].add(e)
    return toks


def test_meta_blocking_vs_brute_force(spark):
    """CBS weights and the WNP keep flag equal a driver-side replica
    (block purge at 50, per-endpoint average threshold)."""
    from ehr_relation_extraction_spark import driver_queries as dq

    toks = _blocks(spark, SF)
    pairs = defaultdict(int)
    for t, es in toks.items():
        if len(es) > 50:
            continue
        se = sorted(es)
        for i, a in enumerate(se):
            for b in se[i + 1:]:
                pairs[(a, b)] += 1
    stats = defaultdict(lambda: [0, 0])
    for (a, b), w in pairs.items():
        for v in (a, b):
            stats[v][0] += 1
            stats[v][1] += w
    expect = {(a, b): (w, int(w * stats[a][0] >= stats[a][1]
                             or w * stats[b][0] >= stats[b][1]))
              for (a, b), w in pairs.items()}
    got = {(r.ent_a, r.ent_b): (r.cbs, r.keep)
           for r in dq.QUERIES["meta_block_edges"](spark, SF)
           .collect()}
    assert got == expect and got


def test_purged_blocks_generate_no_pairs(spark):
    """No surviving pair owes its existence solely to a purged block:
    every pair's cbs equals its count of SHARED non-purged tokens."""
    from ehr_relation_extraction_spark import driver_queries as dq

    toks = _blocks(spark, SF)
    kept = {t for t, es in toks.items() if len(es) <= 50}
    ent_toks = defaultdict(set)
    for t in kept:
        for e in toks[t]:
            ent_toks[e].add(t)
    rows = dq.QUERIES["meta_block_edges"](spark, SF).collect()
    assert rows
    n_keep = 0
    for r in rows:
        shared = ent_toks[r.ent_a] & ent_toks[r.ent_b]
        assert r.cbs == len(shared) > 0
        n_keep += r.keep
    # WNP can never prune everything: each node's max-weight edge
    # meets that node's average, so at least one edge survives
    assert n_keep >= 1


def test_wnp_prunes_on_skewed_fixture(spark):
    """On a synthetic skewed block structure the WNP rule actually
    prunes: a weak bridge pair (1 shared token) between two tight
    pairs (many shared tokens) is dropped while the tight pairs
    survive."""
    from ehr_relation_extraction_spark.operators.linking import (
        meta_block_edges)

    rows = []
    # tight pair a1-a2: 5 shared value tokens; tight pair b1-b2:
    # 5 shared; weak bridge a2-b1: 1 shared token
    for i in range(5):
        rows.append(("a1", "p", f"common{i}"))
        rows.append(("a2", "p", f"common{i}"))
        rows.append(("b1", "p", f"other{i}"))
        rows.append(("b2", "p", f"other{i}"))
    rows.append(("a2", "p", "bridge"))
    rows.append(("b1", "p", "bridge"))
    tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    got = {(r.ent_a, r.ent_b): r.keep
           for r in meta_block_edges(tri).collect()}
    assert got[("a1", "a2")] == 1
    assert got[("b1", "b2")] == 1
    assert got[("a2", "b1")] == 0
