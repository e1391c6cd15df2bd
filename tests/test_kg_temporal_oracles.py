"""Cross-engine parity + semantics for continuation batch 4: the
point-in-time KG read (kg_asof), temporal conflict range-join
(interval_conflicts), majority-vote node typing (entity_types), and
conjunctive-pattern coverage (star_query).  Same compare as the
driver replica, at sf0.001."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"
ASOF_TS = 1704672000

KEYS = ["kg_asof", "interval_conflicts", "entity_types", "star_query"]


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


def test_kg_asof_is_the_interval_slice(spark):
    """Every as-of row's interval really contains the timestamp, and
    every interval containing it is returned (set equality against a
    driver-side slice of the SCD2 table)."""
    from ehr_relation_extraction_spark import driver_queries as dq

    iv = dq.q_triple_snapshots(spark, SF).collect()
    expect = {(r.url, r.subj, r.pred, r.obj, r.n_snaps)
              for r in iv
              if r.valid_from <= ASOF_TS
              and (r.valid_to is None or r.valid_to > ASOF_TS)}
    got = {(r.url, r.subj, r.pred, r.obj, r.n_snaps)
           for r in dq.QUERIES["kg_asof"](spark, SF).collect()}
    assert got == expect and got


def test_interval_conflicts_overlap_and_order(spark):
    """Each conflict pair is ordered (obj_a < obj_b), its overlap
    window is non-empty, and both claims' intervals really contain
    the overlap start."""
    from ehr_relation_extraction_spark import driver_queries as dq

    iv = {}
    for r in dq.q_triple_snapshots(spark, SF).collect():
        iv.setdefault((r.url, r.subj, r.pred, r.obj), []).append(
            (r.valid_from, r.valid_to))
    rows = dq.QUERIES["interval_conflicts"](spark, SF).collect()
    assert rows
    inf = 1 << 62
    for r in rows:
        assert r.obj_a < r.obj_b
        if r.overlap_to is not None:
            assert r.overlap_from < r.overlap_to
        ok_a = any(f <= r.overlap_from and (t is None or t > r.overlap_from)
                   for f, t in iv[(r.url, r.subj, r.pred, r.obj_a)])
        ok_b = any(f <= r.overlap_from and (t is None or t > r.overlap_from)
                   for f, t in iv[(r.url, r.subj, r.pred, r.obj_b)])
        assert ok_a and ok_b


def test_entity_types_partition_of_mentions(spark):
    """Majority counts never exceed totals, purity is a proper
    fraction, and summing n_mentions over entities equals the linked
    mention count."""
    from ehr_relation_extraction_spark import driver_queries as dq

    _, linked, _ = dq._linked(spark, SF)
    n_linked = linked.count()
    rows = dq.QUERIES["entity_types"](spark, SF).collect()
    assert rows
    assert sum(r.n_mentions for r in rows) == n_linked
    for r in rows:
        assert 1 <= r.n_major <= r.n_mentions
        assert 0 < r.purity_micro6 <= 1_000_000


def test_star_query_matches_manual_pattern_join(spark):
    """The covered subjects equal a driver-side evaluation of the same
    top-10 pattern conjunction."""
    from ehr_relation_extraction_spark import driver_queries as dq

    tri = [(r.doc_id, r.subj, r.pred, r.obj)
           for r in dq._frames(spark, SF).triples
           .select("doc_id", "subj", "pred", "obj").collect()]
    facts = {(s, p, o) for _, s, p, o in tri}
    cnt = {}
    for s, p, o in facts:
        cnt[(p, o)] = cnt.get((p, o), 0) + 1
    pat = set(sorted(cnt, key=lambda k: (-cnt[k], k[0], k[1]))[:10])
    match, docs = {}, {}
    for d, s, p, o in tri:
        if (p, o) in pat:
            match.setdefault(s, set()).add((p, o))
            docs.setdefault(s, set()).add(d)
    expect = {s: (len(m), len(docs[s]))
              for s, m in match.items() if len(m) >= 2}
    got = {r.subj: (r.n_matched, r.n_docs)
           for r in dq.QUERIES["star_query"](spark, SF).collect()}
    assert got == expect and got
