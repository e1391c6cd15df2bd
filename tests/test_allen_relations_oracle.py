"""Cross-engine parity + serial ground truth + full-taxonomy
coverage on a constructed fixture for continuation batch 64
(operators/triples.allen_relation_profile)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"
INF = 1 << 62


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["allen_relations"](spark, SF),
                      con.sql(ORACLE["allen_relations"]).df())
    assert ok, msg


def _allen(sa, ea, sb, eb):
    ea = INF if ea is None else ea
    eb = INF if eb is None else eb
    if ea < sb:
        return "before"
    if ea == sb:
        return "meets"
    if eb < sa:
        return "after"
    if eb == sa:
        return "met_by"
    if sa == sb and ea == eb:
        return "equals"
    if sa == sb:
        return "starts" if ea < eb else "started_by"
    if ea == eb:
        return "finishes" if sa > sb else "finished_by"
    if sa > sb and ea < eb:
        return "during"
    if sa < sb and ea > eb:
        return "contains"
    return "overlaps" if sa < sb else "overlapped_by"


def test_matches_serial_replica(spark):
    from ehr_relation_extraction_spark import driver_queries as dq

    iv = dq.q_triple_snapshots(spark, SF).collect()
    by_claim: dict[tuple, list] = {}
    for r in iv:
        by_claim.setdefault((r.url, r.subj, r.pred), []).append(r)
    want: dict[tuple[str, str], int] = {}
    for rows in by_claim.values():
        for x in rows:
            for y in rows:
                if x.obj < y.obj:
                    rel = _allen(x.valid_from, x.valid_to,
                                 y.valid_from, y.valid_to)
                    k = (x.pred, rel)
                    want[k] = want.get(k, 0) + 1
    got = {(r.pred, r.relation): r.n_pairs
           for r in dq.QUERIES["allen_relations"](spark, SF).collect()}
    assert got == want
    assert got  # the snapshot fixture produces same-claim pairs


def test_full_taxonomy_on_constructed_intervals(spark):
    """Thirteen hand-built interval pairs, one per Allen relation —
    the classifier must return each label exactly once (the
    mutually-exclusive-and-exhaustive proof as a fixture)."""
    from ehr_relation_extraction_spark.operators.triples import (
        ALLEN_RELATIONS, allen_relation_profile)

    cases = {
        "before": ((0, 10), (20, 30)),
        "meets": ((0, 10), (10, 30)),
        "overlaps": ((0, 15), (10, 30)),
        "starts": ((0, 10), (0, 30)),
        "during": ((10, 20), (0, 30)),
        "finishes": ((20, 30), (0, 30)),
        "equals": ((0, 30), (0, 30)),
        "finished_by": ((0, 30), (20, 30)),
        "contains": ((0, 30), (10, 20)),
        "started_by": ((0, 30), (0, 10)),
        "overlapped_by": ((10, 30), (0, 15)),
        "met_by": ((10, 30), (0, 10)),
        "after": ((20, 30), (0, 10)),
    }
    rows = []
    for rel, ((sa, ea), (sb, eb)) in cases.items():
        rows.append((f"u:{rel}", "s", "p", "a", sa, ea))
        rows.append((f"u:{rel}", "s", "p", "b", sb, eb))
    iv = spark.createDataFrame(
        rows, ["url", "subj", "pred", "obj", "valid_from", "valid_to"])
    got = {r.relation: r.n_pairs
           for r in allen_relation_profile(iv).collect()}
    assert got == {rel: 1 for rel in ALLEN_RELATIONS}

    # NULL valid_to = still-current: two open intervals started apart
    iv2 = spark.createDataFrame(
        [("u", "s", "p", "a", 0, None),
         ("u", "s", "p", "b", 10, None)],
        "url string, subj string, pred string, obj string, "
        "valid_from long, valid_to long")
    got2 = {r.relation: r.n_pairs
            for r in allen_relation_profile(iv2).collect()}
    # both reach the +inf sentinel together, a starts first
    assert got2 == {"finished_by": 1}
