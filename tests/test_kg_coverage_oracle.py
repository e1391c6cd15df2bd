"""Cross-engine parity + semantics for continuation batch 32: greedy
maximum-coverage corpus selection (greedy_coverage, k=5).  The oracle
unrolls the greedy rounds as chained DuckDB CTEs; pytest adds a pure-
Python greedy as the third algorithm.  At sf0.001 the corpus exhausts
after 3 picks, so the early-stop path is exercised, not just k full
rounds."""

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

    ok, msg = compare(QUERIES["greedy_coverage"](spark, SF),
                      con.sql(ORACLE["greedy_coverage"]).df())
    assert ok, msg


def test_matches_pure_python_greedy(spark):
    """Third algorithm: recompute the greedy on collected incidence
    rows (gain desc, doc_id asc, stop at zero gain / k picks)."""
    from ehr_relation_extraction_spark import driver_queries as dq

    _, linked, _ = dq._linked(spark, SF)
    inc = {(int(r.doc_id), r.canonical_id)
           for r in linked.select("doc_id", "canonical_id").collect()}
    by_doc: dict[int, set] = {}
    for d, c in inc:
        by_doc.setdefault(d, set()).add(c)

    expect = []
    covered: set = set()
    for rank in range(1, 6):
        gains = {d: len(es - covered) for d, es in by_doc.items()}
        d, g = min(gains.items(), key=lambda kv: (-kv[1], kv[0]))
        if g == 0:
            break
        covered |= by_doc[d]
        expect.append((rank, d, g, len(covered)))

    got = [(r.pick_rank, int(r.doc_id), int(r.gain), int(r.covered_cum))
           for r in dq.QUERIES["greedy_coverage"](spark, SF)
           .orderBy("pick_rank").collect()]
    assert got == expect and got


def test_early_stop_exercised(spark):
    """sf0.001 exhausts coverage before k=5 — the selection is
    shorter than k and its last pick still has positive gain."""
    from ehr_relation_extraction_spark import driver_queries as dq

    rows = (dq.QUERIES["greedy_coverage"](spark, SF)
            .orderBy("pick_rank").collect())
    assert 0 < len(rows) < 5
    assert all(r.gain > 0 for r in rows)
    assert [r.pick_rank for r in rows] == list(range(1, len(rows) + 1))
    assert rows[-1].covered_cum == sum(r.gain for r in rows)
