"""Cross-engine parity + serial ground truth for continuation
batch 83 (operators/dedup.dup_rate_curve)."""

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


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["dup_rate_curve"](spark, SF),
                      con.sql(ORACLE["dup_rate_curve"]).df())
    assert ok, msg


def _shingles(text, k=3):
    toks = text.split()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def test_matches_serial_curve(spark):
    """Whole-table equality against a brute-force serial sweep on a
    fixture with graded similarity, plus the monotonicity the curve
    exists for: n_pairs and n_docs_dup are non-increasing in the
    threshold, and prefix-filter completeness at the LOOSEST
    threshold carries the whole sweep (a borderline ~30% pair shows
    at 30 but not 50)."""
    from ehr_relation_extraction_spark.operators.dedup import (
        DUP_CURVE_THRESHOLDS, dup_rate_curve)

    base = [f"w{i}" for i in range(30)]
    texts = {
        0: " ".join(base),
        1: " ".join(base + ["x1"]),                    # ~94%
        2: " ".join(base[:20] + [f"y{i}" for i in range(10)]),  # ~50%
        3: " ".join(base[:12] + [f"z{i}" for i in range(18)]),  # ~30%
        4: " ".join(f"q{i}" for i in range(25)),       # disjoint
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"])
    got = {r.threshold_pct: (r.n_pairs, r.n_docs_dup,
                             r.docs_share_micro6)
           for r in dup_rate_curve(docs).collect()}

    shs = {d: _shingles(t) for d, t in texts.items()}
    want = {}
    for t in DUP_CURVE_THRESHOLDS:
        pairs = [(a, b) for a, b in combinations(sorted(shs), 2)
                 if len(shs[a] & shs[b]) * 100
                 >= len(shs[a] | shs[b]) * t]
        touched = {d for p in pairs for d in p}
        want[t] = (len(pairs), len(touched),
                   len(touched) * 10**6 // len(texts))
    assert got == want
    ths = sorted(got)
    assert all(got[a][0] >= got[b][0] and got[a][1] >= got[b][1]
               for a, b in zip(ths, ths[1:]))          # monotone
    assert got[30][0] > got[50][0]      # borderline pair only at 30
    assert got[90][0] >= 1              # the near-identical pair
