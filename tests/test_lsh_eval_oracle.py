"""Cross-engine parity + serial ground truth for continuation
batch 75 (operators/dedup.lsh_dedup_eval)."""

from __future__ import annotations

import hashlib
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

    ok, msg = compare(QUERIES["lsh_eval"](spark, SF),
                      con.sql(ORACLE["lsh_eval"]).df())
    assert ok, msg


def _shingles(text, k=3):
    toks = text.split()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _minhash_cand(shs, perms, bands):
    """Serial replica of the md5 minhash + banding candidate set."""
    sigs = {}
    for d, sset in shs.items():
        sigs[d] = [min(hashlib.md5(f"{i}:{s}".encode()).hexdigest()
                       for s in sset) for i in range(perms)]
    rows = perms // bands
    band_sig = {}
    for d, sig in sigs.items():
        for b in range(bands):
            parts = sorted(f"{i}:{sig[i]}"
                           for i in range(b * rows, (b + 1) * rows))
            band_sig[(d, b)] = hashlib.md5(
                "|".join(parts).encode()).hexdigest()
    cand = set()
    for a, b in combinations(sorted(shs), 2):
        if any(band_sig[(a, r)] == band_sig[(b, r)]
               for r in range(bands)):
            cand.add((a, b))
    return cand


def test_matches_serial_eval(spark):
    """Whole-table equality against a serial replica that brute-forces
    ALL pairs for the truth set and replays md5 banding for the
    candidate set — on a fixture engineered to have a true near-dup
    the banding catches (tp), a sub-threshold candidate (fp), and
    disjoint docs (neither)."""
    from ehr_relation_extraction_spark.config import (
        JACCARD_THRESHOLD_PCT, LSH_BANDS, MINHASH_PERMS)
    from ehr_relation_extraction_spark.operators.dedup import (
        lsh_dedup_eval)

    base = " ".join(f"w{i}" for i in range(30))
    texts = {
        0: base,
        1: base + " tail0",                     # near-identical -> tp
        2: " ".join(f"w{i}" for i in range(12)) + " "
           + " ".join(f"z{i}" for i in range(20)),   # overlaps, < t
        3: " ".join(f"q{i}" for i in range(25)),     # disjoint
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"])
    got = lsh_dedup_eval(docs).collect()[0]

    shs = {d: _shingles(t) for d, t in texts.items()}
    t = JACCARD_THRESHOLD_PCT
    truth = {(a, b) for a, b in combinations(sorted(shs), 2)
             if len(shs[a] & shs[b]) * 100
             >= len(shs[a] | shs[b]) * t}
    cand = _minhash_cand(shs, MINHASH_PERMS, LSH_BANDS)
    tp = len(cand & truth)
    want = (len(truth), len(cand), tp, len(cand) - tp,
            len(truth) - tp,
            tp * 10**6 // len(cand) if cand else 0,
            tp * 10**6 // len(truth) if truth else 0)
    assert (got.n_truth, got.n_cand, got.tp, got.fp, got.fn,
            got.precision_micro6, got.recall_micro6) == want
    assert (0, 1) in truth and got.tp >= 1    # the engineered near-dup
