"""ANN accuracy gates (round-4 verdict item 4): recall@k of the index
paths against exact cosine top-k on the same 50-query workload.

Everything here is DETERMINISTIC — integer-quantized Lloyd training,
fixed query set, integer tie-breaks — so the gates are repeatability
checks, not statistical ones.  The fixture embeddings are uniform
random unit vectors (no cluster structure), the HARDEST case for a
coarse quantizer: at nprobe=2 of 8 cells IVF-family recall is
probe-coverage-capped near 0.55 (still 2.2x the 2/8 uniform-probe
baseline, i.e. the cosine cell ranking works); the exact-rerank
shortlist (IVFADC+R) recovers accuracy without touching raw vectors
in the corpus scan."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"
NQ, K = 50, 5


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet") \
        .localCheckpoint()


@pytest.fixture(scope="module")
def exact(spark, emb):
    from ehr_relation_extraction_spark.operators import similarity as sim

    return sim.brute_force_topk(emb, NQ, K).localCheckpoint()


def _recall(approx, exact):
    from ehr_relation_extraction_spark.operators.similarity import (
        recall_at_k)

    r = recall_at_k(approx, exact).agg(
        {"n_hit": "sum", "n_exact": "sum"}).first()
    return int(r["sum(n_hit)"] or 0) / int(r["sum(n_exact)"])


def test_pq_adc_rerank_recall(spark, emb, exact):
    """ADC top-50 shortlist + exact rerank: >= 0.9 (measured 0.964
    with m=16, k=32, 3 rounds)."""
    from ehr_relation_extraction_spark.operators import pq as pqm

    cb = pqm.train_pq_codebooks(emb, m=16, k=32, rounds=3)
    got = _recall(pqm.pq_topk(emb, cb, n_queries=NQ, k=K, rerank=50),
                  exact)
    assert got >= 0.9, f"recall {got:.3f}"


def test_ivf_recall_nprobe4(spark, emb, exact):
    """IVF at nprobe=4 of 8 cells: >= 0.7 (measured 0.792)."""
    from ehr_relation_extraction_spark.operators import similarity as sim

    coarse = sim.train_ivf_codebook(emb, n_cells=8, rounds=2)
    got = _recall(sim.ivf_topk(emb, n_cells=8, nprobe=4, k=K,
                               n_queries=NQ, codebook=coarse), exact)
    assert got >= 0.7, f"recall {got:.3f}"


def test_ivfpq_rerank_recall(spark, emb, exact):
    """IVF-PQ at nprobe=4 + exact rerank of the top-50 shortlist:
    >= 0.7 (measured 0.776; the residual ADC ranking inside probed
    cells costs little once the rerank recovers metric precision —
    the remaining loss is probe coverage)."""
    from ehr_relation_extraction_spark.operators import pq as pqm

    coarse, res_cb = pqm.train_ivfpq(emb, n_cells=8, m=16, k=32,
                                     rounds=2)
    got = _recall(pqm.ivfpq_topk(emb, coarse, res_cb, n_queries=NQ,
                                 nprobe=4, k=K, rerank=50), exact)
    assert got >= 0.7, f"recall {got:.3f}"


def test_rerank_includes_probe_ceiling_note(spark, emb, exact):
    """Pin the nprobe=2 probe-coverage ceiling the docstring claims:
    recall well below the rerank paths but well above the 2/8
    uniform-probe baseline."""
    from ehr_relation_extraction_spark.operators import pq as pqm

    coarse, res_cb = pqm.train_ivfpq(emb, n_cells=8, m=16, k=32,
                                     rounds=2)
    got = _recall(pqm.ivfpq_topk(emb, coarse, res_cb, n_queries=NQ,
                                 nprobe=2, k=K, rerank=50), exact)
    assert 0.35 <= got <= 0.9, f"recall {got:.3f}"


def test_srp_multiprobe_dominates_single_bucket(spark, emb, exact):
    """Multi-probe SRP's candidate set is a superset of the
    single-bucket SRP search by construction, so its recall@k
    DOMINATES — an exact inequality, not a statistical one — and on
    this fixture the Hamming-1 probes recover strictly more of the
    exact top-k."""
    from ehr_relation_extraction_spark.operators.similarity import (
        srp_multiprobe_topk)

    multi = _recall(srp_multiprobe_topk(emb, k=K), exact)
    single = _recall(srp_multiprobe_topk(emb, k=K, hamming1=False),
                     exact)
    assert multi >= single
    assert multi > single          # fixture: boundary pairs exist
    # 9 of 256 buckets probed over 500 UNIFORM vectors (~2 vectors
    # per bucket — the sparsest case); measured 0.08 vs 0.036 single
    assert multi >= 0.05
