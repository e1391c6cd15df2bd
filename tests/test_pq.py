"""Product quantization vs an exact serial numpy/python replica —
the same bit-determinism contract as the IVF codebook and the
learned-stage loops (integer-quantized decisions, order-independent
sums)."""

from __future__ import annotations

import math

EMB = "/root/testdata/sf0.001/embeddings.parquet"
M, K, ROUNDS = 8, 16, 2


def _l2_q6(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return math.floor(acc * 1000000)


def _replica_train(vecs: dict, m: int, k: int, rounds: int):
    dim = len(vecs[0])
    dsub = dim // m
    sv = {(vid, s): v[s * dsub:(s + 1) * dsub]
          for vid, v in vecs.items() for s in range(m)}
    cb = [[list(sv[(i, s)]) for i in range(k)] for s in range(m)]
    for _ in range(rounds):
        codes = {kk: min((_l2_q6(x, cb[kk[1]][c]), c)
                         for c in range(k))[1]
                 for kk, x in sv.items()}
        nxt = [[list(c) for c in cbs] for cbs in cb]
        for s in range(m):
            for c in range(k):
                members = [vid for vid in vecs
                           if codes[(vid, s)] == c]
                if not members:
                    continue
                for d in range(dsub):
                    ssum = sum(math.floor(sv[(vid, s)][d] * 1000000)
                               for vid in members)
                    nxt[s][c][d] = math.floor(ssum / len(members)) / 1e6
        cb = nxt
    return cb, sv


def _load_vecs(spark):
    rows = (spark.read.parquet(EMB).orderBy("vec_id")
            .select("vec_id", "embedding").collect())
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}


def test_pq_train_matches_replica_and_is_partition_invariant(spark):
    from ehr_relation_extraction_spark.operators.pq import (
        train_pq_codebooks)

    emb = spark.read.parquet(EMB)
    got = train_pq_codebooks(emb, m=M, k=K, rounds=ROUNDS)
    want, _ = _replica_train(_load_vecs(spark), M, K, ROUNDS)
    assert got == want
    got13 = train_pq_codebooks(emb.repartition(13), m=M, k=K,
                               rounds=ROUNDS)
    assert got13 == got


def test_pq_encode_matches_replica(spark):
    from ehr_relation_extraction_spark.operators.pq import (
        pq_encode, train_pq_codebooks)

    emb = spark.read.parquet(EMB)
    cb = train_pq_codebooks(emb, m=M, k=K, rounds=ROUNDS)
    vecs = _load_vecs(spark)
    _, sv = _replica_train(vecs, M, K, ROUNDS)
    want = {vid: [min((_l2_q6(sv[(vid, s)], cb[s][c]), c)
                      for c in range(K))[1] for s in range(M)]
            for vid in vecs}
    got = {r["vec_id"]: list(r["codes"])
           for r in pq_encode(emb, cb).collect()}
    assert got == want


def test_pq_topk_matches_replica_adc(spark):
    from ehr_relation_extraction_spark.operators.pq import (
        pq_topk, train_pq_codebooks)

    n_queries, topk = 10, 5
    emb = spark.read.parquet(EMB)
    cb = train_pq_codebooks(emb, m=M, k=K, rounds=ROUNDS)
    vecs = _load_vecs(spark)
    _, sv = _replica_train(vecs, M, K, ROUNDS)
    codes = {vid: [min((_l2_q6(sv[(vid, s)], cb[s][c]), c)
                       for c in range(K))[1] for s in range(M)]
             for vid in vecs}
    want = set()
    for q in range(n_queries):
        dists = sorted(
            (sum(_l2_q6(sv[(q, s)], cb[s][codes[n][s]])
                 for s in range(M)), n)
            for n in vecs if n != q)
        for rank, (d, n) in enumerate(dists[:topk], 1):
            want.add((q, rank, n, d))
    got = {(r["query_id"], r["rank"], r["neighbor_id"], r["adist_q6"])
           for r in pq_topk(emb, cb, n_queries=n_queries,
                            k=topk).collect()}
    assert got == want


def test_pq_plans_have_no_cartesians(spark):
    """Same plan-hygiene rule as the registry lint: the ADC path is
    equi-joins + one aggregate; the only broadcast dimension is the
    m*k codebook/LUT."""
    from ehr_relation_extraction_spark.operators.pq import (
        pq_encode, pq_topk, train_pq_codebooks)

    emb = spark.read.parquet(EMB)
    cb = train_pq_codebooks(emb, m=M, k=K, rounds=1)
    for frame in (pq_encode(emb, cb),
                  pq_topk(emb, cb, n_queries=5, k=3)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def _cos6(a, b):
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000)


def test_ivfpq_encode_and_search_match_replica(spark):
    """Full IVF-PQ path vs a serial replica GIVEN the Spark-trained
    codebooks (training equality is covered piecewise by the PQ tests
    here and the IVF codebook tests): coarse assign (argmax quantized
    cosine, tie->cell), residual encode (argmin quantized L2,
    tie->code), probe (top-nprobe cells), ADC over probed candidates —
    every row must match bit-for-bit."""
    from ehr_relation_extraction_spark.operators.pq import (
        ivfpq_encode, ivfpq_topk, train_ivfpq)

    n_cells, nprobe, n_queries, topk = 8, 2, 10, 5
    emb = spark.read.parquet(EMB)
    coarse, pq_cb = train_ivfpq(emb, n_cells=n_cells, m=M, k=K,
                                rounds=1)
    vecs = _load_vecs(spark)
    dsub = len(vecs[0]) // M

    cell_of = {vid: min(range(n_cells),
                        key=lambda c: (-_cos6(v, coarse[c]), c))
               for vid, v in vecs.items()}
    resid = {vid: [x - c for x, c in zip(v, coarse[cell_of[vid]])]
             for vid, v in vecs.items()}

    def sub(v, s):
        return v[s * dsub:(s + 1) * dsub]

    codes = {vid: [min((_l2_q6(sub(r, s), pq_cb[s][c]), c)
                       for c in range(K))[1] for s in range(M)]
             for vid, r in resid.items()}

    got_enc = {r["vec_id"]: (r["cell"], list(r["codes"]))
               for r in ivfpq_encode(emb, coarse, pq_cb).collect()}
    assert got_enc == {vid: (cell_of[vid], codes[vid]) for vid in vecs}

    want = set()
    for q in range(n_queries):
        probed = sorted(range(n_cells),
                        key=lambda c: (-_cos6(vecs[q], coarse[c]), c)
                        )[:nprobe]
        cands = []
        for n, v in vecs.items():
            if n == q or cell_of[n] not in probed:
                continue
            qr = [x - c for x, c in zip(vecs[q], coarse[cell_of[n]])]
            d = sum(_l2_q6(sub(qr, s), pq_cb[s][codes[n][s]])
                    for s in range(M))
            cands.append((d, n))
        for rank, (d, n) in enumerate(sorted(cands)[:topk], 1):
            want.add((q, rank, n, d))
    got = {(r["query_id"], r["rank"], r["neighbor_id"], r["adist_q6"])
           for r in ivfpq_topk(emb, coarse, pq_cb,
                               n_queries=n_queries, nprobe=nprobe,
                               k=topk).collect()}
    assert got == want
