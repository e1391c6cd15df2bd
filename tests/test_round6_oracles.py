"""STAGED round-6 oracles vs their Spark operators — cross-engine
parity for the round-5 pytest-only ops (k-core membership, PQ
exact-rerank search, IVF-PQ composed index rows), verified NOW so
registering them next round
(the round-5 registry is frozen per the snapshot-sync protocol) is a
two-line diff with zero correctness risk.  Same compare as the driver
replica.  Also the k_core serial-replica and fixed-rounds==fixpoint
gates."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def _entity_graph(spark):
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.operators import linking as lk

    _, linked, _ = dq._linked(spark, SF)
    edges = lk.overlap_edges(linked)
    nodes = linked.select(
        F.col("canonical_id").alias("node")).dropDuplicates()
    return edges, nodes


def test_kcore_oracle(spark, con):
    from ehr_relation_extraction_spark.operators.graph_algos import k_core
    from ehr_relation_extraction_spark.oracle.sqlgen import (KCORE_ROUNDS,
                                                             ORACLE)

    edges, nodes = _entity_graph(spark)
    got = k_core(edges, nodes, k=2, n_rounds=KCORE_ROUNDS)
    ok, msg = compare(got, con.sql(ORACLE["kcore_nodes"]).df())
    assert ok, msg


def test_pq_rerank_oracle(spark, con):
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.operators import pq

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = pq.pq_topk(emb, dq._pq_codebooks_r1(spark, SF),
                     n_queries=20, k=5, rerank=50).select(
        "query_id", "rank", "neighbor_id", "sim_micro6")
    ok, msg = compare(got, con.sql(dq.ORACLE["pq_rerank"]).df())
    assert ok, msg


def _comention_graph(spark):
    """The entity CO-MENTION graph (entities sharing a document) —
    the same edge set as the registered graph_triangles query; denser
    than the overlap graph, so truss/walk structure is non-trivial."""
    from ehr_relation_extraction_spark import driver_queries as dq

    _, linked, _ = dq._linked(spark, SF)
    a = linked.select("doc_id", F.col("canonical_id").alias("src"))
    b = linked.select("doc_id", F.col("canonical_id").alias("dst"))
    edges = (a.join(b, "doc_id").where(F.col("src") < F.col("dst"))
             .select("src", "dst").dropDuplicates())
    nodes = linked.select(
        F.col("canonical_id").alias("node")).dropDuplicates()
    return edges, nodes


def test_ktruss_oracle(spark, con):
    """k-truss edge peel vs the unrolled-rounds DuckDB oracle on the
    co-mention graph — k=13 discriminates on this near-clique fixture
    (90 core edges survive, 11 rare-entity periphery edges peel)."""
    from ehr_relation_extraction_spark.operators.graph_algos import k_truss
    from ehr_relation_extraction_spark.oracle.sqlgen import (
        KTRUSS_K, KTRUSS_ROUNDS, ORACLE)

    edges, _ = _comention_graph(spark)
    got = k_truss(edges, k=KTRUSS_K, n_rounds=KTRUSS_ROUNDS)
    ok, msg = compare(got, con.sql(ORACLE["ktruss_edges"]).df())
    assert ok, msg
    kept = {r["in_truss"] for r in got.collect()}
    assert kept == {0, 1}  # the peel actually discriminates


def test_entity_walks_oracle(spark, con):
    """Deterministic DeepWalk corpus vs the unrolled-steps DuckDB
    oracle (md5-argmin next hop) on the co-mention graph."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        random_walks)
    from ehr_relation_extraction_spark.oracle.sqlgen import (
        ORACLE, WALK_LEN, WALKS_PER_NODE)

    edges, nodes = _comention_graph(spark)
    got = random_walks(edges, nodes, walk_len=WALK_LEN,
                       walks_per_node=WALKS_PER_NODE)
    ok, msg = compare(got, con.sql(ORACLE["entity_walks"]).df())
    assert ok, msg


def test_ktruss_serial_replica(spark):
    """K4 survives 4-truss, a pendant triangle survives only 3-truss,
    a tail edge peels immediately; fixed rounds == fixpoint."""
    from ehr_relation_extraction_spark.operators.graph_algos import k_truss

    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("e", "f"), ("d", "f"), ("f", "g")]
    e = spark.createDataFrame(edges, "src string, dst string")
    want = {3: {e_ for e_ in map(tuple, map(sorted, edges))
                if e_ != ("f", "g")},
            4: {("a", "b"), ("a", "c"), ("a", "d"),
                ("b", "c"), ("b", "d"), ("c", "d")}}
    for k, w in want.items():
        got = {(r["src"], r["dst"])
               for r in k_truss(e, k=k).collect() if r["in_truss"]}
        assert got == w, (k, got)
    fixed = sorted(map(tuple, k_truss(e, k=3, n_rounds=6).collect()))
    conv = sorted(map(tuple, k_truss(e, k=3).collect()))
    assert fixed == conv


def test_random_walks_structure(spark):
    """Walks are deterministic across reruns, start at their seed,
    and every hop follows a real (symmetrized) edge; dead ends stop."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        random_walks)

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("e", "f")]
    e = spark.createDataFrame(edges, "src string, dst string")
    n = spark.createDataFrame(
        [(x,) for x in "abcdefz"], "node string")  # z isolated
    w1 = sorted(map(tuple, random_walks(e, n, 3, 2).collect()))
    w2 = sorted(map(tuple, random_walks(e, n, 3, 2).collect()))
    assert w1 == w2 and w1
    adj = {}
    for (a, b) in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = {(s, w, t): nd for (s, w, t, nd) in w1}
    for (s, w, t), nd in rows.items():
        if t == 0:
            assert nd == s
        else:
            assert nd in adj[rows[(s, w, t - 1)]]
    assert not any(s == "z" and t > 0 for (s, w, t) in rows)  # isolated


def test_hll_shingles_oracle(spark, con):
    """Deterministic-HyperLogLog register table of the 3-gram shingle
    stream vs the DuckDB oracle replaying the md5-hex-nibble
    register/rank arithmetic."""
    from ehr_relation_extraction_spark.functions.sketches import (
        hll_shingle_sketch)
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ok, msg = compare(hll_shingle_sketch(docs),
                      con.sql(ORACLE["hll_shingles"]).df())
    assert ok, msg


def test_hll_sketch_properties(spark, con):
    """The sketch is a real HLL: shard sketches MERGE to exactly the
    full-corpus sketch (union+max), the register table is partition-
    invariant, ranks are in [1, 49], and the bias-corrected estimate
    lands within 20% of the true distinct-shingle count (256
    registers => ~6.5% standard error)."""
    from ehr_relation_extraction_spark.functions.sketches import (
        hll_estimate, hll_merge, hll_shingle_sketch)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = sorted(map(tuple, hll_shingle_sketch(docs).collect()))
    assert full and all(1 <= r <= 49 for _, r in full)
    halves = hll_merge(
        hll_shingle_sketch(docs.where("doc_id % 2 = 0")),
        hll_shingle_sketch(docs.where("doc_id % 2 = 1")))
    assert sorted(map(tuple, halves.collect())) == full
    assert sorted(map(tuple, hll_shingle_sketch(
        docs.repartition(7)).collect())) == full
    true = con.sql("""
        SELECT COUNT(DISTINCT ts[CAST(i AS INT)] || ' '
                     || ts[CAST(i AS INT) + 1] || ' '
                     || ts[CAST(i AS INT) + 2])
        FROM (SELECT list_filter(string_split_regex(text, '[\\n \\t]'),
                                 t -> t <> '') AS ts FROM documents),
             unnest(generate_series(1, len(ts) - 2)) AS t(i)""").fetchone()[0]
    est = hll_estimate(full)
    assert abs(est - true) / true < 0.20, (est, true)


def test_link_pred_oracle(spark, con):
    """Link-prediction scores (non-edge 2-hop pairs: common-neighbor
    count + floor-scaled Jaccard) over the co-mention graph vs the
    DuckDB wedge-join replay."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        link_prediction)
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    edges, _ = _comention_graph(spark)
    ok, msg = compare(link_prediction(edges),
                      con.sql(ORACLE["link_pred"]).df())
    assert ok, msg


def test_link_prediction_semantics(spark):
    """Hand-checked graph: path a-b-c-d plus hub h wired to all.
    Candidates are exactly the non-edges with a shared neighbor;
    max_deg drops wedges THROUGH hubs but hub degrees still count."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        link_prediction)

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),
         ("h", "a"), ("h", "b"), ("h", "c"), ("h", "d")],
        "src string, dst string")
    got = {(r.src, r.dst): (r.cn, r.jaccard_micro6)
           for r in link_prediction(edges).collect()}
    # a: {b,h}, b: {a,c,h}, c: {b,d,h}, d: {c,h}
    # non-edges: (a,c) cn={b,h}=2 deg 2+3 -> 2e6//3
    #            (a,d) cn={h}=1  deg 2+2 -> 1e6//3
    #            (b,d) cn={c,h}=2 deg 3+2 -> 2e6//3
    assert got == {("a", "c"): (2, 2000000 // 3),
                   ("a", "d"): (1, 1000000 // 3),
                   ("b", "d"): (2, 2000000 // 3)}
    # cap at deg<=2: only a and d survive as pivots -> wedges through
    # b, c, h vanish; (a,d) keeps no pivot (its only common nbr is h)
    got_cap = {(r.src, r.dst) for r in
               link_prediction(edges, max_deg=2).collect()}
    assert got_cap == set()


def test_textrank_oracle(spark, con):
    """TextRank keyword scores (integer fixed-point PageRank over the
    token co-occurrence graph) vs the DuckDB oracle unrolling the
    same 5 rounds over the same lead()-window edges."""
    from ehr_relation_extraction_spark.functions.textstats import (
        textrank_keywords)
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ok, msg = compare(textrank_keywords(docs),
                      con.sql(ORACLE["textrank_tokens"]).df())
    assert ok, msg


def test_textrank_partition_invariance(spark):
    """The score table is a pure function of the corpus: identical
    under repartitioning, and every token of the corpus gets a row."""
    from ehr_relation_extraction_spark.functions.textstats import (
        textrank_keywords)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(tuple, textrank_keywords(docs).collect()))
    b = sorted(map(tuple, textrank_keywords(
        docs.repartition(7)).collect()))
    assert a == b and len(a) > 0
    assert len({t for t, _ in a}) == len(a)  # one row per token


def test_cm_tokens_oracle(spark, con):
    """Count-min counter table of the whitespace token stream vs the
    DuckDB oracle replaying the salted md5(row || ':' || tok) column
    arithmetic."""
    from ehr_relation_extraction_spark.functions.sketches import (
        cm_token_sketch)
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ok, msg = compare(cm_token_sketch(docs),
                      con.sql(ORACLE["cm_tokens"]).df())
    assert ok, msg


def test_cm_token_est_oracle(spark, con):
    """Point-query audit (est_cnt vs true_cnt for every distinct
    token) matches the DuckDB oracle value-exact."""
    from ehr_relation_extraction_spark.functions.sketches import (
        cm_token_estimates)
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ok, msg = compare(cm_token_estimates(docs),
                      con.sql(ORACLE["cm_token_est"]).df())
    assert ok, msg


def test_cm_sketch_properties(spark):
    """The sketch is a real count-min: shard sketches MERGE to
    exactly the full-corpus sketch (union+sum), the counter table is
    partition-invariant and <= depth*256 rows, total mass = depth *
    token count, est_cnt never underestimates, and at the 4x256
    geometry the vast majority of rare probes resolve exactly."""
    from ehr_relation_extraction_spark.functions.sketches import (
        cm_merge, cm_token_estimates, cm_token_sketch)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = sorted(map(tuple, cm_token_sketch(docs).collect()))
    assert full and len(full) <= 4 * 256
    n_toks = docs.selectExpr(
        "size(filter(split(text, '[\\n \\t]'), t -> t <> '')) AS n"
    ).groupBy().sum("n").collect()[0][0]
    assert sum(c for _, _, c in full) == 4 * n_toks
    halves = cm_merge(
        cm_token_sketch(docs.where("doc_id % 2 = 0")),
        cm_token_sketch(docs.where("doc_id % 2 = 1")))
    assert sorted(map(tuple, halves.collect())) == full
    assert sorted(map(tuple, cm_token_sketch(
        docs.repartition(7)).collect())) == full
    audit = cm_token_estimates(docs).collect()
    assert audit and all(r.est_cnt >= r.true_cnt for r in audit)
    exact = sum(1 for r in audit if r.est_cnt == r.true_cnt)
    assert exact / len(audit) >= 0.9, (exact, len(audit))


def test_alias_edit_links_oracle(spark, con):
    """Edit-distance alias linking (trigram-blocked candidates,
    levenshtein verify, md5-derived synthetic typo surfaces) vs the
    DuckDB oracle."""
    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.operators import linking as lk
    from ehr_relation_extraction_spark.operators import ner
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    toks = ner.tokenize_df(dq._frames(spark, SF).pages)
    ok, msg = compare(lk.edit_verified_aliases(toks),
                      con.sql(ORACLE["alias_edit_links"]).df())
    assert ok, msg


def test_edit_links_recover_typos(spark):
    """Every synthetic typo is levenshtein distance EXACTLY 1 from its
    source alias, and the verified links recover a source-alias link
    for every blocked typo surface."""
    from ehr_relation_extraction_spark.config import GAZETTEER
    from ehr_relation_extraction_spark.operators import linking as lk

    typos = {r["surface"]
             for r in lk.synth_typo_surfaces(spark).collect()}
    assert typos and all(s not in {a for a, _, _ in GAZETTEER}
                         for s in typos)

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    aliases = [a for a, _, _ in GAZETTEER]
    assert all(min(lev(s, a) for a in aliases) == 1 for s in typos)

    empty_toks = spark.createDataFrame([], "token string")
    got = lk.edit_verified_aliases(empty_toks).collect()
    linked_surfaces = {r["surface"] for r in got}
    # every link the operator emits is a true distance<=1 pair
    assert all(lev(r["surface"], r["alias"]) == r["edit_dist"] == 1
               for r in got)
    # and blocked typo surfaces (sharing >= 1 trigram) are recovered
    from ehr_relation_extraction_spark.operators.linking import (
        _char_trigrams)
    blockable = {s for s in typos
                 if any(set(_char_trigrams(s)) & set(_char_trigrams(a))
                        for a in aliases)}
    assert blockable <= linked_surfaces


def test_ivfpq_codes_oracle(spark, con):
    """The composed IVF-PQ index row (coarse cell + m residual PQ
    codes) vs the DuckDB oracle that chains the registered ivf_assign
    seed-centroid assignment, an elementwise residual subtraction, and
    the registered PQ round-1 chain re-pointed at the residual frame
    (``_pq_ctes(base_select=...)``)."""
    from ehr_relation_extraction_spark.operators import pq
    from ehr_relation_extraction_spark.operators import similarity as sim
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    seed = [[float(x) for x in r["embedding"]]
            for r in emb.orderBy("vec_id").limit(8).collect()]
    assigned = sim.ivf_assign(emb, 8).select("vec_id", "cell")
    resid = pq._residuals(emb, assigned, seed).localCheckpoint()
    cb1 = pq.train_pq_codebooks(resid.select("vec_id", "embedding"),
                                m=8, k=16, rounds=1)
    got = pq.ivfpq_encode(emb, seed, cb1).select(
        "vec_id", "cell", F.posexplode("codes").alias("sub", "code"))
    ok, msg = compare(got, con.sql(ORACLE["ivfpq_codes"]).df())
    assert ok, msg


def _serial_kcore(edges: "list[tuple]", nodes: "list", k: int) -> dict:
    """Reference peel: canonical undirected edge set, drop nodes with
    alive-degree < k until stable."""
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    alive = set(nodes)
    while True:
        deg: dict = {}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        nxt = {n for n in alive if deg.get(n, 0) >= k}
        if nxt == alive:
            return {n: int(n in alive) for n in nodes}
        alive = nxt


def test_kcore_serial_replica(spark):
    """Triangle survives k=2, pendant chain peels in cascade, isolated
    node drops, and a both-orientations duplicate edge counts as ONE
    neighbor relation (the lpa round-4 advisory class)."""
    from ehr_relation_extraction_spark.operators.graph_algos import k_core

    edges = [("a", "b"), ("b", "c"), ("c", "a"),   # triangle
             ("c", "d"), ("d", "e"), ("e", "f"),   # pendant chain
             ("b", "a")]                            # duplicate orientation
    nodes = ["a", "b", "c", "d", "e", "f", "iso"]
    want = _serial_kcore(edges, nodes, 2)
    assert want == {"a": 1, "b": 1, "c": 1, "d": 0, "e": 0,
                    "f": 0, "iso": 0}  # pin the fixture's truth
    e = spark.createDataFrame(edges, "src string, dst string")
    n = spark.createDataFrame([(x,) for x in nodes], "node string")
    got = {r["node"]: r["in_core"]
           for r in k_core(e, n, k=2).collect()}
    assert got == want


def test_kcore_fixed_rounds_match_fixpoint(spark):
    """n_rounds past convergence == the converging form (extra peels
    are no-ops) — the property the unrolled oracle relies on."""
    from ehr_relation_extraction_spark.operators.graph_algos import k_core

    edges, nodes = _entity_graph(spark)
    fixed = {(r["node"], r["in_core"])
             for r in k_core(edges, nodes, k=2, n_rounds=8).collect()}
    conv = {(r["node"], r["in_core"])
            for r in k_core(edges, nodes, k=2).collect()}
    assert fixed == conv and len(fixed) > 0
