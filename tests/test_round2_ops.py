"""Round-2 operators: dup clusters, containment dedup, IVF Lloyd
step, url normalization, distilled quality classifier."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _mini_docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away to the old barn near the river bank every day")
    rows = [
        (0, base, "a"),
        (1, base + " extra", "a"),                     # near-dup of 0
        (2, base.replace("quick", "speedy"), "a"),     # near-dup of 0
        (3, "completely different text about spark catalyst optimizer "
            "plans and shuffle partitions in a distributed engine "
            "running on many executor nodes with adaptive execution", "b"),
        (4, "short unrelated snippet", "b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dup_clusters_match_union_find(spark):
    """Cluster assignment must equal a python union-find over the
    verified near-dup pairs, and is_canonical rows = one per cluster."""
    from ehr_relation_extraction_spark.operators import dedup as dd

    docs = _mini_docs(spark)
    sh = dd.shingles(docs)
    pairs = dd.verify_jaccard(
        dd.lsh_candidate_pairs(dd.lsh_bands(dd.minhash_signatures(sh))), sh)
    plist = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]

    parent = {r["doc_id"]: r["doc_id"] for r in docs.collect()}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in plist:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in parent}

    got = {r["doc_id"]: r["cluster_id"]
           for r in dd.dup_clusters(docs).collect()}
    assert got == want
    rows = dd.dup_clusters(docs).collect()
    clusters = {r["cluster_id"] for r in rows}
    canon = [r for r in rows if r["is_canonical"] == 1]
    assert len(canon) == len(clusters)
    assert all(r["doc_id"] == r["cluster_id"] for r in canon)
    # the fixture really exercises a multi-doc cluster
    assert any(r["cluster_size"] >= 2 for r in rows)


def test_containment_catches_embedded_doc(spark):
    """A short doc fully embedded in a long one: containment 100 even
    where symmetric Jaccard stays below its threshold."""
    from ehr_relation_extraction_spark.operators import dedup as dd

    inner = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon")
    outer = (inner + " phi chi psi omega " + inner.replace("alpha", "aleph")
             + " padding words continue here for a much longer document "
             "with many additional tokens that dilute the jaccard union "
             "score far below any symmetric threshold value used")
    docs = spark.createDataFrame(
        [(10, inner, "a"), (11, outer, "a")],
        "doc_id long, text string, source string")
    sh = dd.shingles(docs)
    pairs = spark.createDataFrame([(10, 11)], "doc_a long, doc_b long")
    cont = dd.verify_containment(pairs, sh, threshold_pct=80).collect()
    assert len(cont) == 1 and cont[0]["containment_pct"] == 100
    jac = dd.verify_jaccard(pairs, sh, threshold_pct=0).collect()
    assert jac[0]["jaccard_pct"] < 50


def test_ivf_centroid_update_matches_numpy(spark):
    """Lloyd-step sums/means must equal the numpy computation on the
    same assignment, and be invariant to repartitioning."""
    from ehr_relation_extraction_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {(r["cell"], r["dim"]): (r["n_vecs"], r["sum_q6"], r["mean_q6"])
           for r in sim.ivf_centroid_update(emb).collect()}

    assigned = {r["vec_id"]: r["cell"]
                for r in sim.ivf_assign(emb).collect()}
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.select("vec_id", "embedding").collect()}
    want = {}
    for vid, cell in assigned.items():
        q = np.floor(vecs[vid] * 1_000_000).astype(np.int64)
        for dim, val in enumerate(q):
            n, s = want.get((cell, dim), (0, 0))
            want[(cell, dim)] = (n + 1, s + int(val))
    want = {k: (n, s, int(np.floor(s / n))) for k, (n, s) in want.items()}
    assert got == want

    got2 = {(r["cell"], r["dim"]): (r["n_vecs"], r["sum_q6"], r["mean_q6"])
            for r in sim.ivf_centroid_update(emb.repartition(7)).collect()}
    assert got2 == got


@pytest.mark.parametrize("raw,norm", [
    ("https://a.example.com/p/1", "https://a.example.com/p/1"),
    ("HTTPS://A.Example.COM:443/p/1", "https://a.example.com/p/1"),
    ("http://a.example.com:80/x/", "http://a.example.com/x"),
    ("https://a.example.com/p/1/", "https://a.example.com/p/1"),
    ("https://a.example.com/p/1?utm_source=f&utm_campaign=x&id=7",
     "https://a.example.com/p/1?id=7"),
    ("https://a.example.com/p/1?b=2&a=1", "https://a.example.com/p/1?a=1&b=2"),
    ("https://a.example.com/p/1?a=1#frag", "https://a.example.com/p/1?a=1"),
    ("https://a.example.com?utm_source=f", "https://a.example.com/"),
    ("https://a.example.com:443/", "https://a.example.com/"),
    ("https://a.example.com/p?fbclid=x&gclid=y&ref=z&keep=1",
     "https://a.example.com/p?keep=1"),
])
def test_url_normalize_cases(spark, raw, norm):
    from ehr_relation_extraction_spark.functions.urls import url_normalize

    df = spark.createDataFrame([(raw,)], "url_raw string")
    assert url_normalize(df).first()["url_norm"] == norm


def test_canonical_url_groups_collapse_variants(spark):
    """Six mess classes of one logical page collapse to one group of
    six with exactly one canonical doc."""
    from ehr_relation_extraction_spark.functions.urls import (
        canonical_url_groups)

    docs = spark.createDataFrame(
        [(i, "t", "src") for i in range(6)],
        "doc_id long, text string, source string")
    rows = canonical_url_groups(docs).collect()
    assert {r["url_norm"] for r in rows} == {"https://src.example.com/p/0"}
    assert all(r["n_variants"] == 6 for r in rows)
    assert sum(r["is_canonical"] for r in rows) == 1
    assert [r["doc_id"] for r in rows if r["is_canonical"]][0] == 0


def test_quality_model_learns_the_gate(spark):
    """Held-out agreement with the rule gate >= 0.85, strictly above
    the majority-class baseline, and bit-identical under
    repartitioning (integer-quantized gradient aggregation)."""
    from ehr_relation_extraction_spark.functions.quality_model import (
        quality_model_verdicts)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    v = quality_model_verdicts(docs).cache()
    held = v.where(F.col("is_train") == 0)
    n = held.count()
    acc = held.where(F.col("pred_keep") == F.col("label")).count() / n
    pos = held.where(F.col("label") == 1).count()
    baseline = max(pos, n - pos) / n
    assert acc >= 0.85, (acc, n)
    assert acc > baseline, (acc, baseline)

    v2 = quality_model_verdicts(docs.repartition(3))
    assert (sorted(map(tuple, v.collect()))
            == sorted(map(tuple, v2.collect())))


def test_boilerplate_strip_removes_host_nav(spark):
    """Nav/footer lines shared by >= 3 docs (>= 50% of host) vanish;
    unique content lines survive in order; a rare shared line below
    the doc-count floor survives."""
    from ehr_relation_extraction_spark.functions.textstats import (
        boilerplate_strip)

    nav, foot = "HOME | NAV", "(c) footer"
    rows = [(i, f"{nav}\ncontent {i} line one\nsecond {i}\n{foot}", "h1")
            for i in range(4)]
    rows += [(10, "rare\nunique ten", "h2"), (11, "rare\nunique eleven", "h2")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r for r in boilerplate_strip(docs).collect()}
    for i in range(4):
        assert got[i]["text_clean"] == f"content {i} line one\nsecond {i}"
        assert got[i]["n_lines"] == 4 and got[i]["n_boiler_lines"] == 2
    # 'rare' is 100% of h2 but only 2 docs < min_docs=3 -> kept
    assert got[10]["text_clean"] == "rare\nunique ten"
    assert got[10]["n_boiler_lines"] == 0


def test_kg_support_counts(spark):
    from ehr_relation_extraction_spark.operators.triples import kg_support

    rows = [
        (0, "https://a.ex/0", "S", "p", "O"),
        (1, "https://a.ex/1", "S", "p", "O"),
        (2, "https://b.ex/2", "S", "p", "O"),
        (3, "https://b.ex/3", "X", "p", "Y"),
    ]
    t = spark.createDataFrame(
        rows, "doc_id long, url string, subj string, pred string, obj string")
    got = {(r["subj"], r["pred"], r["obj"]): r for r in kg_support(t).collect()}
    spo = got[("S", "p", "O")]
    assert spo["n_docs"] == 3 and spo["n_hosts"] == 2
    assert spo["first_day"] == 1704067200 // 86400
    assert got[("X", "p", "Y")]["n_docs"] == 1


def test_entity_centroids_match_numpy(spark):
    from ehr_relation_extraction_spark.operators.linking import (
        entity_centroids)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    linked = spark.createDataFrame(
        [("E1", 0), ("E1", 1), ("E1", 1), ("E2", 2)],
        "canonical_id string, doc_id long")
    got = {(r["canonical_id"], r["dim"]): (r["n_docs"], r["sum_q6"], r["mean_q6"])
           for r in entity_centroids(linked, emb).collect()}
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.where(F.col("vec_id") < 3).collect()}
    for ent, ids in (("E1", [0, 1]), ("E2", [2])):
        q = np.stack([np.floor(vecs[i] * 1e6).astype(np.int64) for i in ids])
        for d in range(q.shape[1]):
            s = int(q[:, d].sum())
            assert got[(ent, d)] == (len(ids), s, int(np.floor(s / len(ids))))


def test_passage_dups_finds_shared_window(spark):
    """Two docs sharing an aligned 20-token passage are flagged at
    exactly that window; unique windows never appear."""
    from ehr_relation_extraction_spark.functions.textstats import (
        passage_dups)

    shared = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, shared + " " + " ".join(f"a{i}" for i in range(20)), "s"),
         (1, shared + " " + " ".join(f"b{i}" for i in range(20)), "s"),
         (2, " ".join(f"c{i}" for i in range(40)), "s")],
        "doc_id long, text string, source string")
    rows = passage_dups(docs).collect()
    assert {(r["doc_id"], r["win_start"]) for r in rows} == {(0, 0), (1, 0)}
    assert all(r["n_docs_sharing"] == 2 for r in rows)


def test_alias_review_queue_and_decisions(spark):
    """Review queue holds only the gray band; decisions override the
    automatic gate in both directions."""
    from ehr_relation_extraction_spark.operators.linking import (
        apply_alias_reviews, review_queue)
    from ehr_relation_extraction_spark.config import (
        ACCEPT_FUZZY_JACCARD_PCT, GAZETTEER)

    hi = ACCEPT_FUZZY_JACCARD_PCT * 10_000
    rows = [
        ("autoacc", 1000, "aliasA", "T", "C1", 9, 10, hi + 5, 1),
        ("grayone", 1000, "aliasB", "T", "C2", 8, 11, hi - 5, 1),
        ("tooweak", 1000, "aliasC", "T", "C3", 2, 20,
         (ACCEPT_FUZZY_JACCARD_PCT - 20) * 10_000, 1),
    ]
    fuzzy = spark.createDataFrame(
        rows, "surface string, n_occur long, alias string, ent_type string, "
              "canonical_id string, n_inter int, n_union int, "
              "jaccard_micro6 long, cand_rank int")

    q = review_queue(fuzzy)
    assert [r["surface"] for r in q.collect()] == ["grayone"]

    decisions = spark.createDataFrame(
        [("grayone", "T", "accept"), ("autoacc", "T", "reject")],
        "surface string, ent_type string, decision string")
    gaz = apply_alias_reviews(fuzzy, decisions)
    extra = set(gaz) - set(GAZETTEER)
    assert ("grayone", "T", "C2") in extra      # human accept wins
    assert ("autoacc", "T", "C1") not in extra  # human reject wins
    assert ("tooweak", "T", "C3") not in extra  # unreviewed weak stays out

    # no decisions -> exactly the automatic gate
    none = spark.createDataFrame(
        [], "surface string, ent_type string, decision string")
    auto = set(apply_alias_reviews(fuzzy, none)) - set(GAZETTEER)
    assert auto == {("autoacc", "T", "C1")}


def test_triple_history_intervals(spark):
    """+/-/+ on one key yields two intervals (closed then open);
    never-retracted keys stay current."""
    from ehr_relation_extraction_spark.operators.triples import (
        triple_history)

    rows = [
        ("u1", "S", "p", "O", "+", 1), ("u1", "S", "p", "O", "-", 3),
        ("u1", "S", "p", "O", "+", 5),
        ("u2", "X", "p", "Y", "+", 2),
    ]
    d = spark.createDataFrame(
        rows, "url string, subj string, pred string, obj string, "
              "op string, crawl_seq int")
    got = {(r["url"], r["seq_from"]): (r["seq_to"], r["is_current"])
           for r in triple_history(d).collect()}
    assert got == {("u1", 1): (3, 0), ("u1", 5): (-1, 1),
                   ("u2", 2): (-1, 1)}


def test_entity_neighbors_rank_matches_numpy(spark):
    from ehr_relation_extraction_spark.operators.linking import (
        entity_neighbors)

    # 3 entities on 2 dims: A ~ B (same direction), C orthogonal-ish
    cents = spark.createDataFrame(
        [("A", 0, 100), ("A", 1, 10), ("B", 0, 90), ("B", 1, 12),
         ("C", 0, 5), ("C", 1, 200)],
        "canonical_id string, dim int, mean_q6 long")
    got = {(r["ent_a"], r["rank"]): r["ent_b"]
           for r in entity_neighbors(cents, top_k=2).collect()}
    assert got[("A", 1)] == "B" and got[("A", 2)] == "C"
    assert got[("B", 1)] == "A"
    vals = {r["ent_b"]: r for r in entity_neighbors(cents, top_k=2)
            .where(F.col("ent_a") == "A").collect()}
    assert vals["B"]["dot_q"] == 100 * 90 + 10 * 12
    assert vals["B"]["norm_a_q"] == 100 * 100 + 10 * 10


def test_triangle_counts_hand_graph(spark):
    """K4 minus an edge: two triangles; shared-edge nodes sit in
    both."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        triangle_counts)

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("b", "d"), ("c", "d"),
         ("c", "b")],  # duplicate reversed edge must not double-count
        "src string, dst string")
    got = {r["node"]: r["n_triangles"] for r in
           triangle_counts(edges).collect()}
    assert got == {"a": 1, "b": 2, "c": 2, "d": 1}


def test_simhash_near_dups_identical_docs(spark):
    """Identical texts have hamming 0 and are always candidates
    (pigeonhole guarantees a shared band)."""
    from ehr_relation_extraction_spark.operators import dedup as dd

    t = "the quick brown fox jumps over the lazy dog near a barn"
    docs = spark.createDataFrame(
        [(0, t, "s"), (1, t, "s"),
         (2, "completely different words about spark plans and shuffles "
             "in a large distributed analytics engine", "s")],
        "doc_id long, text string, source string")
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in dd.simhash_near_dups(docs).collect()}
    assert got.get((0, 1)) == 0
    assert (0, 2) not in got and (1, 2) not in got


def test_entity_first_seen_hand(spark):
    from ehr_relation_extraction_spark.operators.linking import (
        entity_first_seen)

    day0 = 1704067200 // 86400
    linked = spark.createDataFrame(
        [("E1", 0), ("E1", 86400 * 2), ("E2", 86400 * 2), ("E3", 86400 * 2)],
        "canonical_id string, doc_id long")
    got = {r["first_day"]: r["n_new_entities"]
           for r in entity_first_seen(linked).collect()}
    assert got == {day0: 1, day0 + 2: 2}


def test_url_normalize_idempotent(spark):
    """normalize(normalize(u)) == normalize(u) over a messy grab-bag
    (idempotence is the canonicalization contract)."""
    from ehr_relation_extraction_spark.functions.urls import url_normalize

    urls = [
        "HTTP://Host.EX:80/a/b/?z=1&utm_x=2#f",
        "https://h.ex//a//",
        "https://h.ex:443",
        "http://h.ex/?b=2&a=1&a=0",
        "ftp://H.EX:21/x/",
        "https://h.ex/p?ref=spam&gclid=g",
        "https://h.ex/p?",
        "https://h.ex/#only-frag",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url_raw string")
    once = url_normalize(df).select(
        F.col("url_norm").alias("url_raw"))
    twice = url_normalize(once)
    for r in twice.collect():
        assert r["url_norm"] == r["url_raw"], r


def test_dup_clusters_partition_invariant(spark):
    from ehr_relation_extraction_spark.operators import dedup as dd

    docs = _mini_docs(spark)
    a = sorted(map(tuple, dd.dup_clusters(docs).collect()))
    b = sorted(map(tuple, dd.dup_clusters(docs.repartition(5)).collect()))
    assert a == b


def test_new_ops_degenerate_inputs(spark):
    """Empty/tiny inputs must not crash and must return the right
    empty/singleton shapes."""
    from ehr_relation_extraction_spark.functions.textstats import (
        boilerplate_strip, passage_dups)
    from ehr_relation_extraction_spark.operators import dedup as dd
    from ehr_relation_extraction_spark.operators.graph_algos import (
        triangle_counts)
    from ehr_relation_extraction_spark.operators.triples import (
        triple_history)

    one = spark.createDataFrame(
        [(0, "just a few short tokens", "h")],
        "doc_id long, text string, source string")
    # shorter than the window -> no passages at all
    assert passage_dups(one).count() == 0
    # single doc: its lines are 100% of the host but < min_docs
    got = boilerplate_strip(one).first()
    assert got["n_boiler_lines"] == 0 and got["text_clean"] == one.first()["text"]
    # no near-dup pairs -> every doc is its own singleton cluster
    rows = dd.dup_clusters(one).collect()
    assert rows[0]["cluster_size"] == 1 and rows[0]["is_canonical"] == 1
    # graph with no triangles -> empty
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    assert triangle_counts(e).count() == 0
    # delta stream with only retractions -> no intervals
    d = spark.createDataFrame(
        [("u", "s", "p", "o", "-", 1)],
        "url string, subj string, pred string, obj string, "
        "op string, crawl_seq int")
    assert triple_history(d).count() == 0


def test_curate_corpus_end_to_end(spark):
    """The full curation cascade: every doc gets exactly one verdict,
    every drop stage fires on the fixture, kept docs and only kept
    docs feed the packed sequences."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from curate_corpus import curate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    verdicts, sequences, summary = curate(spark, docs, seq_len=256,
                                          epochs=5)
    assert summary["n_docs"] == 500
    assert summary["kept"] == verdicts.where(F.col("keep") == 1).count()
    # round-3: the documents fixture has NO url column, so the url
    # stage is skipped+flagged instead of dropping docs on synthetic
    # keys (round-2 advisory); the real-url path is covered in
    # tests/test_round3_fixes.py
    assert summary["url_stage"] == "skipped_no_url_column"
    assert "url_duplicate" not in summary["dropped_by_reason"]
    for stage in ("near_duplicate", "too_short",
                  "low_diversity", "not_english"):
        assert summary["dropped_by_reason"].get(stage, 0) > 0, stage
    assert summary["kept"] + sum(
        summary["dropped_by_reason"].values()) == 500
    # sequences only contain kept docs, and all kept docs are packed
    kept_ids = {r["doc_id"] for r in verdicts.where(F.col("keep") == 1)
                .collect()}
    seq_ids = {r["doc_id"] for r in
               sequences.select("doc_id").dropDuplicates().collect()}
    assert seq_ids == kept_ids
    assert summary["n_sequences"] > 0


def test_url_normalize_combinatorial_invariants(spark):
    """One job over the full mess lattice (scheme case x host case x
    port x path slashes x param order/tracking x fragment): output is
    idempotent, fragment-free, lowercase-host, tracking-free, and
    params arrive sorted."""
    import itertools

    from ehr_relation_extraction_spark.functions.urls import url_normalize

    urls = []
    for scheme, host, port, path, query, frag in itertools.product(
            ["https", "HTTPS", "http"],
            ["a.ex", "A.Ex", "WWW.A.EX"],
            ["", ":443", ":80", ":8080"],
            ["", "/", "/p", "/p/", "/p//", "/p/q"],
            ["", "?b=2&a=1", "?utm_source=x", "?a=1&utm_x=2&fbclid=f",
             "?ref=r&keep=1"],
            ["", "#frag"]):
        urls.append(f"{scheme}://{host}{port}{path}{query}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "url_raw string")
    once = url_normalize(df).select("url_raw", "url_norm")
    rows = once.collect()
    for r in rows:
        n = r["url_norm"]
        assert "#" not in n, r
        assert "utm_" not in n and "fbclid" not in n and "ref=" not in n, r
        host_part = n.split("://")[1].split("/")[0]
        assert host_part == host_part.lower(), r
        scheme_out = n.split("://")[0]
        # only the SCHEME-DEFAULT port is stripped; :80 on https (a
        # real non-default port) must survive
        if scheme_out == "https":
            assert ":443" not in n, r
        if scheme_out == "http":
            assert not host_part.endswith(":80"), r
        if "?" in n:
            params = n.split("?", 1)[1].split("&")
            assert params == sorted(params), r
    # idempotence over the whole lattice in one second job
    again = url_normalize(
        once.select(F.col("url_norm").alias("url_raw")))
    bad = again.where(F.col("url_norm") != F.col("url_raw")).collect()
    assert not bad, bad[:5]
