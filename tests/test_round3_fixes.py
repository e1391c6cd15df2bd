"""Round-3 regression tests for the round-2 advisory + judge nits:
accepted-alias cap enforcement, empty-training-fold guard, containment
threshold sourced from config, curation CLI url-stage gating."""

from __future__ import annotations

import pytest


def test_accepted_alias_cap_fires(spark):
    """The gazetteer-expansion collect is bounded by an ENFORCED cap:
    a synthetic over-limit accepted set raises instead of flooding the
    driver (round-2 judge nit 2)."""
    from ehr_relation_extraction_spark.operators import linking

    fuzzy = spark.createDataFrame(
        [(f"surf{i}", f"alias{i}", "Topic", f"topic:{i}", 900_000, 1)
         for i in range(25)],
        "surface string, alias string, ent_type string, "
        "canonical_id string, jaccard_micro6 long, cand_rank int")
    ok = linking._collect_bounded_aliases(
        linking.accepted_fuzzy_aliases(fuzzy), cap=25)
    assert len(ok) == 25
    with pytest.raises(ValueError, match="ACCEPTED_ALIAS_CAP"):
        linking._collect_bounded_aliases(
            linking.accepted_fuzzy_aliases(fuzzy), cap=10)


def test_quality_classifier_empty_fold_raises(spark):
    """An empty training fold names itself in a clear ValueError
    instead of a ZeroDivisionError on epoch 1 (round-2 advisory)."""
    from ehr_relation_extraction_spark.functions.quality_model import (
        quality_training_frame, train_quality_classifier)

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "en", "s", 44)],
        "doc_id long, text string, lang string, source string, n_chars long")
    empty = quality_training_frame(docs).limit(0)
    with pytest.raises(ValueError, match="empty training fold"):
        train_quality_classifier(empty, epochs=1)


def test_containment_default_tracks_config(spark):
    """verify_containment's default threshold is the config constant,
    so editing CONTAINMENT_THRESHOLD_PCT cannot silently desync the
    Spark side from the DuckDB oracle (round-2 advisory)."""
    import inspect

    from ehr_relation_extraction_spark import config
    from ehr_relation_extraction_spark.operators.dedup import (
        verify_containment)

    sig = inspect.signature(verify_containment)
    assert (sig.parameters["threshold_pct"].default
            == config.CONTAINMENT_THRESHOLD_PCT)


def test_curation_cli_skips_url_stage_without_urls(spark):
    """curate() must NOT drop documents on synthesized url keys when
    the corpus has no url column (round-2 advisory medium): the stage
    is skipped and flagged, and no doc carries reason url_duplicate."""
    from scripts.curate_corpus import curate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(60)
    verdicts, _, summary = curate(spark, docs, seq_len=128, epochs=3)
    assert summary["url_stage"] == "skipped_no_url_column"
    assert "url_duplicate" not in summary["dropped_by_reason"]


def test_curation_cli_url_stage_on_real_urls(spark):
    """With a REAL url column the stage runs: tracking-param/case
    variants of one url collapse to one kept doc, and distinct urls
    survive."""
    from pyspark.sql import functions as F

    from scripts.curate_corpus import curate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(60)
    # doc 0..2 share one canonical url (messy variants); the rest are
    # distinct
    url = (F.when(F.col("doc_id") == 0,
                  F.lit("https://a.ex/page?utm_source=x"))
           .when(F.col("doc_id") == 1, F.lit("HTTPS://A.EX:443/page"))
           .when(F.col("doc_id") == 2, F.lit("https://a.ex/page/"))
           .otherwise(F.concat(F.lit("https://b.ex/"), F.col("doc_id"))))
    verdicts, _, summary = curate(spark, docs.withColumn("url", url),
                                  seq_len=128, epochs=3)
    assert summary["url_stage"] == "ran"
    dup = verdicts.where(F.col("reason") == "url_duplicate") \
        .select("doc_id").collect()
    assert sorted(r["doc_id"] for r in dup) == [1, 2]


def test_ivf_topk_candidates_and_recall(spark):
    """ivf_topk's neighbors must come from the probed cells only, and
    with nprobe == n_cells it must EQUAL brute force restricted to the
    same k (probing every cell = no approximation)."""
    from ehr_relation_extraction_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full = sim.ivf_topk(emb, n_cells=4, nprobe=4, k=3, n_queries=12)
    brute = sim.brute_force_topk(emb, n_queries=12, k=3)
    got = {(r["query_id"], r["rank"], r["neighbor_id"])
           for r in full.collect()}
    want = {(r["query_id"], r["rank"], r["neighbor_id"])
            for r in brute.collect()}
    assert got == want

    # nprobe < n_cells: every neighbor's cell is one of the query's
    # probed cells (the candidate-generation invariant)
    res = sim.ivf_topk(emb, n_cells=4, nprobe=2, k=3, n_queries=12)
    asg = {r["vec_id"]: r["cell"]
           for r in sim.ivf_assign(emb, 4).collect()}
    probed = {}
    for r in res.collect():
        probed.setdefault(r["query_id"], set()).add(asg[r["neighbor_id"]])
    assert all(len(cells) <= 2 for cells in probed.values())


def test_ppr_fixed_seed_locality(spark):
    """PPR sanity on a hand chain a->b->c (c dangling, mass returns
    to the seed): the seed outranks everything, rank decays with hop
    distance, and nodes unreachable from the seed get zero.  (A cycle
    would NOT decay monotonically — mass rotates; 60 rounds damp
    the impulse-start transient to ~0.85^60.)"""
    from ehr_relation_extraction_spark.operators.graph_algos import ppr_fixed

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")],
        "src string, dst string")
    r = {row["node"]: row["rank_u"]
         for row in ppr_fixed(edges, "a", n_iter=60).collect()}
    assert r["a"] > r["b"] > r["c"] > 0
    assert r["x"] == 0 and r["y"] == 0


def test_ppr_fixed_repartition_deterministic(spark):
    """Integer fixed-point: identical output under different
    partitionings (the property the exact oracle relies on)."""
    from ehr_relation_extraction_spark.operators.graph_algos import ppr_fixed

    rows = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    edges = spark.createDataFrame(rows, "src string, dst string")
    a = sorted(map(tuple, ppr_fixed(edges, "n0").collect()))
    b = sorted(map(tuple,
                   ppr_fixed(edges.repartition(13), "n0").collect()))
    assert a == b


def test_split_span_layers_properties():
    """Greedy layering: layers are overlap-free, order-deterministic,
    and depth-2 nesting fits in 2 layers."""
    from ehr_relation_extraction_spark.functions.perceptron import (
        split_span_layers)

    spans = [("T", 0, 5), ("T", 3, 8), ("T", 8, 12), ("T", 20, 25),
             ("T", 22, 30)]
    layers = split_span_layers(spans, 2)
    assert sorted(layers[0] + layers[1]) == sorted(spans)  # none dropped
    for lay in layers:
        for (_, s1, e1), (_, s2, e2) in zip(lay, lay[1:]):
            assert s2 >= e1  # overlap-free within a layer


def test_cascade_pattern_union_restores_quirk_spans(spark):
    """The pattern-rule union must restore the mid-token regex spans
    ('0 k' out of '30 km') that token-aligned chunks cannot encode:
    with it, the perfect-teacher cascade reproduces the rule pipeline
    EXACTLY (F1 = 1.0); without it, recall drops below 1."""
    from ehr_relation_extraction_spark.config import GAZETTEER
    from ehr_relation_extraction_spark.functions.perceptron import (
        channel_names, teacher_channel_labels)
    from ehr_relation_extraction_spark.operators.evaluate import prf_triples
    from ehr_relation_extraction_spark.operators.model_ner import (
        decode_chunks)
    from ehr_relation_extraction_spark.oracle.fixtures import pages_df
    from ehr_relation_extraction_spark.plans.pipeline import (
        build, build_cascade)

    chs = channel_names(tuple(sorted({g[1] for g in GAZETTEER})))

    def perfect_channels(text, toks):
        out = set()
        for c in chs:
            out.update(decode_chunks(teacher_channel_labels(text, toks, c)))
        return sorted(out)

    held_out = pages_df(spark, n_pages=120).where("doc_id >= 90")
    gold = build(held_out).triples.localCheckpoint()
    with_rules = prf_triples(
        gold, build_cascade(held_out, chunk_fn=perfect_channels)
        .triples).first()
    assert with_rules["f1_micro6"] == 1_000_000
    without = prf_triples(
        gold, build_cascade(held_out, chunk_fn=perfect_channels,
                            include_pattern_rules=False).triples).first()
    assert without["r_micro6"] < 1_000_000


def test_pair_classifier_generalizes_via_affixes():
    """Char-ngram affix features (round-2 roadmap thread): a teacher
    whose rule depends on surface MORPHOLOGY (attr suffix) must
    transfer to held-out pairs with surfaces never seen in training —
    exactly what full-surface features alone cannot do."""
    from ehr_relation_extraction_spark.functions.perceptron import (
        PairClassifier)

    def rows_for(stems):
        out = []
        for i, stem in enumerate(stems):
            # positive: attr carries the 'ment' suffix; negative: 'able'
            out.append(("Topic-Money", 10 + i % 5, "spark",
                        stem + "ment", 0, 20))
            out.append(("Topic-Money", 10 + i % 5, "spark",
                        stem + "able", 0, 20))
        return out

    train_stems = [f"alpha{i}" for i in range(40)]
    test_stems = [f"zz{i}q" for i in range(20)]  # disjoint surfaces
    tr = rows_for(train_stems)
    labels = [1 if r[3].endswith("ment") else 0 for r in tr]
    model = PairClassifier().train(tr, labels, epochs=5)

    te = rows_for(test_stems)
    want = [1 if r[3].endswith("ment") else 0 for r in te]
    got = [model.predict(r) for r in te]
    acc = sum(a == b for a, b in zip(got, want)) / len(want)
    assert acc >= 0.95, f"held-out unseen-surface accuracy {acc:.3f}"


def test_redirect_chain_resolution_pointer_doubling(spark):
    """Redirect chains resolve to their sink in O(log L) rounds; a
    cycle is flagged unresolved instead of looping; cross-host chains
    collapse url groups through the redirect graph."""
    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark.functions.urls import (
        canonical_url_groups_with_redirects, resolve_redirect_chains)

    # one 12-hop chain, one 2-hop chain, one 2-cycle
    chain = [(f"https://h.ex/{i}", f"https://h.ex/{i + 1}")
             for i in range(12)]
    edges = chain + [("https://a.ex/x", "https://b.ex/y"),
                     ("https://c.ex/1", "https://c.ex/2"),
                     ("https://c.ex/2", "https://c.ex/1")]
    rdf = spark.createDataFrame(edges, "src_url string, dst_url string")
    res = {r["url"]: (r["final_url"], r["unresolved"])
           for r in resolve_redirect_chains(rdf).collect()}
    assert res["https://h.ex/0"] == ("https://h.ex/12", 0)
    assert res["https://h.ex/5"] == ("https://h.ex/12", 0)
    assert res["https://a.ex/x"] == ("https://b.ex/y", 0)
    assert res["https://c.ex/1"][1] == 1  # cycle flagged
    assert res["https://c.ex/2"][1] == 1

    # cross-host dedup: two docs under different hosts + one under the
    # chain head all collapse onto the chain sink's group
    docs = spark.createDataFrame(
        [(1, "https://h.ex/0?utm_source=x"),   # normalizes to chain head
         (2, "HTTPS://H.EX:443/12"),           # already the sink
         (3, "https://a.ex/x/"),               # cross-host redirect
         (4, "https://b.ex/y"),                # the cross-host target
         (5, "https://other.ex/solo")],
        "doc_id long, url string")
    g = {r["doc_id"]: (r["final_url"], r["is_canonical"])
         for r in canonical_url_groups_with_redirects(docs, rdf).collect()}
    assert g[1] == ("https://h.ex/12", 1)
    assert g[2] == ("https://h.ex/12", 0)
    assert g[3] == ("https://b.ex/y", 1)
    assert g[4] == ("https://b.ex/y", 0)
    assert g[5][1] == 1


def test_duplicated_spans_merges_adjacent_windows(spark):
    """The span-merge postpass: two docs sharing a 40-token passage
    (3 overlapping duplicated windows at stride 10) report ONE maximal
    span covering it, not 3 window fragments; non-adjacent duplicated
    regions stay separate spans."""
    from ehr_relation_extraction_spark.functions.textstats import (
        duplicated_spans)

    shared_a = " ".join(f"aa{i:02d}" for i in range(40))
    shared_b = " ".join(f"bb{i:02d}" for i in range(20))
    # NOTE: exact window dedup matches only stride-congruent offsets
    # (the Lee-et-al trade); the fixture keeps both occurrences
    # stride-aligned
    uniq = lambda tag, n: " ".join(f"{tag}{i:03d}" for i in range(n))
    # doc 1: sharedA at tokens [0,40) and sharedB at [70,90)
    # doc 2: same passages at different offsets
    docs = spark.createDataFrame(
        [(1, shared_a + " " + uniq("u", 30) + " " + shared_b),
         (2, uniq("v", 10) + " " + shared_a + " " + uniq("w", 20)
          + " " + shared_b)],
        "doc_id long, text string")
    spans = {(r["doc_id"], r["span_start"], r["span_end"])
             for r in duplicated_spans(docs, win=20, stride=10).collect()}
    by_doc = {}
    for d, s, e in spans:
        by_doc.setdefault(d, []).append((s, e))
    # doc 1: sharedA -> one span starting at 0 covering ~40 tokens;
    # sharedB starts at 70 and is 20 tokens -> its own span
    d1 = sorted(by_doc[1])
    assert d1[0][0] == 0 and d1[0][1] >= 40
    assert len(d1) == 2 and d1[1][0] >= 60
    # doc 2 has both spans too, shifted
    assert len(sorted(by_doc[2])) == 2


def test_trained_ivf_codebook_improves_quantization(spark):
    """Lloyd-trained codebook (NEXT.md thread): training is
    partition-deterministic (bit-identical codebook after
    repartition), the update loop only ships n_cells x dim quantized
    means to the driver, and the trained codebook's quantization
    objective (sum of best-centroid cosine, the thing Lloyd descends)
    is at least the seeded codebook's.  ivf_topk composes with the
    trained codebook unchanged."""
    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = sim.train_ivf_codebook(emb, n_cells=4, rounds=3)
    cb2 = sim.train_ivf_codebook(emb.repartition(7), n_cells=4, rounds=3)
    assert cb == cb2  # bit-deterministic under repartitioning

    def objective(codebook=None):
        a = sim.ivf_assign(emb, 4, codebook=codebook) \
            .select("vec_id", "cell")
        base = sim._with_norm(emb.select("vec_id", "embedding"),
                              "embedding")
        if codebook is None:
            cents = (base.where(F.col("vec_id") < 4)
                     .select(F.col("vec_id").alias("cell"),
                             F.col("_v").alias("_cv"),
                             F.col("_norm").alias("_cn")))
        else:
            cents = sim._codebook_frame(spark, codebook)
        j = (a.join(base, "vec_id").join(cents, "cell")
             .select((sim._dot(F.col("_v"), F.col("_cv"))
                      / (F.col("_norm") * F.col("_cn"))).alias("s")))
        return j.agg(F.sum("s")).first()[0]

    assert objective(cb) >= objective(None) - 1e-9

    res = sim.ivf_topk(emb, n_cells=4, nprobe=2, k=3, n_queries=12,
                       codebook=cb)
    assert res.count() > 0 and res.columns == [
        "query_id", "rank", "neighbor_id", "sim_micro6"]


def test_ivf_index_prunes_partitions_and_matches_inline(spark, tmp_path):
    """The persisted IVF index: probed cells land in PartitionFilters
    (unprobed cells' files never open), and the indexed search returns
    EXACTLY what the inline ivf_topk computes with the same codebook."""
    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = sim.train_ivf_codebook(emb, n_cells=4, rounds=2)
    path = str(tmp_path / "ivf_index")
    sim.build_ivf_index(emb, path, cb)

    queries = emb.where(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = sim.ivf_topk_indexed(spark, path, queries, nprobe=2, k=3)
    want = sim.ivf_topk(emb, n_cells=4, nprobe=2, k=3, n_queries=12,
                        codebook=cb)
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))

    # partition pruning: the index scan carries cell as a
    # PartitionFilter (directory-level pruning of unprobed cells)
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = [seg.split("]")[0] for seg in plan.split("PartitionFilters")[1:]]
    assert any("cell" in seg for seg in pf), plan


def test_cut_duplicated_spans_keeps_first_occurrence(spark):
    """Span cutting: the globally-first holder of a shared passage
    keeps its text intact; later holders lose exactly the duplicated
    token range; unique docs pass through untouched."""
    from ehr_relation_extraction_spark.functions.textstats import (
        cut_duplicated_spans)

    shared = " ".join(f"aa{i:02d}" for i in range(20))
    uniq = lambda tag, n: " ".join(f"{tag}{i:03d}" for i in range(n))
    docs = spark.createDataFrame(
        [(1, shared + " " + uniq("u", 15)),
         (2, shared + " " + uniq("v", 10)),   # loses the shared head
         (3, uniq("w", 25))],                 # untouched
        "doc_id long, text string")
    out = {r["doc_id"]: (r["text_clean"], r["n_cut_tokens"])
           for r in cut_duplicated_spans(docs, win=20, stride=10).collect()}
    assert out[1][1] == 0 and out[1][0].startswith("aa00")
    assert out[2][1] == 20 and out[2][0] == uniq("v", 10)
    assert out[3][1] == 0 and out[3][0] == uniq("w", 25)


def test_curation_cut_spans_stage_fires_on_shared_passages(spark):
    """--cut-spans end-to-end: on a corpus where kept docs share a
    long passage (the synthetic quote), the stage removes tokens from
    every holder but the first and reports the count; without the
    flag, texts pass through intact."""
    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark.functions.textstats import (
        with_synth_quote)
    from scripts.curate_corpus import curate

    docs = with_synth_quote(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(120))
    _, _, summary = curate(spark, docs, seq_len=256, epochs=3,
                           cut_spans=True)
    assert summary["span_cut_tokens"] > 0
    _, _, plain = curate(spark, docs, seq_len=256, epochs=3)
    assert plain["span_cut_tokens"] == 0


def test_incremental_cc_matches_full_recompute(spark):
    """update_components folds new edges into an existing assignment
    via label-star edges — result must EQUAL full CC over (old ∪ new)
    edges, including merges of previously-separate components and
    isolated new nodes; unmerged components keep their id."""
    from ehr_relation_extraction_spark.operators.graph_algos import (
        update_components)
    from ehr_relation_extraction_spark.operators.linking import (
        connected_components)

    old_edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "g"), ("h", "h2")],
        "src string, dst string")
    old_nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",), ("f",), ("g",),
         ("h",), ("h2",), ("iso",)], "node string")
    assign = connected_components(old_edges, old_nodes)

    # merge {a,b,c} with {d,e}; attach brand-new node x to {f,g};
    # leave {h,h2} and iso untouched
    new_edges = spark.createDataFrame(
        [("c", "d"), ("x", "f")], "src string, dst string")
    upd = {r["node"]: r["component"]
           for r in update_components(assign, new_edges).collect()}

    full = {r["node"]: r["component"] for r in connected_components(
        old_edges.unionByName(new_edges),
        old_nodes.union(spark.createDataFrame([("x",)], "node string"))
    ).collect()}
    assert upd == full
    assert upd["a"] == upd["e"] == "a"      # merged, min-id kept
    assert upd["x"] == upd["f"] == "f"      # new node joined
    assert upd["h"] == upd["h2"] == "h"     # untouched id stable
    assert upd["iso"] == "iso"


def test_round3_ops_degenerate_inputs(spark):
    """Degenerate-input hardening for the round-3 operators: empty
    frames, sub-codebook-size corpora, cycle-only redirect graphs,
    and span ops on empty text must return empty/sane results, never
    raise."""
    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark.functions.textstats import (
        cut_duplicated_spans, duplicated_spans)
    from ehr_relation_extraction_spark.functions.urls import (
        resolve_redirect_chains)
    from ehr_relation_extraction_spark.operators import similarity as sim
    from ehr_relation_extraction_spark.operators.graph_algos import (
        ppr_fixed, update_components)

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert duplicated_spans(empty_docs).count() == 0
    assert cut_duplicated_spans(empty_docs).count() == 0

    one_doc = spark.createDataFrame([(1, "")], "doc_id long, text string")
    out = cut_duplicated_spans(one_doc).collect()
    assert out[0]["n_cut_tokens"] == 0

    empty_redirects = spark.createDataFrame(
        [], "src_url string, dst_url string")
    assert resolve_redirect_chains(empty_redirects).count() == 0
    cycle_only = spark.createDataFrame(
        [("https://a/1", "https://a/2"), ("https://a/2", "https://a/1")],
        "src_url string, dst_url string")
    rows = resolve_redirect_chains(cycle_only).collect()
    assert rows and all(r["unresolved"] == 1 for r in rows)

    # corpus smaller than the codebook: every vector still assigned
    tiny = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").where("vec_id < 3")
    assert sim.ivf_assign(tiny, n_cells=8).count() == 3
    cb = sim.train_ivf_codebook(tiny, n_cells=8, rounds=1)
    # seed truncates to the available vectors
    assert len(cb) == 3

    empty_edges = spark.createDataFrame([], "src string, dst string")
    assert ppr_fixed(empty_edges, "nope").count() == 0
    empty_assign = spark.createDataFrame(
        [], "node string, component string")
    assert update_components(empty_assign, empty_edges).count() == 0


def test_multichannel_save_load_roundtrip(tmp_path):
    """The saved model artifact reloads to a BIT-IDENTICAL predictor
    (sparse emission triplets reconstruct the dense arrays exactly)."""
    import numpy as np

    from ehr_relation_extraction_spark.functions.perceptron import (
        load_multichannel, save_multichannel, train_multi_on_teacher)

    texts = [
        "pad spark value zz01xx zz02xx key tail",
        "pad vector line qq01xx qq02xx row tail",
        "pad slow merge dup order 2 k tail",
    ] * 10
    mt = train_multi_on_teacher([(t,) for t in texts], epochs=3)
    p = str(tmp_path / "model.npz")
    save_multichannel(mt, p)
    mt2 = load_multichannel(p)
    assert mt2.ent_types == mt.ent_types
    for c in mt.ent_types:
        a, b = mt.taggers[c], mt2.taggers[c]
        assert np.array_equal(
            a.avg_em if a.avg_em is not None else a.w_em, b.avg_em)
        assert np.array_equal(
            a.avg_tr if a.avg_tr is not None else a.w_tr, b.avg_tr)
    toks = "pad spark value zz01xx key tail".split()
    assert mt.chunks(toks) == mt2.chunks(toks)
