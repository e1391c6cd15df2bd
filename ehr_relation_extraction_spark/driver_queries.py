"""Engine-side callables for the driver contract (__spark_entry__.py).

Each callable takes ``(spark, sf_dir)`` and returns a DataFrame whose
columns/types/values match the DuckDB statement of the same key in
``oracle.sqlgen.ORACLE`` (driver verifies at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import perturbed_gazetteer
from .functions import textstats as ts
from .plans.pipeline import build_from_documents
from .operators import dedup as dd
from .operators import evaluate as ev
from .operators import events as evt
from .operators import linking as lk
from .operators import ner, similarity as sim, triples as tri_op
from .oracle.sqlgen import ORACLE


_FRAME_CACHE: dict[tuple[int, str, bool], object] = {}


def _frames(spark: SparkSession, sf_dir: str, perturbed: bool = False):
    """Per-session frame cache: the driver runs ~30 queries against the
    same sf_dir; reusing the lazy frames lets Spark reuse the persisted
    pairing input instead of re-running NER per query."""
    key = (id(spark), sf_dir, perturbed)
    if key not in _FRAME_CACHE:
        gaz = perturbed_gazetteer() if perturbed else None
        _FRAME_CACHE[key] = build_from_documents(spark, sf_dir, gazetteer=gaz)
    return _FRAME_CACHE[key]


def q_extract_text(spark, sf_dir) -> DataFrame:
    p = _frames(spark, sf_dir).pages
    return p.select(
        "doc_id", "url",
        F.sha2(F.col("text"), 256).alias("text_sha"),
        F.length("text").alias("n_chars"),
    )


def q_tokenize(spark, sf_dir) -> DataFrame:
    return ner.tokenize_df(_frames(spark, sf_dir).pages)


def q_shards(spark, sf_dir) -> DataFrame:
    return _frames(spark, sf_dir).shards


def q_mentions(spark, sf_dir) -> DataFrame:
    m = _frames(spark, sf_dir).mentions
    return m.select("doc_id", "url", "ent_id", "ent_type", "start",
                    F.col("end").alias("end"), "ent_text")


def q_candidates(spark, sf_dir) -> DataFrame:
    c = _frames(spark, sf_dir).candidates
    return c.select("doc_id", "url", "shard_id", "rel_id", "rel_type",
                    "hub_id", "hub_text", "hub_start", "hub_end",
                    "attr_id", "attr_type", "attr_text", "attr_start",
                    "attr_end", "gap")


def q_relations(spark, sf_dir) -> DataFrame:
    r = _frames(spark, sf_dir).relations
    return r.select("doc_id", "url", "rel_id", "rel_type", "hub_id",
                    "attr_id", "gap")


def q_triples(spark, sf_dir) -> DataFrame:
    return _frames(spark, sf_dir).triples.select(
        "doc_id", "url", "subj_id", "subj", "pred", "obj")


def q_relations_fused(spark, sf_dir) -> DataFrame:
    """Single-Arrow-pass production path; same oracle as `relations`."""
    from .plans.fused import fused_relations

    return fused_relations(_frames(spark, sf_dir).pages).select(
        "doc_id", "url", "rel_id", "rel_type", "hub_id", "attr_id", "gap")


def q_triples_fused(spark, sf_dir) -> DataFrame:
    """Single-Arrow-pass production path; same oracle as `triples`."""
    from .plans.fused import fused_triples

    return fused_triples(_frames(spark, sf_dir).pages).select(
        "doc_id", "url", "subj_id", "subj", "pred", "obj")


def q_wide_table(spark, sf_dir) -> DataFrame:
    t = _frames(spark, sf_dir).triples
    return tri_op.wide_table(t).select(
        "url", "subj_id", "subj", "pred", "obj_texts", "n_objs")


def q_distinct_subjects(spark, sf_dir) -> DataFrame:
    return tri_op.distinct_subjects(_frames(spark, sf_dir).triples)


_LINK_CACHE: dict[tuple[int, str], tuple] = {}


def _linked(spark, sf_dir):
    fr = _frames(spark, sf_dir)
    gaz = lk.gazetteer_df(spark)
    return fr, lk.link_mentions(fr.mentions, gaz), gaz


def _linked_components(spark, sf_dir):
    """linked mentions + CC components, materialized once per session —
    the CC fixpoint loop feeds four queries (components, nodes, edges,
    and everything downstream of edges)."""
    key = (id(spark), sf_dir)
    if key not in _LINK_CACHE:
        fr, linked, gaz = _linked(spark, sf_dir)
        linked = linked.localCheckpoint()
        comps = lk.canonical_components(linked).localCheckpoint()
        _LINK_CACHE[key] = (fr, linked, gaz, comps)
    return _LINK_CACHE[key]


def q_link_mentions(spark, sf_dir) -> DataFrame:
    _, linked, _ = _linked(spark, sf_dir)
    return linked.select("doc_id", "url", "ent_id", "ent_type", "start",
                         "end", "ent_text", "canonical_id")


def q_fuzzy_alias_candidates(spark, sf_dir) -> DataFrame:
    """Long-tail linking: trigram-blocked fuzzy match of out-of-gazetteer
    corpus tokens to aliases (broadcast posting list, integer Jaccard)."""
    toks = ner.tokenize_df(_frames(spark, sf_dir).pages)
    return lk.fuzzy_alias_candidates(toks).select(
        "surface", "n_occur", "alias", "ent_type", "canonical_id",
        "n_inter", "n_union", "jaccard_micro6", "cand_rank")


def q_mentions_second_pass(spark, sf_dir) -> DataFrame:
    """Second linking pass: accepted fuzzy aliases (rank-1, Jaccard >=
    ACCEPT_FUZZY_JACCARD_PCT) extend the gazetteer, then mention
    detection re-runs with the expanded dictionary — new long-tail
    surfaces become first-class mentions.  Same quirk-faithful kernel;
    the oracle replicates the greedy separator-consumption scan with a
    recursive CTE because expanded aliases can overlap base aliases of
    the same type (unigram shadows the bigram it prefixes)."""
    fr = _frames(spark, sf_dir)
    toks = ner.tokenize_df(fr.pages)
    gaz2 = lk.expanded_gazetteer(lk.fuzzy_alias_candidates(toks))
    m = ner.detect_mentions_df(fr.pages, gazetteer=gaz2)
    return m.select("doc_id", "url", "ent_id", "ent_type", "start",
                    F.col("end").alias("end"), "ent_text")


def q_canonical_components(spark, sf_dir) -> DataFrame:
    _, _, _, comps = _linked_components(spark, sf_dir)
    return comps.select("node", "component")


def q_graph_nodes(spark, sf_dir) -> DataFrame:
    _, linked, _, comps = _linked_components(spark, sf_dir)
    return lk.materialize_nodes(linked, comps).select(
        "canonical_id", "component", "ent_type", "n_mentions")


_GRAPH_CACHE: dict[tuple[int, str], DataFrame] = {}


def q_graph_edges(spark, sf_dir) -> DataFrame:
    """Materialized once per (session, sf_dir): the CC fixpoint loop is
    the expensive part and five downstream graph queries (degrees,
    related topics, pagerank, bfs, edges) all start from this table —
    exactly the stage-checkpoint pattern the production pipeline uses
    (plans/stages.py), applied to the driver-contract path."""
    key = (id(spark), sf_dir)
    if key not in _GRAPH_CACHE:
        fr, linked, gaz, comps = _linked_components(spark, sf_dir)
        _GRAPH_CACHE[key] = lk.materialize_edges(
            fr.triples, linked, comps, gaz).select(
            "subj_node", "pred", "obj_node", "weight").localCheckpoint()
    return _GRAPH_CACHE[key]


def _eval_frames(spark, sf_dir):
    return _frames(spark, sf_dir), _frames(spark, sf_dir, perturbed=True)


_PRF_COLS = ["tp", "n_gold", "n_pred", "fp", "fn",
             "p_micro6", "r_micro6", "f1_micro6",
             # E5 completion (Track2-evaluate-ver4.py:244-257): tn is 0
             # by construction for tags/relations (:299,:338), so
             # specificity degenerates to 0 and auc to recall/2 —
             # replicated, not "fixed".
             "tn", "specificity_micro6", "auc_micro6"]


def q_eval_mentions(spark, sf_dir) -> DataFrame:
    gold, sys_ = _eval_frames(spark, sf_dir)
    return ev.prf_by_type(gold.mentions, sys_.mentions).select(
        "ent_type", *_PRF_COLS)


def q_eval_mentions_micro(spark, sf_dir) -> DataFrame:
    gold, sys_ = _eval_frames(spark, sf_dir)
    return ev.micro_totals(ev.prf_by_type(gold.mentions, sys_.mentions)) \
             .select(*_PRF_COLS)


def q_eval_triples(spark, sf_dir) -> DataFrame:
    gold, sys_ = _eval_frames(spark, sf_dir)
    return ev.prf_triples(gold.triples, sys_.triples).select(*_PRF_COLS)


def q_eval_relations_lenient(spark, sf_dir) -> DataFrame:
    """E2 relation match on arg spans, lenient (overlap) mode, with the
    E3 pare-down — the span-level complement of the triple-identity
    eval (a system relation with drifted-but-overlapping arg spans
    still scores)."""
    gold, sys_ = _eval_frames(spark, sf_dir)
    return ev.prf_relations(gold.relations, sys_.relations,
                            strict=False).select("rel_type", *_PRF_COLS)


def q_eval_triples_by_pred(spark, sf_dir) -> DataFrame:
    gold, sys_ = _eval_frames(spark, sf_dir)
    return ev.prf_triples_by_pred(gold.triples, sys_.triples).select(
        "pred", *_PRF_COLS)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_iob2_labels(spark, sf_dir) -> DataFrame:
    from .operators.model_ner import iob2_labels_df

    return iob2_labels_df(_frames(spark, sf_dir).pages).select(
        "doc_id", "url", "tok_idx", "token", "label")


def _labeled_candidates(spark, sf_dir):
    from .operators import pairs as pairs_op

    gold_frames = _frames(spark, sf_dir, perturbed=True)
    gold = gold_frames.relations.select(
        "url", "rel_type",
        F.col("hub_start").alias("a_start"), F.col("hub_end").alias("a_end"),
        F.col("attr_start").alias("b_start"), F.col("attr_end").alias("b_end"))
    return pairs_op.flag_gold(_frames(spark, sf_dir).candidates, gold)


def q_candidates_labeled(spark, sf_dir) -> DataFrame:
    return _labeled_candidates(spark, sf_dir).select(
        "doc_id", "url", "rel_id", "rel_type", "gap", "label")


def q_eval_re_accuracy(spark, sf_dir) -> DataFrame:
    """E8 (biobert_re/metrics.py:14-29): binary classification metrics
    for the RE stage over teacher-labeled candidate pairs — accuracy,
    binary F1, acc_and_f1, plus non-degenerate specificity/AUC (tn is
    real here, unlike the span evals)."""
    return ev.re_classification_metrics(
        _labeled_candidates(spark, sf_dir)).select(
        "n", "tp", "tn", "n_pred", "n_gold", "fp", "fn",
        "p_micro6", "r_micro6", "f1_micro6", "specificity_micro6",
        "auc_micro6", "acc_micro6", "acc_and_f1_micro6")


def q_candidates_sampled(spark, sf_dir) -> DataFrame:
    from .operators import pairs as pairs_op

    return pairs_op.sample_negatives(_labeled_candidates(spark, sf_dir)) \
        .select("url", "rel_id", "rel_type", "label")


def q_mentions_model(spark, sf_dir) -> DataFrame:
    """Model-NER path (IOB2 teacher labels -> viterbi-free decode ->
    spans); the SQL oracle mirrors the decode semantics."""
    from .operators.model_ner import model_mentions_df

    return model_mentions_df(_frames(spark, sf_dir).pages).select(
        "doc_id", "url", "ent_id", "ent_type", "start", "end", "ent_text")



def q_mentions_perceptron(spark, sf_dir) -> DataFrame:
    """Learned perceptron NER stage, VALUE-EXACT as of round 5: the
    full-batch multiclass perceptron (functions/batch_perceptron.py —
    the same hashed feature template as the production structured
    perceptron, greedy decode, synchronous full-batch updates) trains
    INSIDE the query on the teacher labels of docs < 200 and predicts
    over the whole corpus, all in pure DataFrame algebra (no Python in
    the loop).  The oracle unrolls the training epochs as chained
    DuckDB CTEs (oracle/sqlgen._batch_perceptron_sql) and
    bit-reproduces weights, predictions, and decoded spans — integer
    arithmetic end-to-end.  The PRODUCTION learned stage (averaged
    structured perceptron + CRF Viterbi + distributed parameter
    mixing, functions/perceptron.py) stays pytest-gated (held-out span
    F1 >= 0.95, cascade gates, train_cascade CLI); its sequential
    per-doc updates wrap a dynamic program per training step, which no
    relational unrolling can express — the round-4 verdict's
    sanctioned trade (reduced-variant-with-exact-oracle beats
    rows-only)."""
    from .functions.batch_perceptron import batch_perceptron_mentions

    fr = _frames(spark, sf_dir)
    toks = ner.tokenize_df(fr.pages)
    return batch_perceptron_mentions(fr.pages, toks, fr.mentions,
                                     train_docs_below=200, epochs=3)


def q_host_stats(spark, sf_dir) -> DataFrame:
    fr = _frames(spark, sf_dir)
    host = F.substring_index(F.substring_index("url", "//", -1), "/", 1)
    m = fr.mentions.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_m"))
    t = fr.triples.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_t"))
    per_doc = (fr.pages.select("doc_id", host.alias("host"))
               .join(m, "doc_id", "left").join(t, "doc_id", "left")
               .fillna(0, ["n_m", "n_t"]))
    return per_doc.groupBy("host").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum("n_m").cast("long").alias("n_mentions"),
        F.sum("n_t").cast("long").alias("n_triples"))


def q_dedup_exact(spark, sf_dir) -> DataFrame:
    return dd.exact_dedup(_docs(spark, sf_dir)).select(
        "doc_id", "text_md5", "group_size", "is_canonical")


def q_minhash_signatures(spark, sf_dir) -> DataFrame:
    return dd.minhash_signatures(dd.shingles(_docs(spark, sf_dir))).select(
        "doc_id", "seed", "minhash")


def q_lsh_bands(spark, sf_dir) -> DataFrame:
    sh = dd.shingles(_docs(spark, sf_dir))
    return dd.lsh_bands(dd.minhash_signatures(sh)).select(
        "doc_id", "band", "band_sig")


def q_near_duplicates(spark, sf_dir) -> DataFrame:
    sh = dd.shingles(_docs(spark, sf_dir))
    pairs = dd.lsh_candidate_pairs(dd.lsh_bands(dd.minhash_signatures(sh)))
    return dd.verify_jaccard(pairs, sh).select(
        "doc_a", "doc_b", "n_inter", "n_union", "jaccard_pct")


def q_simhash(spark, sf_dir) -> DataFrame:
    return dd.simhash(_docs(spark, sf_dir)).select("doc_id", "simhash")


def q_quality_features(spark, sf_dir) -> DataFrame:
    return ts.quality_features(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "n_chars", "n_distinct_tokens",
        "n_stopwords", "avg_token_len_x100")


def q_lang_id(spark, sf_dir) -> DataFrame:
    return ts.lang_id(_docs(spark, sf_dir)).select(
        "doc_id", "lang", "pred_lang", "is_match")


def q_token_count_bpe(spark, sf_dir) -> DataFrame:
    return ts.token_count_bpe(_docs(spark, sf_dir)).select(
        "doc_id", "n_ws_tokens", "n_bpe_ish")


def q_top_terms_tfidf(spark, sf_dir) -> DataFrame:
    return ts.top_terms_tfidf(_docs(spark, sf_dir)).select(
        "doc_id", "rank", "term", "tf", "df", "tfidf_micro6")


def q_fingerprint(spark, sf_dir) -> DataFrame:
    return ts.fingerprint(_docs(spark, sf_dir)).select(
        "doc_id", "fingerprint", "n_shingles")


def q_similarity_topk(spark, sf_dir) -> DataFrame:
    return sim.brute_force_topk(_emb(spark, sf_dir)).select(
        "query_id", "rank", "neighbor_id", "sim_micro6")


def q_ann_buckets(spark, sf_dir) -> DataFrame:
    return sim.sign_buckets(_emb(spark, sf_dir)).select(
        "vec_id", "bucket", "bucket_size")


def q_srp_buckets(spark, sf_dir) -> DataFrame:
    """Signed-random-projection LSH buckets (md5-derived hyperplanes,
    same contract as sign_buckets)."""
    return sim.srp_buckets(_emb(spark, sf_dir)).select(
        "vec_id", "bucket", "bucket_size")


def q_ann_topk(spark, sf_dir) -> DataFrame:
    return sim.ann_topk(_emb(spark, sf_dir)).select(
        "query_id", "rank", "neighbor_id", "sim_micro6")


def q_eval_mentions_lenient(spark, sf_dir) -> DataFrame:
    gold, sys_ = _eval_frames(spark, sf_dir)
    return ev.prf_by_type(gold.mentions, sys_.mentions, strict=False).select(
        "ent_type", *_PRF_COLS)


def q_eval_mentions_by_doc(spark, sf_dir) -> DataFrame:
    """Per-document eval table (the evaluator's per-doc pass before
    the corpus roll-up)."""
    gold, sys_ = _eval_frames(spark, sf_dir)
    return ev.prf_by_doc(gold.mentions, sys_.mentions).select(
        "url", *_PRF_COLS)


def q_eval_mentions_macro(spark, sf_dir) -> DataFrame:
    gold, sys_ = _eval_frames(spark, sf_dir)
    return ev.macro_by_doc(gold.mentions, sys_.mentions).select(
        "n_docs", "macro_f1_micro6")


def q_sessionize(spark, sf_dir) -> DataFrame:
    ev_df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return evt.sessionize(ev_df).select(
        "user_id", "session_id", "n_events", "first_ts", "last_ts",
        "duration_sec")


def q_embedding_near_dups(spark, sf_dir) -> DataFrame:
    return sim.embedding_near_dups(_emb(spark, sf_dir)).select(
        "vec_a", "vec_b", "sim_micro6")


def q_ivf_assign(spark, sf_dir) -> DataFrame:
    return sim.ivf_assign(_emb(spark, sf_dir)).select(
        "vec_id", "cell", "cell_size")


def q_ivf_topk(spark, sf_dir) -> DataFrame:
    """IVF nprobe search: coarse-assign the corpus, probe each query's
    top-2 cells, exact-cosine rerank — the query half of the IVF index
    (completes ivf_assign + ivf_centroids into a usable ANN path)."""
    return sim.ivf_topk(_emb(spark, sf_dir)).select(
        "query_id", "rank", "neighbor_id", "sim_micro6")


def q_dup_clusters(spark, sf_dir) -> DataFrame:
    """Near-dup pairs -> connected components -> keep/drop verdict;
    the is_canonical = 1 rows are the deduplicated corpus."""
    return dd.dup_clusters(_docs(spark, sf_dir)).select(
        "doc_id", "cluster_id", "cluster_size", "is_canonical")


def q_containment_dups(spark, sf_dir) -> DataFrame:
    """Asymmetric containment over the same LSH candidates — catches
    short-doc-inside-long-doc boilerplate that Jaccard misses."""
    sh = dd.shingles(_docs(spark, sf_dir))
    pairs = dd.lsh_candidate_pairs(dd.lsh_bands(dd.minhash_signatures(sh)))
    return dd.verify_containment(pairs, sh).select(
        "doc_a", "doc_b", "n_inter", "n_small", "containment_pct")


def q_ivf_centroids(spark, sf_dir) -> DataFrame:
    """One k-means Lloyd step (the IVF codebook trainer): quantized
    integer per-cell mean embedding, order-independent sums."""
    return sim.ivf_centroid_update(_emb(spark, sf_dir)).select(
        "cell", "dim", "n_vecs", "sum_q6", "mean_q6")


def _pq_codebooks_r1(spark, sf_dir):
    """PQ codebooks after exactly ONE Lloyd round (m=8, k=16) — the
    driver-verifiable training depth: the oracle unrolls seed ->
    assign -> quantized-mean update in SQL.  Deeper training keeps its
    serial-replica bit-parity gate in tests/test_pq.py."""
    from .operators import pq

    return pq.train_pq_codebooks(_emb(spark, sf_dir), m=8, k=16, rounds=1)


def q_pq_codebook(spark, sf_dir) -> DataFrame:
    """One per-subspace Lloyd update step from the PQ seed codebooks
    (the product-quantization twin of ivf_centroids): integer
    micro-unit sums per (sub, code, dim), order-independent."""
    from .operators import pq

    return pq.pq_centroid_update(_emb(spark, sf_dir)).select(
        "sub", "code", "dim", "n_subvecs", "sum_q6", "mean_q6")


def q_pq_codes(spark, sf_dir) -> DataFrame:
    """The compressed corpus: every vector's m one-byte PQ codes under
    the round-1 codebooks (long form — one row per subspace), the
    table an ADC scan reads instead of raw embeddings."""
    from .operators import pq

    enc = pq.pq_encode(_emb(spark, sf_dir), _pq_codebooks_r1(spark, sf_dir))
    return enc.select("vec_id",
                      F.posexplode("codes").alias("sub", "code"))


def q_pq_search(spark, sf_dir) -> DataFrame:
    """ADC top-k over the PQ codes: per-query LUT equi-join + one sum
    aggregate — the scan never touches raw embeddings (Jegou et al.
    PAMI'11); 20 queries, k=5, quantized distances exact cross-engine."""
    from .operators import pq

    return pq.pq_topk(_emb(spark, sf_dir), _pq_codebooks_r1(spark, sf_dir),
                      n_queries=20, k=5).select(
        "query_id", "rank", "neighbor_id", "adist_q6")


def q_url_canonical(spark, sf_dir) -> DataFrame:
    """Deterministically-messy urls -> normalize -> canonical groups."""
    from .functions.urls import canonical_url_groups

    return canonical_url_groups(_docs(spark, sf_dir)).select(
        "doc_id", "url_raw", "url_norm", "n_variants", "is_canonical")


def q_boilerplate_strip(spark, sf_dir) -> DataFrame:
    """Host-level line dedup over deterministically synthesized
    nav/footer lines (fixture text has no newlines)."""
    return ts.boilerplate_strip(ts.with_synth_lines(
        _docs(spark, sf_dir))).select(
        "doc_id", "n_lines", "n_boiler_lines", "text_clean")


def q_kg_support(spark, sf_dir) -> DataFrame:
    """Evidence aggregation per canonical triple (docs, hosts, crawl
    day range)."""
    return tri_op.kg_support(_frames(spark, sf_dir).triples).select(
        "subj", "pred", "obj", "n_docs", "n_hosts", "first_day",
        "last_day")


def q_entity_centroids(spark, sf_dir) -> DataFrame:
    """Quantized mean doc embedding per canonical entity (KG <->
    vector-index bridge)."""
    _, linked, _ = _linked(spark, sf_dir)
    return lk.entity_centroids(linked, _emb(spark, sf_dir)).select(
        "canonical_id", "dim", "n_docs", "sum_q6", "mean_q6")


def q_passage_dups(spark, sf_dir) -> DataFrame:
    """Windowed exact passage dedup over the synthesized shared-quote
    fixture (every 7th doc carries the quote)."""
    return ts.passage_dups(ts.with_synth_quote(_docs(spark, sf_dir))).select(
        "doc_id", "win_start", "passage_hash", "n_docs_sharing")


def q_entity_neighbors(spark, sf_dir) -> DataFrame:
    """Top-5 related entities per entity by centroid cosine (integer
    dot products; float only in the rank ORDER, identical IEEE ops
    both engines)."""
    _, linked, _ = _linked(spark, sf_dir)
    cents = lk.entity_centroids(linked, _emb(spark, sf_dir))
    return lk.entity_neighbors(cents).select(
        "ent_a", "ent_b", "dot_q", "norm_a_q", "norm_b_q", "rank")


def q_triple_history(spark, sf_dir) -> DataFrame:
    """SCD2 versioned KG over a deterministic synthetic crawl-delta
    stream (operators/triples.synth_crawl_deltas)."""
    t = _frames(spark, sf_dir).triples
    return tri_op.triple_history(tri_op.synth_crawl_deltas(t)).select(
        "url", "subj", "pred", "obj", "seq_from", "seq_to", "is_current")


def q_simhash_near_dups(spark, sf_dir) -> DataFrame:
    """Hamming-ball near-dup pairs via simhash bit-band blocking."""
    return dd.simhash_near_dups(_docs(spark, sf_dir)).select(
        "doc_a", "doc_b", "hamming")


def q_graph_triangles(spark, sf_dir) -> DataFrame:
    """Per-node triangle counts over the entity CO-MENTION graph
    (entities sharing a document) — denser than the triple graph, the
    standard cohesion check for canonicalization quality."""
    from .operators.graph_algos import triangle_counts

    _, linked, _ = _linked(spark, sf_dir)
    a = linked.select("doc_id", F.col("canonical_id").alias("src"))
    b = linked.select("doc_id", F.col("canonical_id").alias("dst"))
    edges = (a.join(b, "doc_id")
             .where(F.col("src") < F.col("dst"))
             .select("src", "dst").dropDuplicates())
    return triangle_counts(edges).select("node", "n_triangles")


def q_duplicated_spans(spark, sf_dir) -> DataFrame:
    """Maximal duplicated token spans per doc (the span-merge step of
    Lee-et-al substring dedup) over the shared-quote fixture."""
    return ts.duplicated_spans(
        ts.with_synth_quote(_docs(spark, sf_dir))).select(
        "doc_id", "span_start", "span_end", "n_windows")


def q_cut_spans(spark, sf_dir) -> DataFrame:
    """The CUT step of Lee-et-al substring dedup: rebuild each doc
    with non-first-occurrence duplicated passages removed."""
    return ts.cut_duplicated_spans(
        ts.with_synth_quote(_docs(spark, sf_dir))).select(
        "doc_id", "text_clean", "n_cut_tokens")


def q_substring_spans(spark, sf_dir) -> DataFrame:
    """THRESHOLD-EXACT substring-dedup spans: the stride-1 form of
    duplicated_spans (operators/substrings.substring_dups, min_len=20)
    — every >=L-token cross-doc repeat is covered exactly, the
    ExactSubstr guarantee of Lee et al. at threshold L."""
    from .operators.substrings import substring_dups

    return substring_dups(ts.with_synth_quote(_docs(spark, sf_dir)),
                          min_len=20).select(
        "doc_id", "span_start", "span_end", "n_windows")


def q_cut_substrings(spark, sf_dir) -> DataFrame:
    """The CUT step at stride 1 (operators/substrings.
    cut_substring_dups): rebuild each doc with every
    non-first-occurrence >=L-token repeat removed — threshold-exact,
    unlike the strided q_cut_spans approximation."""
    from .operators.substrings import cut_substring_dups

    return cut_substring_dups(ts.with_synth_quote(_docs(spark, sf_dir)),
                              min_len=20).select(
        "doc_id", "text_clean", "n_cut_tokens")


def q_maximal_repeats(spark, sf_dir) -> DataFrame:
    """Suffix-array repeat mining (operators/substrings.
    maximal_repeats): distributed prefix-doubling suffix ranks +
    binary-lifting LCP over SA-adjacent suffix pairs, emitting every
    adjacent pair whose LCP >= 20 tokens — the any-threshold path the
    windowed-exact operators cannot express."""
    from .operators.substrings import maximal_repeats

    return maximal_repeats(_docs(spark, sf_dir), min_len=20).select(
        "doc_a", F.col("idx_a").cast("int").alias("idx_a"),
        "doc_b", F.col("idx_b").cast("int").alias("idx_b"), "lcp")


def q_lpa_communities(spark, sf_dir) -> DataFrame:
    """Community detection over the entity co-occurrence graph:
    deterministic synchronous label propagation
    (operators/graph_algos.label_propagation, 5 rounds, min-label
    tie-break), oracle = the rounds unrolled as chained CTEs."""
    from .operators.graph_algos import label_propagation

    _, linked, _ = _linked(spark, sf_dir)
    edges = lk.overlap_edges(linked)
    nodes = linked.select(
        F.col("canonical_id").alias("node")).dropDuplicates()
    return label_propagation(edges, nodes, n_rounds=5)


def q_url_redirects(spark, sf_dir) -> DataFrame:
    """Redirect-chain resolution (pointer doubling) over the
    synthesized redirect fixture — chains, a multi-target malformed
    src, 3-cycles, and a chain feeding a cycle.  Cyclic rows are
    flagged unresolved and map to themselves so both engines agree on
    every row byte-for-byte."""
    from .functions import urls as u

    r = u.resolve_redirect_chains(u.synth_redirect_edges(
        _docs(spark, sf_dir)))
    return r.select(
        "url",
        F.when(F.col("unresolved") == 1, F.col("url"))
        .otherwise(F.col("final_url")).alias("final_url"),
        "unresolved")


def q_cc_update(spark, sf_dir) -> DataFrame:
    """INCREMENTAL connected-components maintenance: split the entity
    overlap edges deterministically, build the assignment from the
    "old" 3/4, fold the "new" 1/4 in via update_components (label-star
    reduction — never re-touches the old edge set), and check the
    result equals full CC over all edges (the oracle)."""
    from .operators.graph_algos import update_components

    _, linked, _ = _linked(spark, sf_dir)
    edges = lk.overlap_edges(linked).localCheckpoint()
    nodes = linked.select(
        F.col("canonical_id").alias("node")).dropDuplicates()
    is_new = F.pmod(F.xxhash64("src", "dst"), F.lit(4)) == 0
    assign = lk.connected_components(edges.where(~is_new), nodes)
    return update_components(assign, edges.where(is_new)).select(
        "node", "component")


def q_entity_first_seen(spark, sf_dir) -> DataFrame:
    """KG growth curve: new canonical entities per crawl day."""
    _, linked, _ = _linked(spark, sf_dir)
    return lk.entity_first_seen(linked).select(
        "first_day", "n_new_entities")


def q_quality_model(spark, sf_dir) -> DataFrame:
    """Learned quality classifier distilled from the rule gate —
    trains INSIDE the query (bit-deterministic distributed full-batch
    GD, functions/quality_model.py).  VALUE-EXACT driver check as of
    round 5: the oracle unrolls all 60 GD epochs as chained DuckDB
    CTEs (oracle/sqlgen._quality_model_sql), replicating the
    integer-quantized gradient aggregate and the exact IEEE fold order
    of the float weight updates; the pytest gate additionally asserts
    held-out agreement >= 0.85 and beats the majority-class
    baseline."""
    from .functions.quality_model import quality_model_verdicts

    return quality_model_verdicts(_docs(spark, sf_dir)).select(
        "doc_id", "label", "pred_keep", "margin_micro6", "is_train")


def q_graph_degrees(spark, sf_dir) -> DataFrame:
    ge = q_graph_edges(spark, sf_dir)
    nodes = (ge.select(F.col("subj_node").alias("node"))
             .union(ge.select(F.col("obj_node").alias("node")))
             .dropDuplicates())
    o = ge.groupBy("subj_node").agg(
        F.count(F.lit(1)).cast("long").alias("out_deg"),
        F.sum("weight").cast("long").alias("out_weight"))
    i = ge.groupBy("obj_node").agg(
        F.count(F.lit(1)).cast("long").alias("in_deg"),
        F.sum("weight").cast("long").alias("in_weight"))
    return (nodes.join(o.withColumnRenamed("subj_node", "node"), "node", "left")
            .join(i.withColumnRenamed("obj_node", "node"), "node", "left")
            .fillna(0, ["out_deg", "in_deg", "out_weight", "in_weight"])
            .select("node", "out_deg", "in_deg", "out_weight", "in_weight"))


def q_related_topics(spark, sf_dir) -> DataFrame:
    """Topic~Topic 2-hop through a shared attribute node (the KG is
    bipartite, so this is the meaningful 2-path)."""
    ge = q_graph_edges(spark, sf_dir).select("subj_node", "obj_node") \
        .dropDuplicates()
    a = ge.alias("a")
    b = ge.alias("b")
    return (a.join(b, F.col("a.obj_node") == F.col("b.obj_node"))
            .where(F.col("a.subj_node") < F.col("b.subj_node"))
            .groupBy(F.col("a.subj_node").alias("topic_a"),
                     F.col("b.subj_node").alias("topic_b"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared")))


def q_component_sizes(spark, sf_dir) -> DataFrame:
    """Component-size histogram over the canonicalized entity graph —
    the standard health check for entity resolution (a giant component
    signals over-merging)."""
    _, _, _, comps = _linked_components(spark, sf_dir)
    sz = comps.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("size"))
    return sz.groupBy("size").agg(
        F.count(F.lit(1)).cast("long").alias("n_components"))


def q_graph_bfs(spark, sf_dir) -> DataFrame:
    """BFS hop distances from the lexicographically smallest graph node
    — an ITERATIVE algorithm with an exact recursive-CTE oracle."""
    from .operators.graph_algos import bfs_distances

    ge = q_graph_edges(spark, sf_dir)
    source = ge.select(
        F.least(F.min("subj_node"), F.min("obj_node")).alias("s")
    ).first()["s"]
    edges = ge.selectExpr("subj_node AS src", "obj_node AS dst")
    return bfs_distances(edges, source).select("node", "dist")


def q_pagerank(spark, sf_dir) -> DataFrame:
    """Integer fixed-point PageRank (graph_algos.pagerank_fixed): the
    fixed-round recurrence is pure BIGINT arithmetic, so the DuckDB
    oracle (rounds unrolled as chained CTEs) matches bit-exactly —
    this moved from a rows-only check to a full value check."""
    from .operators.graph_algos import pagerank_fixed

    edges = q_graph_edges(spark, sf_dir).selectExpr(
        "subj_node AS src", "obj_node AS dst", "weight")
    return pagerank_fixed(edges, n_iter=5).select("node", "rank_micro6")


def q_graph_ppr(spark, sf_dir) -> DataFrame:
    """Personalized PageRank (random walk with restart) from the
    lexicographically smallest node — BFS's seed rule — giving a
    principled related-entity ranking that decays with hop distance.
    Integer fixed-point like pagerank, so the oracle is value-exact."""
    from .operators.graph_algos import ppr_fixed

    ge = q_graph_edges(spark, sf_dir)
    # bounded driver collect: a 1-row global-min aggregate (the seed
    # node id), same cap class as graph_bfs's seed pick
    source = ge.select(
        F.least(F.min("subj_node"), F.min("obj_node")).alias("s")
    ).first()["s"]
    edges = ge.selectExpr("subj_node AS src", "obj_node AS dst", "weight")
    return ppr_fixed(edges, source, n_iter=5).select("node", "rank_micro6")


def q_events_asof(spark, sf_dir) -> DataFrame:
    """As-of join (last-touch attribution): purchases to most recent
    prior click per user; window formulation, not a range join."""
    ev_df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return evt.asof_attribution(ev_df).select(
        "purchase_id", "user_id", "purchase_us", "click_id", "click_us",
        "lag_us")


def q_cooccurrence_pmi(spark, sf_dir) -> DataFrame:
    return ts.cooccurrence_pmi(_docs(spark, sf_dir)).select(
        "tok_a", "tok_b", "n_docs_a", "n_docs_b", "n_docs_ab",
        "pmi_ratio_micro6")


def q_corpus_split(spark, sf_dir) -> DataFrame:
    return ts.train_dev_test_split(_docs(spark, sf_dir)).select(
        "doc_id", "bucket", "split")


def q_repetition_features(spark, sf_dir) -> DataFrame:
    """Gopher-style duplicate-3-gram repetition signal per doc."""
    return ts.repetition_features(_docs(spark, sf_dir)).select(
        "doc_id", "n_grams", "n_distinct_grams", "dup_frac_micro6")


def q_decontaminate(spark, sf_dir) -> DataFrame:
    """Train/test 8-gram decontamination: per train-split doc, count
    shingles shared with any test-split doc (eval-leakage filter)."""
    return ts.decontaminate(_docs(spark, sf_dir)).select(
        "doc_id", "n_ngrams", "n_contaminated", "n_test_docs",
        "contaminated")


def q_mixture_sample(spark, sf_dir) -> DataFrame:
    """Per-source training-mixture sampling (stable md5 buckets, no
    rand()); every doc with its auditable (bucket, rate, kept)."""
    return ts.mixture_sample(_docs(spark, sf_dir)).select(
        "doc_id", "source", "bucket", "rate_pct", "kept")


def q_pack_sequences(spark, sf_dir) -> DataFrame:
    """GPT-style packing of each source's docs into 128-token training
    sequences (per-source cumsum + explode; no sequential loop)."""
    return ts.pack_sequences(_docs(spark, sf_dir), 128).select(
        "source", "seq_id", "doc_id", "doc_tok_start", "doc_tok_end",
        "seq_tok_start", "seq_tok_end", "n_tokens")


def q_media_features(spark, sf_dir) -> DataFrame:
    """Binary-column featurization through the Arrow/mapInPandas path:
    documents stand in as media (payload = utf-8 bytes), the stub
    featurizer emits one u16 feature row per (media, index) — exactly
    reproducible in SQL, so the multimodal plumbing is oracle-checked."""
    from .operators.multimodal import media_u16_features

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"))
    return media_u16_features(media).select(
        "media_id", "n_bytes", "feat_idx", "feat_u16")


def q_source_stats(spark, sf_dir) -> DataFrame:
    """Per-source doc/token totals + exact p50/p90 token counts."""
    return ts.source_stats(_docs(spark, sf_dir)).select(
        "source", "n_docs", "total_tokens", "p50_tokens", "p90_tokens")


def q_lm_quality(spark, sf_dir) -> DataFrame:
    """CCNet-style LM quality score: mean corpus-bigram-LM probability
    per doc (integer-exact; pruned/OOV bigrams contribute 0)."""
    return ts.lm_quality(_docs(spark, sf_dir)).select(
        "doc_id", "n_pairs", "n_oov", "lm_score_micro6")


def q_corpus_export(spark, sf_dir) -> DataFrame:
    """The final export gate: train-split docs pass curation AND
    decontamination; one keep/reason verdict per train doc."""
    return ts.corpus_export(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "keep", "reason")


def q_bigram_lm(spark, sf_dir) -> DataFrame:
    return ts.bigram_lm(_docs(spark, sf_dir)).select(
        "w1", "w2", "c_bigram", "c_w1", "p_micro6")


def q_corpus_curation(spark, sf_dir) -> DataFrame:
    return ts.corpus_curation(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "keep", "reason")


def q_candidates_balanced(spark, sf_dir) -> DataFrame:
    from .operators import pairs as pairs_op

    return pairs_op.balance_classes(_labeled_candidates(spark, sf_dir)) \
        .select("url", "rel_id", "rel_type", "label", "class_rank")


def q_triples_daily(spark, sf_dir) -> DataFrame:
    """Temporal KG analytics: triples per predicate per crawl day
    (warc_ts day index) — the partition key a 10^12-doc Iceberg layout
    uses (`days(warc_ts)`, SURVEY §7.0).  Integer day index keeps the
    oracle timezone-proof."""
    fr = _frames(spark, sf_dir)
    pages_day = fr.pages.select(
        "doc_id",
        ((F.lit(1704067200) + F.col("doc_id")) / 86400)
        .cast("int").alias("day_idx"))
    return (fr.triples.join(pages_day, "doc_id")
            .groupBy("day_idx", "pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triples"),
                 F.countDistinct("url").cast("long").alias("n_pages"),
                 F.countDistinct("subj").cast("long").alias("n_subjects")))


def q_events_hourly(spark, sf_dir) -> DataFrame:
    ev_df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return evt.hourly_rollup(ev_df).select(
        "window_start", "event_type", "n", "sum_value_x100",
        "min_value", "max_value")


def q_session_funnel(spark, sf_dir) -> DataFrame:
    """Two-step in-session funnel (click -> later purchase)."""
    ev_df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return evt.session_funnel(ev_df).select(
        "n_sessions", "n_with_first", "n_converted", "conv_pct_x10000")


def q_retention_cohorts(spark, sf_dir) -> DataFrame:
    """Cohort retention over the events table: first-active-day
    cohorts x day offset -> distinct active users."""
    ev_df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return evt.retention_cohorts(ev_df).select(
        "cohort_day", "day_offset", "n_users")


def _overlap_graph(spark, sf_dir):
    """Entity OVERLAP graph (shared canonicalization edges) — the
    sparse graph lpa_communities already runs on."""
    _, linked, _ = _linked(spark, sf_dir)
    edges = lk.overlap_edges(linked)
    nodes = linked.select(
        F.col("canonical_id").alias("node")).dropDuplicates()
    return edges, nodes


def _comention_graph(spark, sf_dir):
    """Entity CO-MENTION graph (entities sharing a document) — the
    same edge set as q_graph_triangles; denser than the overlap
    graph, so truss/walk structure is non-trivial."""
    _, linked, _ = _linked(spark, sf_dir)
    a = linked.select("doc_id", F.col("canonical_id").alias("src"))
    b = linked.select("doc_id", F.col("canonical_id").alias("dst"))
    edges = (a.join(b, "doc_id").where(F.col("src") < F.col("dst"))
             .select("src", "dst").dropDuplicates())
    nodes = linked.select(
        F.col("canonical_id").alias("node")).dropDuplicates()
    return edges, nodes


def q_kcore_nodes(spark, sf_dir) -> DataFrame:
    """k-core membership over the entity overlap graph: fixed-round
    degree peel (rounds chosen past the fixpoint, pinned by
    tests/test_round6_oracles.py), oracle = the peel rounds unrolled
    as chained CTEs."""
    from .operators.graph_algos import k_core
    from .oracle.sqlgen import KCORE_ROUNDS

    edges, nodes = _overlap_graph(spark, sf_dir)
    return k_core(edges, nodes, k=2, n_rounds=KCORE_ROUNDS)


def q_ktruss_edges(spark, sf_dir) -> DataFrame:
    """k-truss edge peel over the entity co-mention graph (edge
    survives iff in >= k-2 surviving triangles); k picked so the peel
    discriminates on the near-clique fixture."""
    from .operators.graph_algos import k_truss
    from .oracle.sqlgen import KTRUSS_K, KTRUSS_ROUNDS

    edges, _ = _comention_graph(spark, sf_dir)
    return k_truss(edges, k=KTRUSS_K, n_rounds=KTRUSS_ROUNDS)


def q_entity_walks(spark, sf_dir) -> DataFrame:
    """Deterministic DeepWalk corpus over the co-mention graph
    (md5-argmin next hop), oracle = the steps unrolled in SQL."""
    from .operators.graph_algos import random_walks
    from .oracle.sqlgen import WALK_LEN, WALKS_PER_NODE

    edges, nodes = _comention_graph(spark, sf_dir)
    return random_walks(edges, nodes, walk_len=WALK_LEN,
                        walks_per_node=WALKS_PER_NODE)


def q_link_pred(spark, sf_dir) -> DataFrame:
    """Link-prediction scores (common-neighbor count + floor-scaled
    Jaccard) for every non-edge 2-hop pair of the co-mention graph."""
    from .operators.graph_algos import link_prediction

    edges, _ = _comention_graph(spark, sf_dir)
    return link_prediction(edges)


def q_rrf_fusion(spark, sf_dir) -> DataFrame:
    """Hybrid-retrieval fusion: reciprocal-rank fusion of the exact
    cosine top-k and the sign-bucket ANN top-3 for the shared query
    set (operators/similarity.rrf_fusion)."""
    emb = _emb(spark, sf_dir)
    exact = sim.brute_force_topk(emb)
    ann = sim.ann_topk(emb).where(F.col("query_id") < 50)
    return sim.rrf_fusion([exact, ann])


def q_degree_dist(spark, sf_dir) -> DataFrame:
    """Degree distribution of the entity co-mention graph — the KG
    health metric (operators/graph_algos.degree_distribution)."""
    from .operators.graph_algos import degree_distribution

    edges, _ = _comention_graph(spark, sf_dir)
    return degree_distribution(edges)


def q_walk_centrality(spark, sf_dir) -> DataFrame:
    """Walk-visit centrality from the deterministic DeepWalk corpus
    (operators/graph_algos.walk_centrality over q_entity_walks'
    walk table)."""
    from .operators.graph_algos import random_walks, walk_centrality
    from .oracle.sqlgen import WALK_LEN, WALKS_PER_NODE

    edges, nodes = _comention_graph(spark, sf_dir)
    return walk_centrality(random_walks(edges, nodes,
                                        walk_len=WALK_LEN,
                                        walks_per_node=WALKS_PER_NODE))


def q_pq_rerank(spark, sf_dir) -> DataFrame:
    """IVFADC+R-style search: exact-cosine rerank of the ADC top-50
    shortlist — raw vectors touched only for the 50 candidates/query,
    never in the corpus scan."""
    from .operators import pq

    return pq.pq_topk(_emb(spark, sf_dir), _pq_codebooks_r1(spark, sf_dir),
                      n_queries=20, k=5, rerank=50).select(
        "query_id", "rank", "neighbor_id", "sim_micro6")


def q_ivfpq_codes(spark, sf_dir) -> DataFrame:
    """The composed IVF-PQ index row (coarse cell + m residual PQ
    codes): oracle chains the ivf_assign seed assignment, an
    elementwise residual subtraction, and the PQ round-1 chain
    re-pointed at the residual frame."""
    from .operators import pq
    from .operators import similarity as sim_op

    emb = _emb(spark, sf_dir)
    seed = [[float(x) for x in r["embedding"]]
            for r in emb.orderBy("vec_id").limit(8).collect()]
    assigned = sim_op.ivf_assign(emb, 8).select("vec_id", "cell")
    resid = pq._residuals(emb, assigned, seed).localCheckpoint()
    cb1 = pq.train_pq_codebooks(resid.select("vec_id", "embedding"),
                                m=8, k=16, rounds=1)
    return pq.ivfpq_encode(emb, seed, cb1).select(
        "vec_id", "cell", F.posexplode("codes").alias("sub", "code"))


def q_textrank_tokens(spark, sf_dir) -> DataFrame:
    """TextRank keyword scores: integer fixed-point PageRank over the
    token co-occurrence (window) graph, 5 rounds unrolled in SQL."""
    return ts.textrank_keywords(_docs(spark, sf_dir))


def q_hll_shingles(spark, sf_dir) -> DataFrame:
    """Deterministic-HyperLogLog register table of the 3-gram shingle
    stream (256 registers, md5-hex-nibble rank arithmetic) — the
    mergeable distinct-shingle sketch."""
    from .functions.sketches import hll_shingle_sketch

    return hll_shingle_sketch(_docs(spark, sf_dir))


def q_cm_tokens(spark, sf_dir) -> DataFrame:
    """Count-min sketch counter table (depth 4 x width 256) of the
    whitespace token stream — salted md5 column arithmetic."""
    from .functions.sketches import cm_token_sketch

    return cm_token_sketch(_docs(spark, sf_dir))


def q_cm_token_est(spark, sf_dir) -> DataFrame:
    """Point-query audit of the count-min sketch: est_cnt (min over
    depth rows) vs true_cnt for every distinct token."""
    from .functions.sketches import cm_token_estimates

    return cm_token_estimates(_docs(spark, sf_dir))


def q_triple_snapshots(spark, sf_dir) -> DataFrame:
    """SCD2 validity intervals for every (url, subj, pred, obj) across
    a 3-snapshot recrawl schedule (operators/triples.triple_intervals —
    the SNAPSHOT-form twin of triple_history's delta-stream fold:
    timestamps instead of crawl seqs, intervals closed by the url's
    next-scheduled crawl).

    Recrawls are synthesized deterministically (single-crawl corpus):
    the url's crawl g happens at epoch 1704067200 + doc_id + g*604800
    (the established synthetic crawl clock, one week apart), and the
    triple is OBSERVED at crawl g iff the first nibble of
    md5(g|subj|pred|obj|url) >= 3 (~81%) — the same md5-presence
    device as the negative-sampling oracle.  Consecutive-crawl runs
    collapse to intervals; valid_to NULL = current."""
    from .operators.triples import triple_intervals

    tri = (_frames(spark, sf_dir).triples
           .select("doc_id", "url", "subj", "pred", "obj")
           .dropDuplicates(["url", "subj", "pred", "obj"]))
    gens = F.explode(F.sequence(F.lit(0), F.lit(2))).alias("snap_id")
    nib = F.expr(
        "instr('0123456789abcdef', substring(md5(concat("
        "CAST(snap_id AS STRING), '|', subj, '|', pred, '|', obj, '|',"
        " url)), 1, 1)) - 1")
    obs = (tri.select("url", "subj", "pred", "obj", gens)
           .where(nib >= 3)
           .select("url", F.col("snap_id").cast("int").alias("snap_id"),
                   "subj", "pred", "obj"))
    snaps = (tri.select("doc_id", "url").dropDuplicates()
             .select("doc_id", "url",
                     F.explode(F.sequence(F.lit(0), F.lit(2)))
                     .alias("snap_id"))
             .select("url", F.col("snap_id").cast("int").alias("snap_id"),
                     (F.lit(1704067200) + F.col("doc_id")
                      + F.col("snap_id") * 604800)
                     .cast("long").alias("snap_ts")))
    return triple_intervals(obs, snaps)


def q_entity_salience(spark, sf_dir) -> DataFrame:
    """Which entities each page is ABOUT: share-of-doc-mentions x
    earliness, floor-scaled (operators/linking.entity_salience)."""
    fr, linked, _ = _linked(spark, sf_dir)
    return lk.entity_salience(linked, fr.pages)


def q_pred_lift(spark, sf_dir) -> DataFrame:
    """Schema induction over the emitted KG: predicate-pair
    co-occurrence lift per subject (operators/triples.
    pred_cooccurrence)."""
    return tri_op.pred_cooccurrence(_frames(spark, sf_dir).triples)


def q_bm25_entities(spark, sf_dir) -> DataFrame:
    """BM25 document ranking for the gazetteer surface forms — which
    docs best attest each KG entity (functions/textstats.
    bm25_entity_retrieval; exact-rational k1/b, single-ln idf)."""
    gaz = lk.gazetteer_df(spark)
    return ts.bm25_entity_retrieval(_docs(spark, sf_dir),
                                    gaz.select("alias"))


def q_pred_signatures(spark, sf_dir) -> DataFrame:
    """Domain-constraint induction: per-predicate subject-type
    distribution (operators/triples.pred_signatures)."""
    fr, linked, _ = _linked(spark, sf_dir)
    return tri_op.pred_signatures(fr.triples, linked)


def q_entity_assoc(spark, sf_dir) -> DataFrame:
    """Entity association mining: document-level canonical-entity
    co-occurrence lift (operators/linking.entity_associations)."""
    _, linked, _ = _linked(spark, sf_dir)
    return lk.entity_associations(linked)


def q_pred_obj_linkage(spark, sf_dir) -> DataFrame:
    """Range-side schema induction: per-predicate share of objects
    that link into the entity dictionary (operators/triples.
    pred_obj_linkage)."""
    return tri_op.pred_obj_linkage(_frames(spark, sf_dir).triples,
                                   lk.gazetteer_df(spark))


def q_kg_neg_samples(spark, sf_dir) -> DataFrame:
    """Filtered negative samples for KG-embedding training — the
    corrupt-the-object device, bucketed md5 draw, true triples
    anti-joined away (operators/triples.kg_negative_samples)."""
    return tri_op.kg_negative_samples(_frames(spark, sf_dir).triples)


def q_doclen_hist(spark, sf_dir) -> DataFrame:
    """Per-source doc-length histogram sketch — the distribution axis
    of the sketch family (functions/sketches.doclen_hist)."""
    from .functions.sketches import doclen_hist

    return doclen_hist(_docs(spark, sf_dir))


def q_bloom_bits(spark, sf_dir) -> DataFrame:
    """The eval-set Bloom filter word table: 3-gram shingles of the
    doc_id % 17 == 0 held-out split packed into a (word, bits) table
    (2^20 bits, 32 bits/BIGINT word) — the stored/broadcast artifact
    of a 100 TB decontamination pass."""
    from .functions.sketches import bloom_eval_sketch

    return bloom_eval_sketch(_docs(spark, sf_dir))


def q_bloom_decontam(spark, sf_dir) -> DataFrame:
    """Per-training-doc decontamination verdict vs the eval Bloom
    filter, with the exact truth as the audit columns: n_flagged >=
    n_true_hits always (Bloom never false-negatives)."""
    from .functions.sketches import bloom_decontaminate

    return bloom_decontaminate(_docs(spark, sf_dir))


def q_alias_edit_links(spark, sf_dir) -> DataFrame:
    """Edit-distance alias linking: trigram-blocked candidate pairs +
    levenshtein verify over md5-derived synthetic typo surfaces."""
    toks = ner.tokenize_df(_frames(spark, sf_dir).pages)
    return lk.edit_verified_aliases(toks)


def q_clustering_coeff(spark, sf_dir) -> DataFrame:
    """Local clustering coefficient per co-mention-graph node — the
    node-level cohesion alarm for canonicalization quality
    (operators/graph_algos.clustering_coefficients)."""
    from .operators.graph_algos import clustering_coefficients

    edges, _ = _comention_graph(spark, sf_dir)
    return clustering_coefficients(edges)


def q_pred_violations(spark, sf_dir) -> DataFrame:
    """Domain-constraint enforcement: majority-subject-type election
    per predicate + violation share (operators/triples.
    pred_violations over the pred_signatures join)."""
    fr, linked, _ = _linked(spark, sf_dir)
    return tri_op.pred_violations(fr.triples, linked)


def q_pred_drift(spark, sf_dir) -> DataFrame:
    """Temporal schema drift: predicate mix per crawl micro-batch vs
    the corpus-wide mix (operators/triples.pred_drift)."""
    return tri_op.pred_drift(_frames(spark, sf_dir).triples)


def q_ntriples_export(spark, sf_dir) -> DataFrame:
    """RDF N-Triples materialization of the distinct triple set with
    provenance breadth (operators/triples.ntriples_export)."""
    return tri_op.ntriples_export(_frames(spark, sf_dir).triples)


def q_pred_cardinality(spark, sf_dir) -> DataFrame:
    """Functional-vs-multi predicate cardinality profile — the schema
    constraint every KG validator and AMIE-style miner keys its
    pruning on (operators/triples.pred_cardinality)."""
    return tri_op.pred_cardinality(_frames(spark, sf_dir).triples)


def q_object_rules(spark, sf_dir) -> DataFrame:
    """AMIE-style shared-object Horn rules p1(x,o) AND p2(z,o) =>
    comention(x,z), with the frequent-object fanout cap as the skew
    guard (operators/triples.shared_object_rules)."""
    return tri_op.shared_object_rules(_frames(spark, sf_dir).triples)


def q_entity_jaccard(spark, sf_dir) -> DataFrame:
    """Exact attribute-set Jaccard between subjects over the fanout-
    pruned (pred, obj) universe — blocked candidate generation, never
    all-pairs (operators/triples.entity_attr_jaccard)."""
    return tri_op.entity_attr_jaccard(_frames(spark, sf_dir).triples)


def q_hits_scores(spark, sf_dir) -> DataFrame:
    """Integer fixed-point HITS hubs & authorities over the directed
    KG edge graph — the companion centrality to pagerank_fixed, same
    unrolled-CTE oracle discipline (graph_algos.hits_fixed)."""
    from .operators.graph_algos import hits_fixed

    edges = q_graph_edges(spark, sf_dir).selectExpr(
        "subj_node AS src", "obj_node AS dst")
    return hits_fixed(edges, n_iter=5)


def q_kg_asof(spark, sf_dir) -> DataFrame:
    """Point-in-time KG reconstruction: the facts live one week after
    the crawl epoch, read off the SCD2 validity intervals
    (operators/triples.kg_asof over triple_intervals)."""
    return tri_op.kg_asof(q_triple_snapshots(spark, sf_dir), 1704672000)


def q_interval_conflicts(spark, sf_dir) -> DataFrame:
    """Temporal conflict detection: different object values for the
    same (url, subj, pred) whose validity windows overlap — the
    range-join consistency check (operators/triples.
    interval_conflicts)."""
    return tri_op.interval_conflicts(q_triple_snapshots(spark, sf_dir))


def q_entity_types(spark, sf_dir) -> DataFrame:
    """Node typing by majority vote over linked mentions, purity
    scored; ties break on type name (operators/linking.
    entity_type_election)."""
    _, linked, _ = _linked(spark, sf_dir)
    return lk.entity_type_election(linked)


def q_star_query(spark, sf_dir) -> DataFrame:
    """Conjunctive (star-shaped) pattern coverage — the SPARQL-BGP
    read path: subjects matching >= 2 of the top-10 most-attested
    (pred, obj) patterns, matched via a k-row broadcast
    (operators/triples.star_query_coverage)."""
    return tri_op.star_query_coverage(_frames(spark, sf_dir).triples)


def q_attr_merge_clusters(spark, sf_dir) -> DataFrame:
    """Attribute-based entity merging: connected components over the
    jac >= 0.5 attribute-Jaccard graph (operators/triples.
    attr_merge_clusters)."""
    return tri_op.attr_merge_clusters(_frames(spark, sf_dir).triples)


def q_wl_labels(spark, sf_dir) -> DataFrame:
    """Weisfeiler-Lehman structural-role fingerprints (3 rounds) over
    the entity co-mention graph, with role-class populations
    (operators/graph_algos.wl_labels)."""
    from .operators.graph_algos import wl_labels

    edges, nodes = _comention_graph(spark, sf_dir)
    return wl_labels(edges, nodes, n_rounds=3)


def q_schema_graph(spark, sf_dir) -> DataFrame:
    """Ontology induction by graph summarization: the typed quotient
    of the KG edge table, component types elected by majority vote
    (operators/linking.schema_graph)."""
    _, linked, _, comps = _linked_components(spark, sf_dir)
    return lk.schema_graph(q_graph_edges(spark, sf_dir), linked, comps)


def q_kg_churn(spark, sf_dir) -> DataFrame:
    """Per-predicate added/removed/stable claim counts between the
    week-1 and week-2 point-in-time cuts (operators/triples.kg_churn
    over the SCD2 intervals)."""
    return tri_op.kg_churn(q_triple_snapshots(spark, sf_dir),
                           1704672000, 1704672000 + 604800)


def q_hapax_objects(spark, sf_dir) -> DataFrame:
    """Open-IE noise indicator: per-predicate share of object values
    attested exactly once (operators/triples.hapax_objects)."""
    return tri_op.hapax_objects(_frames(spark, sf_dir).triples)


def q_trending_entities(spark, sf_dir) -> DataFrame:
    """Per-crawl-batch top-3 trending entities with burst lift vs the
    corpus share (operators/linking.trending_entities)."""
    _, linked, _ = _linked(spark, sf_dir)
    return lk.trending_entities(linked)


def q_graph_distances(spark, sf_dir) -> DataFrame:
    """Weighted shortest paths (5-round integer Bellman-Ford, cost =
    1e6 DIV weight) from the lexicographically smallest node — the
    weighted companion to graph_bfs (graph_algos.bellman_ford_fixed)."""
    from .operators.graph_algos import bellman_ford_fixed

    ge = q_graph_edges(spark, sf_dir)
    # bounded driver collect: a 1-row global-min aggregate (the seed
    # node id), same cap class as graph_bfs / graph_ppr's seed pick
    source = ge.select(
        F.least(F.min("subj_node"), F.min("obj_node")).alias("s")
    ).first()["s"]
    edges = ge.selectExpr("subj_node AS src", "obj_node AS dst", "weight")
    return bellman_ford_fixed(edges, source, n_rounds=5)


def q_jaccard_best_match(spark, sf_dir) -> DataFrame:
    """Reciprocal-best-match entity alignment over the blocked
    attribute-Jaccard pairs (operators/triples.jaccard_best_match)."""
    return tri_op.jaccard_best_match(_frames(spark, sf_dir).triples)


def q_warc_roundtrip(spark, sf_dir) -> DataFrame:
    """WARC/1.0 serialize -> parse round trip over the pages table
    (sources/warc.py): every header field, the ISO-28500 byte-length
    contract, and byte-identical payload recovery, checked per record
    against the page it came from."""
    from .sources.pages import pages_from_documents
    from .sources.warc import parse_warc_records, warc_records

    pages = pages_from_documents(spark, sf_dir)
    parsed = parse_warc_records(warc_records(pages))
    orig = pages.select("doc_id",
                        F.decode(F.col("html"), "utf-8").alias("_orig"))
    return (parsed.join(orig, "doc_id")
            .select("doc_id", "warc_type", "url",
                    F.unix_timestamp("warc_ts").cast("long")
                    .alias("ts_epoch"),
                    "record_id", "content_length",
                    F.sha2(F.col("payload"), 256).alias("payload_sha"),
                    F.length("payload").cast("long")
                    .alias("n_payload_chars"),
                    F.col("payload_ok").cast("int").alias("payload_ok"),
                    (F.col("payload") == F.col("_orig")).cast("int")
                    .alias("text_match")))


def q_pred_jaccard(spark, sf_dir) -> DataFrame:
    """Predicate similarity by exact subject-set Jaccard — the
    ontology-alignment companion to pred_cooccurrence's lift
    (operators/triples.pred_jaccard)."""
    return tri_op.pred_jaccard(_frames(spark, sf_dir).triples)


def q_degree_assortativity(spark, sf_dir) -> DataFrame:
    """Degree-assortativity sufficient statistics (exact BIGINT
    moments; r needs a sqrt so the sums are the oracle surface) over
    the co-mention graph (graph_algos.degree_assortativity_stats)."""
    from .operators.graph_algos import degree_assortativity_stats

    edges, _ = _comention_graph(spark, sf_dir)
    return degree_assortativity_stats(edges)


def q_community_stats(spark, sf_dir) -> DataFrame:
    """Community-quality report over the LPA partition of the entity
    co-occurrence graph: size, internal/cut edges, volume, exact
    integer conductance (graph_algos.community_stats)."""
    from .operators.graph_algos import community_stats, label_propagation

    _, linked, _ = _linked(spark, sf_dir)
    edges = lk.overlap_edges(linked)
    nodes = linked.select(
        F.col("canonical_id").alias("node")).dropDuplicates()
    labels = label_propagation(edges, nodes, n_rounds=5)
    return community_stats(edges, labels)


def q_pred_ifp(spark, sf_dir) -> DataFrame:
    """Inverse-functional predicate detection (identity keys, OWL
    IFP) — the transpose of pred_cardinality
    (operators/triples.pred_ifp)."""
    return tri_op.pred_ifp(_frames(spark, sf_dir).triples)


def q_shingle_novelty(spark, sf_dir) -> DataFrame:
    """Per-doc first-occurrence shingle novelty — the crawl-batch
    value metric (functions/textstats.shingle_novelty)."""
    from .functions.textstats import shingle_novelty

    return shingle_novelty(_docs(spark, sf_dir))


def q_host_entity_overlap(spark, sf_dir) -> DataFrame:
    """Host-pair correlation by shared canonical entities — the
    mirror/syndication/spam-farm detector, entity-fanout capped
    (operators/linking.host_entity_overlap)."""
    _, linked, _ = _linked(spark, sf_dir)
    return lk.host_entity_overlap(linked)


def q_url_recrawl_priority(spark, sf_dir) -> DataFrame:
    """Churn-driven recrawl scheduling per url over the SCD2
    intervals (operators/triples.url_recrawl_priority)."""
    return tri_op.url_recrawl_priority(q_triple_snapshots(spark, sf_dir))


def q_merge_cluster_stats(spark, sf_dir) -> DataFrame:
    """Merge-proposal quality: conductance/volume accounting over the
    thresholded Jaccard graph under the attr_merge_clusters partition
    (operators/triples.merge_cluster_stats — community_stats applied
    to a second graph+partition pair)."""
    return tri_op.merge_cluster_stats(_frames(spark, sf_dir).triples)


def q_doclen_percentiles(spark, sf_dir) -> DataFrame:
    """Exact nearest-rank p50/p90/p99 doc length per source —
    positive-only integer ceil, per-source windows
    (functions/textstats.doclen_percentiles)."""
    from .functions.textstats import doclen_percentiles

    return doclen_percentiles(_docs(spark, sf_dir))


def q_postings_lists(spark, sf_dir) -> DataFrame:
    """Inverted-index materialization: per-term delta-encoded posting
    lists with df/tf totals (functions/textstats.postings_lists)."""
    from .functions.textstats import postings_lists

    return postings_lists(_docs(spark, sf_dir))


def q_partition_agreement(spark, sf_dir) -> DataFrame:
    """Clustering-agreement evaluation: pair-level Rand decomposition
    of the LPA communities vs the connected components over the same
    overlap graph (graph_algos.partition_agreement) — recall < 1
    measures how much LPA splits components."""
    from .operators.graph_algos import (label_propagation,
                                        partition_agreement)

    _, linked, _, comps = _linked_components(spark, sf_dir)
    edges = lk.overlap_edges(linked)
    nodes = linked.select(
        F.col("canonical_id").alias("node")).dropDuplicates()
    lpa = label_propagation(edges, nodes, n_rounds=5)
    cc = comps.select("node", F.col("component").alias("label"))
    return partition_agreement(lpa, cc)


_TRUTH_CACHE: dict[tuple[int, str], tuple] = {}


def _truth(spark, sf_dir):
    """truth_finding materialized once per (session, sf_dir): the
    propagation rounds feed four queries (beliefs, trust, resolved,
    error rate) and the outputs are already localCheckpointed — the
    same stage-checkpoint pattern as _linked_components."""
    key = (id(spark), sf_dir)
    if key not in _TRUTH_CACHE:
        _TRUTH_CACHE[key] = tri_op.truth_finding(
            _frames(spark, sf_dir).triples)
    return _TRUTH_CACHE[key]


def q_claim_beliefs(spark, sf_dir) -> DataFrame:
    """Truth finding: claim-belief side of the fixed-round source-
    trust <-> claim-belief propagation over the host-claim bipartite
    graph (operators/triples.truth_finding)."""
    beliefs, _ = _truth(spark, sf_dir)
    return beliefs


def q_source_trust(spark, sf_dir) -> DataFrame:
    """Truth finding: source-trust side (operators/triples.
    truth_finding)."""
    _, trust = _truth(spark, sf_dir)
    return trust


def q_kg_resolved(spark, sf_dir) -> DataFrame:
    """Conflict-resolved single-valued KG: belief-argmax per
    (subj, pred) slot over the truth-finding scores
    (operators/triples.kg_resolved)."""
    beliefs, _ = _truth(spark, sf_dir)
    return tri_op.kg_resolved(_frames(spark, sf_dir).triples,
                              beliefs=beliefs)


def q_host_error_rate(spark, sf_dir) -> DataFrame:
    """Source error rate: per-host share of attestations that lost
    the belief-argmax — the fusion diagnostic feeding blocklists
    (operators/triples.host_error_rate)."""
    beliefs, _ = _truth(spark, sf_dir)
    return tri_op.host_error_rate(_frames(spark, sf_dir).triples,
                                  beliefs=beliefs)


def q_literal_profiles(spark, sf_dir) -> DataFrame:
    """Numeric-literal range induction per predicate — exact
    micro-integer magnitudes, no floats
    (operators/triples.literal_profiles)."""
    return tri_op.literal_profiles(_frames(spark, sf_dir).triples)


def q_typed_wedges(spark, sf_dir) -> DataFrame:
    """Typed 2-hop (metapath) wedge counts over the co-mention graph,
    node types by majority election, middle-role hub cap
    (graph_algos.typed_wedges)."""
    from .operators.graph_algos import typed_wedges

    _, linked, _ = _linked(spark, sf_dir)
    edges, _n = _comention_graph(spark, sf_dir)
    types = lk.entity_type_election(linked).select(
        F.col("canonical_id").alias("node"), "major_type")
    return typed_wedges(edges, types)


def q_kg_completeness(spark, sf_dir) -> DataFrame:
    """Per-subject predicate coverage vs the schema vocabulary — the
    gap report driving targeted re-extraction
    (operators/triples.kg_completeness)."""
    return tri_op.kg_completeness(_frames(spark, sf_dir).triples)


def q_extraction_yield(spark, sf_dir) -> DataFrame:
    """Per-host share of pages yielding >= 1 triple — the crawl-ops
    budget KPI (operators/triples.extraction_yield)."""
    fr = _frames(spark, sf_dir)
    return tri_op.extraction_yield(fr.pages, fr.triples)


def q_chain_patterns(spark, sf_dir) -> DataFrame:
    """Directed 2-hop property-path (chain) profile over the
    ORIENTATION CLOSURE of the KG edge table (forward edges plus
    inverse edges as '^'||pred, SPARQL's ^p), mid-role hub cap
    (graph_algos.chain_patterns).  The closure is what makes the
    profile non-degenerate on an attribute-shaped KG: objects are
    never subjects here, so the realizable path shapes are ^p1/p2
    (two facts sharing a subject) and p1/^p2 (two subjects sharing
    an object value)."""
    from .operators.graph_algos import chain_patterns

    ge = q_graph_edges(spark, sf_dir).select(
        "subj_node", "pred", "obj_node")
    inv = ge.select(F.col("obj_node").alias("subj_node"),
                    F.concat(F.lit("^"), "pred").alias("pred"),
                    F.col("subj_node").alias("obj_node"))
    return chain_patterns(ge.unionByName(inv))


def q_optional_query(spark, sf_dir) -> DataFrame:
    """SPARQL OPTIONAL (left-outer BGP) read path
    (operators/triples.optional_query)."""
    return tri_op.optional_query(_frames(spark, sf_dir).triples)


def q_negation_query(spark, sf_dir) -> DataFrame:
    """SPARQL NOT-EXISTS per-predicate gap profile
    (operators/triples.negation_query)."""
    return tri_op.negation_query(_frames(spark, sf_dir).triples)


def q_transe_scores(spark, sf_dir) -> DataFrame:
    """Integer TransE energy per distinct fact — hash-derived
    embeddings, pure codegen expression
    (operators/kg_embed.transe_scores)."""
    from .operators.kg_embed import transe_scores

    return transe_scores(_frames(spark, sf_dir).triples)


def q_transe_ranks(spark, sf_dir) -> DataFrame:
    """Filtered link-prediction evaluation per predicate over
    hash-capped type-constrained candidates
    (operators/kg_embed.transe_ranks)."""
    from .operators.kg_embed import transe_ranks

    return transe_ranks(_frames(spark, sf_dir).triples)


def q_modularity(spark, sf_dir) -> DataFrame:
    """Exact integer modularity decomposition (Q scaled by 4m²) of
    the LPA partition over the entity co-occurrence graph
    (graph_algos.modularity) — the merge-gating companion to
    community_stats' conductance."""
    from .operators.graph_algos import label_propagation, modularity

    _, linked, _ = _linked(spark, sf_dir)
    edges = lk.overlap_edges(linked)
    nodes = linked.select(
        F.col("canonical_id").alias("node")).dropDuplicates()
    labels = label_propagation(edges, nodes, n_rounds=5)
    return modularity(edges, labels)


def q_token_blocks(spark, sf_dir) -> DataFrame:
    """Token-blocking profile with the block-purging flag
    (operators/linking.token_blocks)."""
    return lk.token_blocks(_frames(spark, sf_dir).triples)


def q_meta_block_edges(spark, sf_dir) -> DataFrame:
    """Meta-blocking candidate edges: CBS weights + weighted-node
    pruning via integer cross-multiplication
    (operators/linking.meta_block_edges)."""
    return lk.meta_block_edges(_frames(spark, sf_dir).triples)


def q_entity_skyline(spark, sf_dir) -> DataFrame:
    """Exact 2-D Pareto skyline of entities over (n_docs, n_facts)
    (operators/triples.entity_skyline)."""
    return tri_op.entity_skyline(_frames(spark, sf_dir).triples)


def q_weighted_sample(spark, sf_dir) -> DataFrame:
    """Deterministic weighted bottom-k document sample per host
    (operators/sampling.weighted_sample), weights = token counts."""
    from .operators.sampling import weighted_sample

    fr = _frames(spark, sf_dir)
    return weighted_sample(fr.pages, ner.tokenize_df(fr.pages))


def q_pred_fds(spark, sf_dir) -> DataFrame:
    """Approximate functional dependencies between predicates (TANE
    g3 keep-max measure) (operators/triples.pred_fds)."""
    return tri_op.pred_fds(_frames(spark, sf_dir).triples)


def q_fact_runs(spark, sf_dir) -> DataFrame:
    """Per-fact SCD2 run/gap/uptime profile over the validity
    intervals (operators/triples.fact_runs); horizon = one crawl week
    past the last scheduled crawl."""
    from .oracle.sqlgen import FACT_RUNS_HORIZON

    return tri_op.fact_runs(q_triple_snapshots(spark, sf_dir),
                            FACT_RUNS_HORIZON)


def _prec_graph(spark, sf_dir):
    """(edges, nodes) of the directed mention-precedence graph —
    materialized once per session: the SCC fixpoint and the bowtie
    BFS both consume it."""
    key = (id(spark), sf_dir, "prec")
    if key not in _LINK_CACHE:
        _, linked, _ = _linked(spark, sf_dir)
        edges = lk.precedence_edges(linked).localCheckpoint()
        nodes = (linked.select(F.col("canonical_id").alias("node"))
                 .dropDuplicates().localCheckpoint())
        _LINK_CACHE[key] = (edges, nodes)
    return _LINK_CACHE[key]


def _prec_scc(spark, sf_dir):
    from .operators.graph_algos import strongly_connected_components

    key = (id(spark), sf_dir, "prec_scc")
    if key not in _LINK_CACHE:
        edges, nodes = _prec_graph(spark, sf_dir)
        _LINK_CACHE[key] = strongly_connected_components(
            edges, nodes).localCheckpoint()
    return _LINK_CACHE[key]


def q_precedence_edges(spark, sf_dir) -> DataFrame:
    """Directed narrative-precedence entity graph, page-count
    weighted (operators/linking.precedence_edges)."""
    edges, _ = _prec_graph(spark, sf_dir)
    return edges


def q_scc_components(spark, sf_dir) -> DataFrame:
    """Strongly connected components of the precedence graph via
    forward-backward min-label peeling
    (operators/graph_algos.strongly_connected_components)."""
    return _prec_scc(spark, sf_dir)


def q_bowtie_structure(spark, sf_dir) -> DataFrame:
    """Broder-style bowtie decomposition (CORE/IN/OUT/OTHER) of the
    precedence graph relative to its giant SCC
    (operators/graph_algos.bowtie_structure)."""
    from .operators.graph_algos import bowtie_structure

    edges, _ = _prec_graph(spark, sf_dir)
    return bowtie_structure(edges, _prec_scc(spark, sf_dir))


def q_greedy_coverage(spark, sf_dir) -> DataFrame:
    """Greedy maximum-coverage corpus selection over the doc ->
    canonical-entity incidence (operators/sampling.greedy_coverage):
    k=5 picks, ties -> smallest doc_id."""
    from .operators.sampling import greedy_coverage

    _, linked, _ = _linked(spark, sf_dir)
    return greedy_coverage(
        linked.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "canonical_id"), k=5)


def q_prefix_filter_pairs(spark, sf_dir) -> DataFrame:
    """PPJoin-style EXACT set-similarity join (zero false negatives,
    unlike the LSH path) at token-Jaccard >= 0.80
    (operators/dedup.prefix_filter_pairs)."""
    return dd.prefix_filter_pairs(_docs(spark, sf_dir))


def q_mis_nodes(spark, sf_dir) -> DataFrame:
    """Maximal independent set over the entity co-mention graph —
    Luby's algorithm, derandomized with md5-hex6 round priorities
    (operators/graph_algos.luby_mis, 6 rounds).  The MIS is the
    classic distributed symmetry-breaker: an independent anchor set
    for parallel canonical-name election over dense co-mention
    neighborhoods."""
    from .operators.graph_algos import luby_mis

    edges, nodes = _comention_graph(spark, sf_dir)
    return luby_mis(edges, nodes, n_rounds=6)


def q_type_inference(spark, sf_dir) -> DataFrame:
    """RDFS-style schema materialization: induce each predicate's
    rdfs:domain / rdfs:range (plurality type, at-least-half support)
    and emit the entailed entity types next to the declared ones,
    flagged is_new (operators/linking.rdfs_type_inference)."""
    fr, linked, gaz = _linked(spark, sf_dir)
    return lk.rdfs_type_inference(fr.triples, linked, gaz)


def q_sn_pairs(spark, sf_dir) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez-Stolfo): per-(host,
    type) sorted surfaces paired with their 2 sort-order successors —
    the sliding-window ER candidate generator complementing the
    token-block / meta-blocking path (operators/linking.
    sorted_neighborhood_pairs)."""
    return lk.sorted_neighborhood_pairs(
        _frames(spark, sf_dir).mentions, window=3)


def q_katz_scores(spark, sf_dir) -> DataFrame:
    """Truncated Katz centrality (depth 3, beta=1/8, x512 integer
    scale) over the entity co-mention graph — walk-count column sums,
    no pair enumeration (operators/graph_algos.katz_index)."""
    from .operators.graph_algos import katz_index

    edges, nodes = _comention_graph(spark, sf_dir)
    return katz_index(edges, nodes, depth=3)


def q_butterflies(spark, sf_dir) -> DataFrame:
    """Per-entity butterfly (bipartite 4-cycle) counts over the
    doc-entity incidence — the blocking-key density diagnostic, via
    the exact C(d,2) wedge identity (operators/graph_algos.
    butterfly_counts)."""
    from .operators.graph_algos import butterfly_counts

    _, linked, _ = _linked(spark, sf_dir)
    _, nodes = _comention_graph(spark, sf_dir)
    return butterfly_counts(
        linked.select("doc_id", "canonical_id"), nodes)


def q_bcubed(spark, sf_dir) -> DataFrame:
    """B-cubed P/R/F1 of the attribute-merge clustering against the
    alias-link canonical labels — the coreference-standard extrinsic
    score for the merge pass (operators/evaluate.bcubed_scores)."""
    fr, linked, _ = _linked(spark, sf_dir)
    pred = tri_op.attr_merge_clusters(fr.triples).select(
        F.col("subj").alias("item"), "cluster")
    gold = (fr.triples
            .join(linked.select("url", F.col("ent_id").alias("subj_id"),
                                "canonical_id"), ["url", "subj_id"])
            .groupBy(F.col("subj").alias("item"))
            .agg(F.min("canonical_id").alias("label")))
    return ev.bcubed_scores(pred, gold)


def q_cocitation(spark, sf_dir) -> DataFrame:
    """Co-citation + bibliographic coupling counts over the directed
    precedence graph — the classic second-order link-analysis
    similarity pair (operators/graph_algos.cocitation_coupling)."""
    from .operators.graph_algos import cocitation_coupling

    edges, _ = _prec_graph(spark, sf_dir)
    return cocitation_coupling(edges)


def q_msf_edges(spark, sf_dir) -> DataFrame:
    """Minimum spanning forest of the attribute-similarity graph by
    Boruvka's algorithm (cost = 1e6 - jac_micro6, (cost, src, dst)
    total order) — the parallel single-linkage clustering backbone
    (operators/graph_algos.boruvka_msf)."""
    from .operators.graph_algos import boruvka_msf

    ej = tri_op.entity_attr_jaccard(_frames(spark, sf_dir).triples)
    edges = ej.select(
        F.col("subj_a").alias("src"), F.col("subj_b").alias("dst"),
        (F.lit(1000000) - F.col("jac_micro6")).cast("long")
        .alias("cost"))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .dropDuplicates())
    return boruvka_msf(edges, nodes, n_rounds=6)


def q_hyperball(spark, sf_dir) -> DataFrame:
    """HyperBall neighborhood function (Boldi-Vigna): per-node
    16-register HLL ball counters advanced by neighbor register
    max-merges, dist 0..3, integer raw estimator
    (operators/graph_algos.hyperball_nf)."""
    from .operators.graph_algos import hyperball_nf

    edges, nodes = _comention_graph(spark, sf_dir)
    return hyperball_nf(edges, nodes, depth=3)


def q_nf_distribution(spark, sf_dir) -> DataFrame:
    """Distance distribution of the co-mention graph: the global
    neighborhood-function rollup of the HyperBall table — one keyed
    aggregate per distance (the effective-diameter read path)."""
    from .operators.graph_algos import hyperball_nf

    edges, nodes = _comention_graph(spark, sf_dir)
    return (hyperball_nf(edges, nodes, depth=3)
            .groupBy("dist")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                 F.sum("est_milli").cast("long").alias("nf_sum_milli")))


def q_simrank(spark, sf_dir) -> DataFrame:
    """Fixed-round integer SimRank (C=4/5, 3 rounds, micro6 scores)
    over the directed precedence graph — "similar if referenced by
    similar" (operators/graph_algos.simrank_pairs)."""
    from .operators.graph_algos import simrank_pairs

    edges, _ = _prec_graph(spark, sf_dir)
    return simrank_pairs(edges, n_rounds=3)


def q_blocking_metrics(spark, sf_dir) -> DataFrame:
    """Pair completeness + reduction ratio of the meta-blocking WNP
    survivors vs the attribute-Jaccard >= 0.5 truth pairs — the two
    numbers every ER blocker is tuned on
    (operators/linking.blocking_quality)."""
    tr = _frames(spark, sf_dir).triples
    ej = tri_op.entity_attr_jaccard(tr).where(
        F.col("jac_micro6") >= 500000)
    la, lb = F.lower("subj_a"), F.lower("subj_b")
    truth = (ej.select(F.least(la, lb).alias("ent_a"),
                       F.greatest(la, lb).alias("ent_b"))
             .where(F.col("ent_a") != F.col("ent_b"))
             .dropDuplicates())
    return lk.blocking_quality(tr, truth)


def q_local_bridges(spark, sf_dir) -> DataFrame:
    """Per-edge triangle support + local-bridge flag over the
    co-mention graph — Granovetter weak ties, the spurious-merge
    audit candidates (operators/graph_algos.edge_support)."""
    from .operators.graph_algos import edge_support

    edges, _ = _comention_graph(spark, sf_dir)
    return edge_support(edges)


def q_orbit_counts(spark, sf_dir) -> DataFrame:
    """3-node graphlet orbit signature per node (degree, induced
    2-path end/center, triangles) in closed form from three keyed
    aggregates (operators/graph_algos.orbit_counts)."""
    from .operators.graph_algos import orbit_counts

    edges, nodes = _comention_graph(spark, sf_dir)
    return orbit_counts(edges, nodes)


def q_rpq_reach(spark, sf_dir) -> DataFrame:
    """SPARQL property-path p{1,4} reachability for the
    most-attested predicate, by prefix doubling — log2(hops) join
    rounds (operators/triples.rpq_reach)."""
    return tri_op.rpq_reach(_frames(spark, sf_dir).triples, max_hops=4)


def q_rolling_entity_hll(spark, sf_dir) -> DataFrame:
    """Rolling 3-day distinct-entity estimates from per-day
    16-register HLL sketches — the sketch-union sliding window
    (functions/sketches.rolling_hll_estimates)."""
    from .functions.sketches import rolling_hll_estimates

    _, linked, _ = _linked(spark, sf_dir)
    items = linked.select(
        ((F.lit(1704067200) + F.col("doc_id")) / 86400)
        .cast("int").alias("day_idx"), "canonical_id")
    return rolling_hll_estimates(items, "day_idx", "canonical_id",
                                 window=3)


def q_type_mixing(spark, sf_dir) -> DataFrame:
    """Categorical mixing matrix of the co-mention graph by elected
    entity type — Newman's assortative-mixing table with micro6
    shares (operators/graph_algos.type_mixing)."""
    from .operators.graph_algos import type_mixing

    _, linked, _ = _linked(spark, sf_dir)
    edges, _ = _comention_graph(spark, sf_dir)
    types = lk.entity_type_election(linked).select(
        "canonical_id", "major_type")
    return type_mixing(edges, types)


def q_ic_spread(spark, sf_dir) -> DataFrame:
    """Deterministic independent-cascade influence spread (live-edge
    BFS from the smallest node, md5 coin at p=35%) over the
    co-mention graph (operators/graph_algos.ic_spread)."""
    from .operators.graph_algos import ic_spread

    edges, nodes = _comention_graph(spark, sf_dir)
    return ic_spread(edges, nodes, p_pct=35)


def q_boolean_search(spark, sf_dir) -> DataFrame:
    """Boolean-retrieval read path: AND / OR / PHRASE doc counts for
    the two highest-df terms — the index-correctness probe for the
    postings materialization (functions/textstats.
    boolean_search_stats)."""
    from .functions.textstats import boolean_search_stats

    return boolean_search_stats(_docs(spark, sf_dir))


def q_mention_gini(spark, sf_dir) -> DataFrame:
    """Exact Gini + top-1 share of per-entity mention counts — the
    popularity-skew alarm (operators/linking.mention_concentration)."""
    _, linked, _ = _linked(spark, sf_dir)
    return lk.mention_concentration(linked)


def q_core_numbers(spark, sf_dir) -> DataFrame:
    """Full k-core decomposition (coreness per node) by H-index
    iteration over the co-mention graph — all k at once, 8 sweeps
    (operators/graph_algos.core_numbers)."""
    from .operators.graph_algos import core_numbers

    edges, nodes = _comention_graph(spark, sf_dir)
    return core_numbers(edges, nodes, n_rounds=8)



def q_landmark_centrality(spark, sf_dir) -> DataFrame:
    """Landmark closeness + harmonic centrality: one multi-source BFS
    from the 4 highest-degree nodes of the co-mention graph, integer
    reciprocal/ratio scoring (graph_algos.landmark_centrality)."""
    from .operators.graph_algos import landmark_centrality

    edges, nodes = _comention_graph(spark, sf_dir)
    return landmark_centrality(edges, nodes, n_landmarks=4)



def q_fs_weights(spark, sf_dir) -> DataFrame:
    """Fellegi-Sunter per-feature m/u estimates + integer log-odds
    weights over the sorted-neighborhood ER pairs
    (operators/linking.fs_linkage_weights)."""
    return lk.fs_linkage_weights(_frames(spark, sf_dir).mentions,
                                 lk.gazetteer_df(spark))


def q_fs_scores(spark, sf_dir) -> DataFrame:
    """Fellegi-Sunter match score per candidate pair — the linkage
    decision variable as an exact integer
    (operators/linking.fs_linkage_scores)."""
    return lk.fs_linkage_scores(_frames(spark, sf_dir).mentions,
                                lk.gazetteer_df(spark))


def q_kmv_entities(spark, sf_dir) -> DataFrame:
    """Per-host KMV (bottom-k theta) distinct-entity estimates with
    the exact distinct count as the audit column — the sketch that
    answers "how many distinct entities does this source contribute"
    over any shard union without rescanning
    (functions/sketches.kmv_with_exact)."""
    from .functions.sketches import kmv_with_exact

    _, linked, _ = _linked(spark, sf_dir)
    he = linked.select(
        F.regexp_extract("url", r"^https?://([^/]*)", 1).alias("host"),
        "canonical_id")
    return (kmv_with_exact(he, "host", "canonical_id")
            .select(F.col("grp").alias("host"), "n_seen", "kth_hval",
                    "est_distinct", "exact_distinct"))


def q_theta_host_sets(spark, sf_dir) -> DataFrame:
    """Theta-sketch set algebra between the top hosts' entity sets —
    intersection/union/Jaccard estimated from the k-row KMV sketches
    alone, with the exact values as audit columns
    (functions/sketches.theta_set_ops)."""
    from .functions.sketches import theta_set_ops

    _, linked, _ = _linked(spark, sf_dir)
    he = linked.select(
        F.regexp_extract("url", r"^https?://([^/]*)", 1).alias("host"),
        "canonical_id")
    return (theta_set_ops(he, "host", "canonical_id")
            .withColumnRenamed("grp_a", "host_a")
            .withColumnRenamed("grp_b", "host_b"))


def q_ams_f2(spark, sf_dir) -> DataFrame:
    """AMS tug-of-war F2 sketch of the triple object column joined
    with the exact self-join size — the join-size statistic a shuffle
    planner consults (functions/sketches.ams_f2_with_exact)."""
    from .functions.sketches import ams_f2_with_exact

    return ams_f2_with_exact(_frames(spark, sf_dir).triples, "obj")


def q_shard_rebalance(spark, sf_dir) -> DataFrame:
    """Rendezvous-hash resharding plan for the url universe, 8 -> 9
    shards: per (shard_old, shard_new) cell the distinct-url count
    and a moved flag — HRW's minimal-disruption contract (movers land
    ONLY on the added shard) as a checkable table
    (functions/sharding.shard_rebalance)."""
    from .functions.sharding import shard_rebalance

    return shard_rebalance(_frames(spark, sf_dir).pages, "url", 8, 9)


def q_event_bursts(spark, sf_dir) -> DataFrame:
    """Kleinberg two-state burst labels per event type per crawl day
    — integer Viterbi over single-ln micro6 log-rates, oracle =
    forward/backward recursive CTEs
    (operators/events.kleinberg_bursts)."""
    from .operators.events import kleinberg_bursts

    return kleinberg_bursts(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_allen_relations(spark, sf_dir) -> DataFrame:
    """Allen interval-algebra profile of same-claim validity-interval
    pairs — the full 13-relation temporal taxonomy behind
    interval_conflicts (operators/triples.allen_relation_profile)."""
    return tri_op.allen_relation_profile(
        q_triple_snapshots(spark, sf_dir))


def q_vopt_histogram(spark, sf_dir) -> DataFrame:
    """V-optimal histogram of the document token-length domain —
    minimum-SSE contiguous bucketization by integer DP on the
    distinct-value synopsis (functions/sketches.v_optimal_histogram);
    oracle = the DP levels as chained CTEs."""
    from .functions.sketches import v_optimal_histogram

    q = ts.quality_features(_docs(spark, sf_dir).select(
        "doc_id", "text"))
    return v_optimal_histogram(q, "n_tokens")


def q_session_trigrams(spark, sf_dir) -> DataFrame:
    """Consecutive 3-step behavioral patterns inside sessions with
    occurrence and session-support counts
    (operators/events.session_trigrams)."""
    return evt.session_trigrams(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_timeline_repair(spark, sf_dir) -> DataFrame:
    """Max-weight non-overlapping validity timeline per claim —
    weighted interval scheduling DP on the SCD2 intervals
    (operators/triples.timeline_repair)."""
    return tri_op.timeline_repair(q_triple_snapshots(spark, sf_dir))


def q_host_terms(spark, sf_dir) -> DataFrame:
    """Distinctive shingles per source by Dunning log-likelihood —
    the over-represented-vocabulary profile of each host
    (functions/textstats.distinctive_terms over the per-doc-distinct
    shingle stream)."""
    from .operators.dedup import shingles

    docs = _docs(spark, sf_dir)
    sh = shingles(docs.select("doc_id", "text")).join(
        docs.select("doc_id", "source"), "doc_id")
    return (ts.distinctive_terms(sh, "source", "shingle")
            .withColumnRenamed("grp", "source")
            .withColumnRenamed("term", "shingle"))


def q_retrieval_ndcg(spark, sf_dir) -> DataFrame:
    """NDCG@10 of the BM25 ranking per gazetteer surface form against
    the ideal raw-tf ordering — the retrieval-quality gate for the
    entity-attestation read path (functions/textstats.retrieval_ndcg;
    pre-floored micro6 position discounts, integer sums, one exact
    division)."""
    gaz = lk.gazetteer_df(spark)
    return ts.retrieval_ndcg(_docs(spark, sf_dir), gaz.select("alias"))


def q_term_proximity(spark, sf_dir) -> DataFrame:
    """Per-doc minimal co-occurrence window span of the corpus's two
    highest-df terms — the proximity ranking signal over the boolean
    AND set, linear running-last-position device (functions/textstats.
    term_proximity)."""
    return ts.term_proximity(_docs(spark, sf_dir))


def q_snippet_windows(spark, sf_dir) -> DataFrame:
    """Best 8-token evidence snippet per document by gazetteer-hit
    count — the "why this page attests these entities" read path
    (functions/textstats.snippet_windows; linear frame-sum scoring,
    tie -> earliest window)."""
    gaz = lk.gazetteer_df(spark)
    return ts.snippet_windows(_docs(spark, sf_dir), gaz.select("alias"))


def q_entity_cards(spark, sf_dir) -> DataFrame:
    """Entity-summary read path: top-3 facts per subject by support x
    integer idf — what an entity card renders (operators/triples.
    entity_cards)."""
    return tri_op.entity_cards(_frames(spark, sf_dir).triples)


def q_graph_coloring(spark, sf_dir) -> DataFrame:
    """Jones-Plassmann greedy coloring of the entity co-mention graph
    — a proper coloring is a conflict-free parallel merge schedule;
    md5-derandomized, 8 unrolled rounds (operators/graph_algos.
    jp_coloring)."""
    from .operators.graph_algos import jp_coloring

    edges, nodes = _comention_graph(spark, sf_dir)
    return jp_coloring(edges, nodes, n_rounds=8)


def q_lsh_eval(spark, sf_dir) -> DataFrame:
    """Candidate-quality evaluation of the MinHash-LSH dedup path:
    precision/recall of the band candidates vs the complete
    prefix-filter exact-Jaccard pair set on the same shingle universe
    (operators/dedup.lsh_dedup_eval)."""
    return dd.lsh_dedup_eval(_docs(spark, sf_dir))


def q_crawl_budget(spark, sf_dir) -> DataFrame:
    """Hamilton largest-remainder apportionment of the next crawl
    cycle's 10,000 fetch slots across hosts by +1-smoothed extraction
    yield; allocations sum exactly to the budget (operators/triples.
    crawl_budget)."""
    fr = _frames(spark, sf_dir)
    return tri_op.crawl_budget(fr.pages, fr.triples)


def q_completions(spark, sf_dir) -> DataFrame:
    """Materialized type-ahead index: top-3 completions per 3-char
    token prefix by corpus tf — the autocomplete read path
    (functions/textstats.completion_index)."""
    return ts.completion_index(_docs(spark, sf_dir))


def q_dag_layers(spark, sf_dir) -> DataFrame:
    """Critical-path layering of the precedence graph's SCC
    condensation — same-level components are concurrently
    processable; max level = schedule depth (operators/graph_algos.
    dag_layers, 10 unrolled max-plus rounds)."""
    from .operators.graph_algos import dag_layers

    edges, _ = _prec_graph(spark, sf_dir)
    return dag_layers(edges, _prec_scc(spark, sf_dir), n_rounds=10)


def q_dominant_matching(spark, sf_dir) -> DataFrame:
    """Preis locally-dominant-edge weighted matching over the
    symmetrized page-count-weighted precedence graph — the
    distributed 1/2-approx maximum-weight matching, the one-to-one
    merge-scheduling primitive (operators/graph_algos.
    dominant_matching, 6 unrolled rounds)."""
    from .operators.graph_algos import dominant_matching

    pe, _ = _prec_graph(spark, sf_dir)
    und = (pe.select(F.least("src", "dst").alias("src"),
                     F.greatest("src", "dst").alias("dst"), "n_pages")
           .groupBy("src", "dst")
           .agg(F.sum("n_pages").cast("long").alias("weight")))
    return dominant_matching(und, n_rounds=6)


def q_srp_multiprobe(spark, sf_dir) -> DataFrame:
    """Multi-probe SRP ANN: each query probes its own sign bucket plus
    all Hamming-1 neighbor buckets — the boundary-blindness fix at
    (bits+1)x probe cost (operators/similarity.srp_multiprobe_topk)."""
    from .operators.similarity import srp_multiprobe_topk

    return srp_multiprobe_topk(_emb(spark, sf_dir))


def q_syndication_edges(spark, sf_dir) -> DataFrame:
    """Content-syndication provenance: complete near-dup pairs
    attributed first->later by the crawl clock, rolled up per
    source pair (operators/dedup.syndication_edges)."""
    return dd.syndication_edges(_docs(spark, sf_dir))


def q_dup_rate_curve(spark, sf_dir) -> DataFrame:
    """Dedup-threshold tuning curve: near-dup pair count and touched-
    corpus share at Jaccard 30/50/70/90 from ONE complete pair join
    (operators/dedup.dup_rate_curve)."""
    return dd.dup_rate_curve(_docs(spark, sf_dir))


def q_evidence_snippets(spark, sf_dir) -> DataFrame:
    """Per-(page, entity) evidence snippet: first mention +/-40 chars
    of context, cut by char offsets — the provenance read path a KG
    UI serves (operators/linking.evidence_snippets)."""
    fr, linked, _ = _linked(spark, sf_dir)
    return lk.evidence_snippets(linked, fr.pages)


def q_distmult_scores(spark, sf_dir) -> DataFrame:
    """Integer DistMult bilinear score per distinct fact — the second
    embedding scoring family, symmetric in (h, t)
    (operators/kg_embed.distmult_scores)."""
    from .operators.kg_embed import distmult_scores

    return distmult_scores(_frames(spark, sf_dir).triples)


def q_scorer_agreement(spark, sf_dir) -> DataFrame:
    """TransE vs DistMult top-10 ranker agreement per predicate — the
    adjudication flag for model-dependent fact triage
    (operators/kg_embed.scorer_agreement)."""
    from .operators.kg_embed import scorer_agreement

    return scorer_agreement(_frames(spark, sf_dir).triples)


def q_single_linkage(spark, sf_dir) -> DataFrame:
    """Single-linkage clusters of the attribute-similarity graph at
    Jaccard >= 0.5 — the MSF cut + forest CC identity, one Boruvka
    pass serving every threshold (operators/graph_algos.
    single_linkage_clusters)."""
    from .operators.graph_algos import single_linkage_clusters

    ej = tri_op.entity_attr_jaccard(_frames(spark, sf_dir).triples)
    edges = ej.select(
        F.col("subj_a").alias("src"), F.col("subj_b").alias("dst"),
        (F.lit(1000000) - F.col("jac_micro6")).cast("long")
        .alias("cost"))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .dropDuplicates())
    return single_linkage_clusters(edges, nodes, cut_cost=500000)


def q_join_skew(spark, sf_dir) -> DataFrame:
    """Hot-key shuffle profile of the engine's three heavy join
    families — pages-per-host (boilerplate/session grouping),
    mention surface forms (the linking equi-join key), triple
    subjects (the wide-table aggregation hub).  sum_sq is the exact
    self-join work; max_over_avg is the salting alarm
    (functions/textstats.join_skew_profile)."""
    fr = _frames(spark, sf_dir)
    host = F.regexp_extract("url", r"^https?://([^/]*)", 1)
    return ts.join_skew_profile({
        "host_pages": fr.pages.select(host.alias("key")),
        "link_mention": fr.mentions.select(
            F.lower("ent_text").alias("key")),
        "agg_subj": fr.triples.select(F.col("subj").alias("key")),
    })


def q_fact_rollup(spark, sf_dir) -> DataFrame:
    """One-pass GROUPING-SETS rollup of the triple fact table over
    (host, pred) — leaf cells, host totals, grand total from a
    single Expand+aggregate (operators/triples.fact_rollup)."""
    return tri_op.fact_rollup(_frames(spark, sf_dir).triples)


def q_bloom_semi_join(spark, sf_dir) -> DataFrame:
    """Bloomjoin reduction audit: pre-filter the triple fact table
    against a Bloom of the hub-entity dim keys (subjects with >= 3
    distinct predicates) and report exactly how many rows the filter
    keeps off the join shuffle, with the zero-false-negative safety
    audit (functions/sketches.bloom_semi_join_stats)."""
    from .functions.sketches import bloom_semi_join_stats

    t = _frames(spark, sf_dir).triples
    dim = (t.groupBy("subj")
           .agg(F.countDistinct("pred").alias("np"))
           .where(F.col("np") >= 3).select("subj"))
    return bloom_semi_join_stats(t, "subj", dim, "subj")


def q_densest_subgraph(spark, sf_dir) -> DataFrame:
    """Densest entity community by deterministic greedy peeling over
    the jac >= 0.2 attribute-similarity graph — the 2(1+eps)-approx
    core a KG curator inspects first
    (operators/graph_algos.densest_subgraph)."""
    from .operators.graph_algos import densest_subgraph

    ej = tri_op.entity_attr_jaccard(_frames(spark, sf_dir).triples)
    edges = ej.where(F.col("jac_micro6") >= 200000).select(
        F.col("subj_a").alias("src"), F.col("subj_b").alias("dst"))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .dropDuplicates())
    return densest_subgraph(edges, nodes)


def q_layout_pruning(spark, sf_dir) -> DataFrame:
    """Z-order vs linear write-layout decision table: exact min/max
    file-skipping audit for point queries on each of two dimensions
    (crawl slot, host bucket) at 16 files
    (plans/layout.layout_pruning_audit)."""
    from .plans.layout import layout_pruning_audit

    return layout_pruning_audit(_frames(spark, sf_dir).pages)


def q_skyline_3d(spark, sf_dir) -> DataFrame:
    """Pareto-optimal entities on (corroborating docs, distinct
    hosts, distinct predicates) — exact k-D two-phase distributed
    skyline, the general-dimension sibling of the 2-D window-based
    entity_skyline (operators/skyline.entity_skyline_3d)."""
    from .operators.skyline import entity_skyline_3d

    return entity_skyline_3d(_frames(spark, sf_dir).triples)


def q_apriori_itemsets(spark, sf_dir) -> DataFrame:
    """Frequent attribute-value co-occurrence sets (sizes 1-3) by
    a-priori lattice pruning over doc-grain transactions
    (operators/itemsets.entity_itemsets, min_support 12)."""
    from .operators.itemsets import entity_itemsets

    return entity_itemsets(_frames(spark, sf_dir).triples)


def q_quality_calibration(spark, sf_dir) -> DataFrame:
    """Reliability table of the LM quality score vs the curation
    gate: keep rate per rank-decile score bucket
    (functions/textstats.quality_calibration)."""
    return ts.quality_calibration(_docs(spark, sf_dir))


def q_host_outliers(spark, sf_dir) -> DataFrame:
    """Robust per-host volume outliers: integer median/MAD cut at
    3.5 MAD (functions/textstats.host_outliers)."""
    return ts.host_outliers(_docs(spark, sf_dir))


def q_source_gate_chi2(spark, sf_dir) -> DataFrame:
    """Gate-fairness chi-square per source: is the curation gate
    firing uniformly across hosts
    (functions/textstats.source_gate_chi2)."""
    return ts.source_gate_chi2(_docs(spark, sf_dir))


def q_hub_robustness(spark, sf_dir) -> DataFrame:
    """Targeted-attack probe on the canonical KG: component sizes
    before/after removing the top-3 degree hubs
    (operators/graph_algos.hub_robustness)."""
    from .operators.graph_algos import hub_robustness

    edges = q_graph_edges(spark, sf_dir).selectExpr(
        "subj_node AS src", "obj_node AS dst")
    return hub_robustness(edges, k=3)


def q_pii_scrub(spark, sf_dir) -> DataFrame:
    """PII redaction pass: per-doc email/IPv4 counts + masked-text
    sha256 over the synthetic contact-line fixture
    (functions/textstats.pii_scrub)."""
    return ts.pii_scrub(_docs(spark, sf_dir))


def q_cusum_drift(spark, sf_dir) -> DataFrame:
    """Online CUSUM drift alarms per event type per crawl day — the
    prefix-sum closed form, the sequential sibling of the Kleinberg
    burst labels (operators/events.cusum_drift)."""
    from .operators.events import cusum_drift

    return cusum_drift(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_vocab_growth(spark, sf_dir) -> DataFrame:
    """Heaps-law vocabulary growth curve at 50-doc buckets
    (functions/textstats.vocab_growth)."""
    return ts.vocab_growth(_docs(spark, sf_dir))


def q_benford_digits(spark, sf_dir) -> DataFrame:
    """Benford first-digit forensics (operators/triples.benford_digits)
    over the union of KG object literals and the event props payloads
    (the synthetic corpus's triples carry no numeric literal, so the
    events side keeps the profile non-degenerate while the triples
    side still exercises the KG pass-through)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = (_frames(spark, sf_dir).triples.select("pred", "obj")
             .unionByName(ev.select(
                 F.col("event_type").alias("pred"),
                 F.col("props").alias("obj"))))
    return tri_op.benford_digits(pairs)


def q_mmr_rerank(spark, sf_dir) -> DataFrame:
    """MMR diversified reranking of the query-0 retrieval shortlist
    (operators/similarity.mmr_rerank): 10 greedy integer rounds over
    the 50-candidate top-relevance shortlist, lambda = 0.70."""
    from .operators.similarity import mmr_rerank

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return mmr_rerank(emb, query_id=0, n_candidates=50, k=10,
                      lam_pct=70)


def q_bpe_merges(spark, sf_dir) -> DataFrame:
    """First 12 BPE merge rules trained on the corpus word-frequency
    table (functions/textstats.bpe_merges)."""
    return ts.bpe_merges(_docs(spark, sf_dir), n_merges=12)


def q_bpe_compression(spark, sf_dir) -> DataFrame:
    """Corpus token cost + vocab size after each of the first 12 BPE
    merges (functions/textstats.bpe_compression)."""
    return ts.bpe_compression(_docs(spark, sf_dir), n_merges=12)


def q_theil_sen_trend(spark, sf_dir) -> DataFrame:
    """Robust median-slope trend per event type over the crawl-day
    spine (operators/events.theil_sen_trend)."""
    from .operators.events import theil_sen_trend

    return theil_sen_trend(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_pettitt_change(spark, sf_dir) -> DataFrame:
    """Pettitt change-point localization per event type over the
    crawl-day spine (operators/events.pettitt_change)."""
    from .operators.events import pettitt_change

    return pettitt_change(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_rake_keywords(spark, sf_dir) -> DataFrame:
    """Top-25 RAKE keyword phrases over the corpus
    (functions/textstats.rake_keywords): stopword-delimited candidate
    phrases scored by the integer-scaled deg/freq word score."""
    return ts.rake_keywords(_docs(spark, sf_dir), k=25)


def q_quality_auc(spark, sf_dir) -> DataFrame:
    """Exact tie-aware ROC AUC of the bigram-LM quality score as an
    English-language detector (functions/textstats.roc_auc over
    lm_quality x documents.lang) — the threshold-free evaluation of
    the CCNet-style filter's separating power."""
    docs = _docs(spark, sf_dir)
    scored = (ts.lm_quality(docs)
              .join(docs.select("doc_id", "lang"), "doc_id")
              .select(F.col("lm_score_micro6").alias("score"),
                      (F.col("lang") == "en").cast("int").alias("pos")))
    return ts.roc_auc(scored)


def q_langid_kappa(spark, sf_dir) -> DataFrame:
    """Cohen's kappa between the stopword-density language identifier
    and the ground-truth lang column, binary en-vs-other
    (functions/textstats.cohen_kappa over lang_id) — the
    chance-corrected version of lang_id's raw accuracy."""
    pred = ts.lang_id(_docs(spark, sf_dir)).select(
        F.col("pred_lang").alias("a"),
        F.when(F.col("lang") == "en", "en").otherwise("unk").alias("b"))
    return ts.cohen_kappa(pred)


def q_partition_replication(spark, sf_dir) -> DataFrame:
    """1D hash edge-cut vs 2D grid vertex-cut partitioning audit over
    the entity co-mention graph at P=9
    (operators/graph_algos.partition_replication)."""
    from .operators.graph_algos import partition_replication

    edges, _ = _comention_graph(spark, sf_dir)
    return partition_replication(edges)


def q_isotonic_calibration(spark, sf_dir) -> DataFrame:
    """Isotonic (PAVA) fit of the LM-quality reliability curve
    (functions/textstats.isotonic_fit over quality_calibration) —
    the monotone score->keep-probability map, minimax closed form
    over the 10 rank-decile buckets."""
    return ts.isotonic_fit(
        ts.quality_calibration(_docs(spark, sf_dir))).select(
        "bucket", "n_docs", "n_keep", "keep_rate_micro6",
        "iso_micro6")


def q_ranker_tau(spark, sf_dir) -> DataFrame:
    """Kendall concordance (tau-a + gamma, exact pair counts) between
    the BM25 ranking and the naive raw-tf ordering per gazetteer
    probe term (functions/textstats.ranker_tau over
    bm25_entity_retrieval's top-10 shortlists)."""
    gaz = lk.gazetteer_df(spark)
    ranked = ts.bm25_entity_retrieval(_docs(spark, sf_dir),
                                      gaz.select("alias"))
    return ts.ranker_tau(ranked)


def q_good_turing(spark, sf_dir) -> DataFrame:
    """Good-Turing frequency-of-frequencies smoothing table for the
    corpus unigram distribution, c <= 20
    (functions/textstats.good_turing)."""
    return ts.good_turing(_docs(spark, sf_dir))


def q_zipf_doubling(spark, sf_dir) -> DataFrame:
    """Zipf rank-doubling ratio curve over the trigram vocabulary
    (functions/textstats.zipf_doubling) — exact-integer power-law
    check at ranks 1..256."""
    return ts.zipf_doubling(_docs(spark, sf_dir))


def q_interarrival_stats(spark, sf_dir) -> DataFrame:
    """Per-event-type inter-arrival gap statistics in exact integer
    microseconds (operators/events.interarrival_stats)."""
    from .operators.events import interarrival_stats

    return interarrival_stats(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_host_pareto(spark, sf_dir) -> DataFrame:
    """Pareto/ABC host-concentration curve at 50/80/90/95/99%
    coverage (functions/textstats.host_pareto)."""
    return ts.host_pareto(_docs(spark, sf_dir))


def q_salsa_scores(spark, sf_dir) -> DataFrame:
    """SALSA authority scores over the directed precedence graph via
    the component-weighted stationary closed form
    (operators/graph_algos.salsa_scores)."""
    from .operators.graph_algos import salsa_scores

    edges, _ = _prec_graph(spark, sf_dir)
    return salsa_scores(edges)


def q_fano_factor(spark, sf_dir) -> DataFrame:
    """Fano factor (dispersion vs Poisson) of daily counts per event
    type (operators/events.fano_factor)."""
    from .operators.events import fano_factor

    return fano_factor(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_transition_gini(spark, sf_dir) -> DataFrame:
    """Next-event Gini impurity per predecessor type within sessions
    (operators/events.transition_gini)."""
    from .operators.events import transition_gini

    return transition_gini(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_mann_kendall(spark, sf_dir) -> DataFrame:
    """Mann-Kendall monotone-trend test per event type, exact S and
    tie-corrected variance numerator
    (operators/events.mann_kendall)."""
    from .operators.events import mann_kendall

    return mann_kendall(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_bipartite_check(spark, sf_dir) -> DataFrame:
    """Two-colorability / odd-cycle census per component of the
    entity co-mention graph
    (operators/graph_algos.bipartite_check)."""
    from .operators.graph_algos import bipartite_check

    edges, _ = _comention_graph(spark, sf_dir)
    return bipartite_check(edges)


def q_k_anonymity(spark, sf_dir) -> DataFrame:
    """k-anonymity audit over (host, lang, length-decile) quasi-
    identifiers at k = 2/5/10 (functions/textstats.k_anonymity)."""
    return ts.k_anonymity(_docs(spark, sf_dir))


def q_pred_reciprocity(spark, sf_dir) -> DataFrame:
    """Per-predicate reciprocity (symmetric-relation detection)
    over the triple graph (operators/triples.pred_reciprocity)."""
    return tri_op.pred_reciprocity(_frames(spark, sf_dir).triples)


def q_token_fertility(spark, sf_dir) -> DataFrame:
    """Tokenizer fertility (sub-tokens per word, chars per sub-token)
    per language (functions/textstats.token_fertility)."""
    return ts.token_fertility(_docs(spark, sf_dir))


def q_autocorrelation(spark, sf_dir) -> DataFrame:
    """Exact-integer autocorrelation of daily counts per event type
    at lags 1/2/7 (operators/events.autocorrelation)."""
    from .operators.events import autocorrelation

    return autocorrelation(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_count_sketch(spark, sf_dir) -> DataFrame:
    """Count-sketch (signed, unbiased) vs truth audit per distinct
    token (functions/sketches.count_sketch_estimates)."""
    from .functions.sketches import count_sketch_estimates

    return count_sketch_estimates(_docs(spark, sf_dir))


def q_split_balance(spark, sf_dir) -> DataFrame:
    """Exact TVD of the lang distribution between train/dev/test
    splits (functions/textstats.split_balance)."""
    return ts.split_balance(_docs(spark, sf_dir))


def q_gains_curve(spark, sf_dir) -> DataFrame:
    """Cumulative gains / lift curve of the LM quality score vs the
    curation gate (functions/textstats.gains_curve)."""
    return ts.gains_curve(_docs(spark, sf_dir))


def q_graph_eccentricity(spark, sf_dir) -> DataFrame:
    """Exact eccentricity / radius / diameter over the co-mention
    graph (operators/graph_algos.graph_eccentricity)."""
    from .operators.graph_algos import graph_eccentricity

    edges, _ = _comention_graph(spark, sf_dir)
    return graph_eccentricity(edges)


def q_doclen_drift(spark, sf_dir) -> DataFrame:
    """Exact KS + Wasserstein-1 doc-length drift between splits
    (functions/textstats.doclen_drift)."""
    return ts.doclen_drift(_docs(spark, sf_dir))


def q_weekday_seasonality(spark, sf_dir) -> DataFrame:
    """Weekly-seasonality strength (ANOVA variance share) per event
    type (operators/events.weekday_seasonality)."""
    from .operators.events import weekday_seasonality

    return weekday_seasonality(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_pred_transitivity(spark, sf_dir) -> DataFrame:
    """Chain-closure (transitivity) rate of the mention-precedence
    relation (operators/triples.pred_transitivity over the
    precedence graph labeled 'precedes') — the KG triple graph
    itself has no composable chains (objects never recur as
    subjects), so the precedence DAG is the non-degenerate surface
    for the closure statistic."""
    edges, _ = _prec_graph(spark, sf_dir)
    return tri_op.pred_transitivity(edges.select(
        F.col("src").alias("subj"),
        F.lit("precedes").alias("pred"),
        F.col("dst").alias("obj")))


def q_encoding_advisor(spark, sf_dir) -> DataFrame:
    """Dictionary-encoding benefit audit over documents columns
    (functions/textstats.encoding_advisor)."""
    return ts.encoding_advisor(_docs(spark, sf_dir))


def q_simpson_check(spark, sf_dir) -> DataFrame:
    """Simpson's-paradox audit of the length/keep association,
    pooled vs per-lang (functions/textstats.simpson_check)."""
    return ts.simpson_check(_docs(spark, sf_dir))


def q_hash_uniformity(spark, sf_dir) -> DataFrame:
    """Uniformity audit of the md5-nibble bucket device
    (functions/sketches.hash_uniformity)."""
    from .functions.sketches import hash_uniformity

    return hash_uniformity(_docs(spark, sf_dir))


def q_inclusion_deps(spark, sf_dir) -> DataFrame:
    """Unary inclusion-dependency (FK) discovery over the TPC-H side
    tables (operators/triples.inclusion_deps)."""
    frames = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
              for t in ("region", "nation", "customer", "supplier",
                        "orders", "lineitem", "part")}
    return tri_op.inclusion_deps(frames)


def q_q1_pricing(spark, sf_dir) -> DataFrame:
    """Float-free TPC-H-Q1-style pricing summary over lineitem
    (operators/events.q1_pricing)."""
    from .operators.events import q1_pricing

    return q1_pricing(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"))


def q_embedding_profile(spark, sf_dir) -> DataFrame:
    """Per-dimension embedding health profile, quantized-exact
    moments (operators/similarity.embedding_profile)."""
    from .operators.similarity import embedding_profile

    return embedding_profile(_emb(spark, sf_dir))


def q_label_separation(spark, sf_dir) -> DataFrame:
    """Per-dimension label separability (ANOVA share) over the
    labeled embeddings (operators/similarity.label_separation)."""
    from .operators.similarity import label_separation

    return label_separation(_emb(spark, sf_dir))


def q_ner_confusion(spark, sf_dir) -> DataFrame:
    """Exact-span type-confusion matrix between the dict-NER and
    model-NER paths (operators/evaluate.ner_confusion)."""
    from .operators.evaluate import ner_confusion
    from .operators.model_ner import model_mentions_df

    fr = _frames(spark, sf_dir)
    return ner_confusion(fr.mentions, model_mentions_df(fr.pages))


def q_casing_profile(spark, sf_dir) -> DataFrame:
    """Casing/digit token profile per language
    (functions/textstats.casing_profile)."""
    return ts.casing_profile(_docs(spark, sf_dir))


def q_rich_club(spark, sf_dir) -> DataFrame:
    """Rich-club coefficient over the co-mention graph at k=1/2/4/8
    (operators/graph_algos.rich_club)."""
    from .operators.graph_algos import rich_club

    edges, _ = _comention_graph(spark, sf_dir)
    return rich_club(edges)


def q_type_covariance(spark, sf_dir) -> DataFrame:
    """Cross-type daily co-burst covariance
    (operators/events.type_covariance)."""
    from .operators.events import type_covariance

    return type_covariance(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_zorder_locality(spark, sf_dir) -> DataFrame:
    """Z-order vs user-major layout audit for day-scoped scans
    (operators/events.zorder_locality)."""
    from .operators.events import zorder_locality

    return zorder_locality(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_lateness_audit(spark, sf_dir) -> DataFrame:
    """Watermark-sizing lateness audit over the event stream
    (operators/events.lateness_audit)."""
    from .operators.events import lateness_audit

    return lateness_audit(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_zonemap_pruning(spark, sf_dir) -> DataFrame:
    """Zone-map pruning audit over cumsum-packed files
    (functions/textstats.zonemap_pruning)."""
    return ts.zonemap_pruning(_docs(spark, sf_dir))


def q_peak_prominence(spark, sf_dir) -> DataFrame:
    """Topographic prominence of daily-count peaks per event type
    (operators/events.peak_prominence)."""
    from .operators.events import peak_prominence

    return peak_prominence(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_runs_test(spark, sf_dir) -> DataFrame:
    """Wald-Wolfowitz runs test of daily counts vs the per-type
    lower median (operators/events.runs_test)."""
    from .operators.events import runs_test

    return runs_test(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_mcnemar_gates(spark, sf_dir) -> DataFrame:
    """McNemar paired test between the length and stopword curation
    gates per language (functions/textstats.mcnemar_gates)."""
    return ts.mcnemar_gates(_docs(spark, sf_dir))


def q_mcc_scores(spark, sf_dir) -> DataFrame:
    """Matthews correlation for the lang_id English detector, exact
    integer decomposition (functions/textstats.mcc_scores)."""
    return ts.mcc_scores(_docs(spark, sf_dir))


def q_l_diversity(spark, sf_dir) -> DataFrame:
    """l-diversity + t-closeness of the host attribute within
    (lang, token-decile) classes (functions/textstats.l_diversity)."""
    return ts.l_diversity(_docs(spark, sf_dir))


def q_harmonic_centrality(spark, sf_dir) -> DataFrame:
    """Exact harmonic centrality over the co-mention graph
    (operators/graph_algos.harmonic_centrality)."""
    from .operators.graph_algos import harmonic_centrality

    edges, _ = _comention_graph(spark, sf_dir)
    return harmonic_centrality(edges)


def q_ewma_forecast(spark, sf_dir) -> DataFrame:
    """Dyadic truncated-EWMA one-step volume forecast per event type
    (operators/events.ewma_forecast)."""
    from .operators.events import ewma_forecast

    return ewma_forecast(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_lis_trend(spark, sf_dir) -> DataFrame:
    """Longest monotone subsequence trend strength per event type
    (operators/events.lis_trend)."""
    from .operators.events import lis_trend

    return lis_trend(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_dag_path_counts(spark, sf_dir) -> DataFrame:
    """Exact root-to-node path counts over the precedence SCC
    condensation (operators/graph_algos.dag_path_counts)."""
    from .operators.graph_algos import dag_path_counts

    edges, _ = _prec_graph(spark, sf_dir)
    return dag_path_counts(edges, _prec_scc(spark, sf_dir),
                           n_rounds=10)


def q_eulerian_census(spark, sf_dir) -> DataFrame:
    """Eulerian circuit/trail feasibility per co-mention component
    (operators/graph_algos.eulerian_census)."""
    from .operators.graph_algos import eulerian_census

    edges, _ = _comention_graph(spark, sf_dir)
    return eulerian_census(edges)


def q_pr_curve(spark, sf_dir) -> DataFrame:
    """11-point interpolated PR curve of the bigram-LM quality score
    as an English detector (functions/textstats.pr_curve)."""
    docs = _docs(spark, sf_dir)
    scored = (ts.lm_quality(docs)
              .join(docs.select("doc_id", "lang"), "doc_id")
              .select("doc_id",
                      F.col("lm_score_micro6").alias("score"),
                      (F.col("lang") == "en").cast("int")
                      .alias("pos")))
    return ts.pr_curve(scored)


def q_sq8_audit(spark, sf_dir) -> DataFrame:
    """int8 scalar-quantization loss audit per embedding dimension
    (operators/similarity.sq8_audit)."""
    from .operators.similarity import sq8_audit

    return sq8_audit(_emb(spark, sf_dir))


def q_politeness_audit(spark, sf_dir) -> DataFrame:
    """Crawl-politeness sliding-window burst audit per host
    (functions/urls.politeness_audit)."""
    from .functions import urls as u

    fr = _frames(spark, sf_dir)
    return u.politeness_audit(fr.pages)


def q_jain_fairness(spark, sf_dir) -> DataFrame:
    """Jain's fairness index of doc counts under the candidate
    sharding keys (functions/textstats.jain_fairness)."""
    return ts.jain_fairness(_docs(spark, sf_dir))


def q_spearman_check(spark, sf_dir) -> DataFrame:
    """Tie-aware Spearman rho between the LM quality score and doc
    length (functions/textstats.spearman_check)."""
    docs = _docs(spark, sf_dir)
    scored = (ts.lm_quality(docs)
              .join(docs.select("doc_id", "n_chars"), "doc_id")
              .select(F.col("lm_score_micro6").alias("x"),
                      F.col("n_chars").alias("y")))
    return ts.spearman_check(scored)


def q_series_motifs(spark, sf_dir) -> DataFrame:
    """Quartile-symbol length-3 motif census per event type
    (operators/events.series_motifs)."""
    from .operators.events import series_motifs

    return series_motifs(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_readability_profile(spark, sf_dir) -> DataFrame:
    """Syllable-complexity readability profile per language
    (functions/textstats.readability_profile)."""
    return ts.readability_profile(_docs(spark, sf_dir))


def q_bitmap_runs(spark, sf_dir) -> DataFrame:
    """Roaring-style run/bitmap/list encoding audit of doc_id sets
    per language (functions/textstats.bitmap_runs)."""
    return ts.bitmap_runs(_docs(spark, sf_dir))


def q_sweep_concurrency(spark, sf_dir) -> DataFrame:
    """Sweep-line max concurrency of fact-validity intervals per
    predicate (operators/triples.sweep_concurrency)."""
    return tri_op.sweep_concurrency(
        q_triple_snapshots(spark, sf_dir))


def q_hash_collisions(spark, sf_dir) -> DataFrame:
    """Birthday-collision audit of truncated token hashes
    (functions/sketches.hash_collisions)."""
    from .functions.sketches import hash_collisions

    return hash_collisions(_docs(spark, sf_dir))


def q_lang_vocab_overlap(spark, sf_dir) -> DataFrame:
    """Pairwise vocabulary Jaccard between languages
    (functions/textstats.lang_vocab_overlap)."""
    return ts.lang_vocab_overlap(_docs(spark, sf_dir))


def q_pagerank_delta(spark, sf_dir) -> DataFrame:
    """PageRank convergence audit: exact rank movement between
    iterations 4 and 5 (operators/graph_algos.pagerank_delta)."""
    from .operators.graph_algos import pagerank_delta

    edges = q_graph_edges(spark, sf_dir).selectExpr(
        "subj_node AS src", "obj_node AS dst", "weight")
    return pagerank_delta(edges, n_iter=5)


def q_ivf_quality(spark, sf_dir) -> DataFrame:
    """IVF cell tightness + argmax-margin audit
    (operators/similarity.ivf_quality)."""
    from .operators.similarity import ivf_quality

    return ivf_quality(_emb(spark, sf_dir))


def q_pareto_knee(spark, sf_dir) -> DataFrame:
    """Exact Kneedle knee of the host-coverage Pareto curve
    (functions/textstats.pareto_knee)."""
    return ts.pareto_knee(_docs(spark, sf_dir))


def q_oov_rate(spark, sf_dir) -> DataFrame:
    """OOV audit of dev/test splits vs the train vocabulary
    (functions/textstats.oov_rate)."""
    return ts.oov_rate(_docs(spark, sf_dir))


def q_borda_fusion(spark, sf_dir) -> DataFrame:
    """Truncated Borda-count fusion of the exact cosine top-k and
    the sign-bucket ANN top-3 (operators/similarity.borda_fusion)."""
    emb = _emb(spark, sf_dir)
    exact = sim.brute_force_topk(emb)
    ann = sim.ann_topk(emb).where(F.col("query_id") < 50)
    return sim.borda_fusion([exact, ann])


def q_record_census(spark, sf_dir) -> DataFrame:
    """Running-record census of per-type daily event volumes
    (operators/events.record_census)."""
    from .operators.events import record_census
    return record_census(spark.read.parquet(f"{sf_dir}/events.parquet"))



def q_kruskal_wallis(spark, sf_dir) -> DataFrame:
    """Exact tie-aware Kruskal-Wallis H across language length
    distributions (functions/textstats.kruskal_wallis)."""
    from .functions.textstats import kruskal_wallis
    return kruskal_wallis(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))



def q_wilcoxon_signed(spark, sf_dir) -> DataFrame:
    """Paired Wilcoxon signed-rank test of per-user activity shift
    (operators/events.wilcoxon_signed)."""
    from .operators.events import wilcoxon_signed
    return wilcoxon_signed(
        spark.read.parquet(f"{sf_dir}/events.parquet"))



def q_brier_decomposition(spark, sf_dir) -> DataFrame:
    """Brier score + Murphy decomposition of the bigram-LM quality
    score as an English-detector probability forecast
    (functions/textstats.brier_decomposition)."""
    docs = _docs(spark, sf_dir)
    scored = (ts.lm_quality(docs)
              .join(docs.select("doc_id", "lang"), "doc_id")
              .select(F.col("lm_score_micro6").alias("score"),
                      (F.col("lang") == "en").cast("int")
                      .alias("pos")))
    return ts.brier_decomposition(scored)



def q_markov_stationary(spark, sf_dir) -> DataFrame:
    """Fixed-point stationary distribution of the session
    transition chain vs empirical type shares
    (operators/events.markov_stationary)."""
    from .operators.events import markov_stationary
    return markov_stationary(
        spark.read.parquet(f"{sf_dir}/events.parquet"))



def q_resource_allocation(spark, sf_dir) -> DataFrame:
    """Resource-allocation link-prediction index over the entity
    co-mention graph (graph_algos.resource_allocation)."""
    from .operators.graph_algos import resource_allocation

    edges, _ = _comention_graph(spark, sf_dir)
    return resource_allocation(edges)



def q_chao1_richness(spark, sf_dir) -> DataFrame:
    """Chao1 total-vocabulary estimate + Good's coverage per
    language (functions/textstats.chao1_richness)."""
    return ts.chao1_richness(_docs(spark, sf_dir))



def q_lead_lag(spark, sf_dir) -> DataFrame:
    """Lead-lag cross-covariance audit between event-type daily
    series (operators/events.lead_lag)."""
    from .operators.events import lead_lag
    return lead_lag(spark.read.parquet(f"{sf_dir}/events.parquet"))



def q_embedding_pca(spark, sf_dir) -> DataFrame:
    """Dominant principal component of the embedding cloud by
    integer power iteration (operators/similarity.embedding_pca)."""
    from .operators.similarity import embedding_pca
    return embedding_pca(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"))



def q_mrr_eval(spark, sf_dir) -> DataFrame:
    """MRR / Hits@k of the BM25 ranking per gazetteer surface form
    vs the ideal raw-tf ordering (functions/textstats.mrr_eval)."""
    gaz = lk.gazetteer_df(spark)
    return ts.mrr_eval(_docs(spark, sf_dir), gaz.select("alias"))



def q_clustering_coeffs(spark, sf_dir) -> DataFrame:
    """Local clustering coefficients + global transitivity over the
    entity co-mention graph (graph_algos.clustering_coeffs)."""
    from .operators.graph_algos import clustering_coeffs

    edges, _ = _comention_graph(spark, sf_dir)
    return clustering_coeffs(edges)



def q_cochran_q(spark, sf_dir) -> DataFrame:
    """Cochran's Q omnibus across the three cheap curation gates
    (functions/textstats.cochran_q)."""
    return ts.cochran_q(_docs(spark, sf_dir))



def q_kendall_w(spark, sf_dir) -> DataFrame:
    """Kendall's W concordance across the three cheap quality
    rankers per language (functions/textstats.kendall_w)."""
    return ts.kendall_w(_docs(spark, sf_dir))



def q_soundex_blocks(spark, sf_dir) -> DataFrame:
    """American-Soundex phonetic blocking profile over the entity
    name-token universe (operators/linking.soundex_blocks)."""
    return lk.soundex_blocks(_frames(spark, sf_dir).triples)



def q_stylometric_delta(spark, sf_dir) -> DataFrame:
    """MAD-scaled Burrows' Delta between host writing styles
    (functions/textstats.stylometric_delta)."""
    return ts.stylometric_delta(_docs(spark, sf_dir))



def q_winnow_dups(spark, sf_dir) -> DataFrame:
    """Winnowing fingerprint near-dup candidate pairs
    (operators/dedup.winnow_dups)."""
    from .operators.dedup import winnow_dups
    return winnow_dups(_docs(spark, sf_dir))



def q_anova_f(spark, sf_dir) -> DataFrame:
    """One-way ANOVA F + eta-squared on doc length by language
    (functions/textstats.anova_f)."""
    return ts.anova_f(_docs(spark, sf_dir))



def q_levene_test(spark, sf_dir) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test on doc length by
    language (functions/textstats.levene_test)."""
    return ts.levene_test(_docs(spark, sf_dir))



def q_ols_trend(spark, sf_dir) -> DataFrame:
    """Exact OLS daily-volume trend per event type
    (operators/events.ols_trend)."""
    from .operators.events import ols_trend
    return ols_trend(spark.read.parquet(f"{sf_dir}/events.parquet"))



def q_fleiss_kappa(spark, sf_dir) -> DataFrame:
    """Fleiss' kappa agreement across the three curation gates
    (functions/textstats.fleiss_kappa)."""
    return ts.fleiss_kappa(_docs(spark, sf_dir))



def q_capture_recapture(spark, sf_dir) -> DataFrame:
    """Lincoln-Petersen / Chapman crawl-coverage estimate per host
    (functions/textstats.capture_recapture)."""
    return ts.capture_recapture(_docs(spark, sf_dir))



def q_stump_split(spark, sf_dir) -> DataFrame:
    """Exact decision-stump split search over the three cheap
    signals vs the English label (functions/textstats.stump_split)."""
    return ts.stump_split(_docs(spark, sf_dir))



def q_bradley_terry(spark, sf_dir) -> DataFrame:
    """Bradley-Terry host abilities from per-language median-length
    tournaments (functions/textstats.bradley_terry)."""
    return ts.bradley_terry(_docs(spark, sf_dir))



def q_eb_shrinkage(spark, sf_dir) -> DataFrame:
    """Empirical-Bayes shrinkage of per-host gate pass-rates
    (functions/textstats.eb_shrinkage)."""
    return ts.eb_shrinkage(_docs(spark, sf_dir))



def q_path_rollup(spark, sf_dir) -> DataFrame:
    """Site-section path rollup per host
    (functions/urls.path_rollup)."""
    from .functions.urls import path_rollup
    return path_rollup(_docs(spark, sf_dir))



def q_quantile_normalize(spark, sf_dir) -> DataFrame:
    """Quantile-normalization mapping table across host length
    distributions (functions/textstats.quantile_normalize)."""
    return ts.quantile_normalize(_docs(spark, sf_dir))



def q_weighted_jaccard(spark, sf_dir) -> DataFrame:
    """Exact weighted (bag) Jaccard verify over the LSH candidate
    pairs (operators/dedup.weighted_jaccard)."""
    docs = _docs(spark, sf_dir)
    sh = dd.shingles(docs)
    pairs = dd.lsh_candidate_pairs(dd.lsh_bands(
        dd.minhash_signatures(sh)))
    return dd.weighted_jaccard(pairs, docs)



def q_eigen_centrality(spark, sf_dir) -> DataFrame:
    """Eigenvector centrality + spectral-radius estimate over the
    entity co-mention graph (graph_algos.eigen_centrality)."""
    from .operators.graph_algos import eigen_centrality

    edges, _ = _comention_graph(spark, sf_dir)
    return eigen_centrality(edges)



def q_lexical_topk(spark, sf_dir) -> DataFrame:
    """Sparse tf-idf lexical top-k similarity join with rare-term
    blocking (functions/textstats.lexical_topk)."""
    return ts.lexical_topk(_docs(spark, sf_dir))


def q_ta_depth_audit(spark, sf_dir) -> DataFrame:
    """Fagin TA stop-depth audit over (LM quality x doc length) per
    language (functions/textstats.ta_depth_audit)."""
    docs = _docs(spark, sf_dir)
    scored = (ts.lm_quality(docs)
              .join(docs.select("doc_id", "lang", "n_chars"),
                    "doc_id")
              .select("doc_id", F.col("lang").alias("group"),
                      F.col("lm_score_micro6").alias("s1"),
                      F.col("n_chars").alias("s2")))
    return ts.ta_depth_audit(scored)


def q_hash_ring(spark, sf_dir) -> DataFrame:
    """Consistent-hash ring balance audit over crawl sources
    (operators/skew.hash_ring)."""
    from .operators.skew import hash_ring
    return hash_ring(_docs(spark, sf_dir))


def q_sorted_neighborhood(spark, sf_dir) -> DataFrame:
    """Sorted-neighborhood blocking audit vs the exact-dup truth
    (operators/linking.sorted_neighborhood)."""
    from .operators.linking import sorted_neighborhood
    return sorted_neighborhood(_docs(spark, sf_dir))


def q_robust_location(spark, sf_dir) -> DataFrame:
    """Exact trimmed/winsorized doc-length means per language
    (functions/textstats.robust_location)."""
    return ts.robust_location(_docs(spark, sf_dir))


def q_stress_centrality(spark, sf_dir) -> DataFrame:
    """Exact stress centrality (geodesics through each node) over
    the co-mention graph (operators/graph_algos.stress_centrality)."""
    from .operators.graph_algos import stress_centrality

    edges, _ = _comention_graph(spark, sf_dir)
    return stress_centrality(edges)


def q_complex_scores(spark, sf_dir) -> DataFrame:
    """Integer ComplEx score per distinct fact — the asymmetric
    third embedding scoring family
    (operators/kg_embed.complex_scores)."""
    from .operators.kg_embed import complex_scores

    return complex_scores(_frames(spark, sf_dir).triples)


def q_seq_patterns(spark, sf_dir) -> DataFrame:
    """Gapped length-2 sequential-pattern support over event
    sessions (operators/events.seq_patterns)."""
    from .operators.events import seq_patterns
    return seq_patterns(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_neyman_allocation(spark, sf_dir) -> DataFrame:
    """Exact Neyman sampling-budget allocation across languages
    (operators/sampling.neyman_allocation)."""
    from .operators.sampling import neyman_allocation
    return neyman_allocation(_docs(spark, sf_dir))


def q_cdc_chunks(spark, sf_dir) -> DataFrame:
    """Content-defined chunking dedup census over the corpus
    (operators/dedup.cdc_chunks)."""
    from .operators.dedup import cdc_chunks
    return cdc_chunks(_docs(spark, sf_dir))


def q_mann_whitney(spark, sf_dir) -> DataFrame:
    """Exact tie-aware Mann-Whitney U between every language pair's
    doc-length distributions (functions/textstats.mann_whitney)."""
    return ts.mann_whitney(_docs(spark, sf_dir))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ORDER IS LOAD-BEARING: the driver snapshot verifies exactly
    # list(QUERIES)[:50] in insertion order (pinned by
    # tests/test_registry_order.py).  Round-5 rotation: the 3 PQ
    # queries (registered this round) and the 4 round-5 staged queries
    # lead, then the 42 keys that sat past round 4's snapshot
    # (driver-green in r01-r03), then quality_model (value oracle
    # upgraded this round) closes the prefix.  Keys 51+ all have green
    # driver rows in CORRECTNESS_r04.json.
    "pq_codebook": q_pq_codebook,
    "pq_codes": q_pq_codes,
    "pq_search": q_pq_search,
    "substring_spans": q_substring_spans,
    "cut_substrings": q_cut_substrings,
    "maximal_repeats": q_maximal_repeats,
    "lpa_communities": q_lpa_communities,
    "relations_fused": q_relations_fused,
    "wide_table": q_wide_table,
    "distinct_subjects": q_distinct_subjects,
    "link_mentions": q_link_mentions,
    "canonical_components": q_canonical_components,
    "fuzzy_alias_candidates": q_fuzzy_alias_candidates,
    "mentions_second_pass": q_mentions_second_pass,
    "graph_nodes": q_graph_nodes,
    "graph_edges": q_graph_edges,
    "eval_mentions": q_eval_mentions,
    "eval_mentions_micro": q_eval_mentions_micro,
    "eval_relations_lenient": q_eval_relations_lenient,
    "eval_triples": q_eval_triples,
    "eval_triples_by_pred": q_eval_triples_by_pred,
    "iob2_labels": q_iob2_labels,
    "mentions_model": q_mentions_model,
    "mentions_perceptron": q_mentions_perceptron,
    "host_stats": q_host_stats,
    "candidates_labeled": q_candidates_labeled,
    "candidates_sampled": q_candidates_sampled,
    "eval_re_accuracy": q_eval_re_accuracy,
    "minhash_signatures": q_minhash_signatures,
    "lsh_bands": q_lsh_bands,
    "near_duplicates": q_near_duplicates,
    "simhash": q_simhash,
    "quality_features": q_quality_features,
    "lang_id": q_lang_id,
    "token_count_bpe": q_token_count_bpe,
    "fingerprint": q_fingerprint,
    "top_terms_tfidf": q_top_terms_tfidf,
    "similarity_topk": q_similarity_topk,
    "ann_buckets": q_ann_buckets,
    "srp_buckets": q_srp_buckets,
    "ann_topk": q_ann_topk,
    "events_hourly": q_events_hourly,
    "retention_cohorts": q_retention_cohorts,
    "session_funnel": q_session_funnel,
    "triples_daily": q_triples_daily,
    "events_asof": q_events_asof,
    "cooccurrence_pmi": q_cooccurrence_pmi,
    "corpus_split": q_corpus_split,
    "decontaminate": q_decontaminate,
    "quality_model": q_quality_model,
    "triples_fused": q_triples_fused,
    "mentions": q_mentions,
    "extract_text": q_extract_text,
    "duplicated_spans": q_duplicated_spans,
    "cut_spans": q_cut_spans,
    "url_redirects": q_url_redirects,
    "cc_update": q_cc_update,
    "repetition_features": q_repetition_features,
    "corpus_export": q_corpus_export,
    "pack_sequences": q_pack_sequences,
    "mixture_sample": q_mixture_sample,
    "lm_quality": q_lm_quality,
    "source_stats": q_source_stats,
    "media_features": q_media_features,
    "bigram_lm": q_bigram_lm,
    "corpus_curation": q_corpus_curation,
    "candidates_balanced": q_candidates_balanced,
    "eval_mentions_lenient": q_eval_mentions_lenient,
    "eval_mentions_macro": q_eval_mentions_macro,
    "eval_mentions_by_doc": q_eval_mentions_by_doc,
    "sessionize": q_sessionize,
    "pagerank": q_pagerank,
    "graph_ppr": q_graph_ppr,
    "graph_bfs": q_graph_bfs,
    "graph_degrees": q_graph_degrees,
    "related_topics": q_related_topics,
    "component_sizes": q_component_sizes,
    "embedding_near_dups": q_embedding_near_dups,
    "ivf_assign": q_ivf_assign,
    "dup_clusters": q_dup_clusters,
    "containment_dups": q_containment_dups,
    "ivf_centroids": q_ivf_centroids,
    "ivf_topk": q_ivf_topk,
    "url_canonical": q_url_canonical,
    "boilerplate_strip": q_boilerplate_strip,
    "kg_support": q_kg_support,
    "entity_centroids": q_entity_centroids,
    "passage_dups": q_passage_dups,
    "entity_neighbors": q_entity_neighbors,
    "triple_history": q_triple_history,
    "simhash_near_dups": q_simhash_near_dups,
    "graph_triangles": q_graph_triangles,
    "entity_first_seen": q_entity_first_seen,
    "tokenize": q_tokenize,
    "shards": q_shards,
    "candidates": q_candidates,
    "relations": q_relations,
    "triples": q_triples,
    "dedup_exact": q_dedup_exact,
    # Round-5 continuation: the staged round-6 oracles, registered at
    # the TAIL — appends past position 50 leave the driver's
    # snapshot prefix bit-identical (the freeze protects the prefix),
    # while giving the full-registry sweep value-exact rows for the
    # round-5 pytest-only ops.
    "kcore_nodes": q_kcore_nodes,
    "ktruss_edges": q_ktruss_edges,
    "entity_walks": q_entity_walks,
    "link_pred": q_link_pred,
    "pq_rerank": q_pq_rerank,
    "ivfpq_codes": q_ivfpq_codes,
    "textrank_tokens": q_textrank_tokens,
    "hll_shingles": q_hll_shingles,
    "cm_tokens": q_cm_tokens,
    "cm_token_est": q_cm_token_est,
    "alias_edit_links": q_alias_edit_links,
    "bloom_bits": q_bloom_bits,
    "bloom_decontam": q_bloom_decontam,
    "triple_snapshots": q_triple_snapshots,
    "bm25_entities": q_bm25_entities,
    "entity_salience": q_entity_salience,
    "pred_lift": q_pred_lift,
    "doclen_hist": q_doclen_hist,
    "kg_neg_samples": q_kg_neg_samples,
    "pred_signatures": q_pred_signatures,
    "pred_obj_linkage": q_pred_obj_linkage,
    "entity_assoc": q_entity_assoc,
    "walk_centrality": q_walk_centrality,
    "degree_dist": q_degree_dist,
    "rrf_fusion": q_rrf_fusion,
    "clustering_coeff": q_clustering_coeff,
    "pred_violations": q_pred_violations,
    "pred_drift": q_pred_drift,
    "ntriples_export": q_ntriples_export,
    "pred_cardinality": q_pred_cardinality,
    "object_rules": q_object_rules,
    "entity_jaccard": q_entity_jaccard,
    "hits_scores": q_hits_scores,
    "kg_asof": q_kg_asof,
    "interval_conflicts": q_interval_conflicts,
    "entity_types": q_entity_types,
    "star_query": q_star_query,
    "attr_merge_clusters": q_attr_merge_clusters,
    "wl_labels": q_wl_labels,
    "schema_graph": q_schema_graph,
    "kg_churn": q_kg_churn,
    "hapax_objects": q_hapax_objects,
    "trending_entities": q_trending_entities,
    "graph_distances": q_graph_distances,
    "jaccard_best_match": q_jaccard_best_match,
    "warc_roundtrip": q_warc_roundtrip,
    "pred_jaccard": q_pred_jaccard,
    "degree_assortativity": q_degree_assortativity,
    "community_stats": q_community_stats,
    "pred_ifp": q_pred_ifp,
    "shingle_novelty": q_shingle_novelty,
    "host_entity_overlap": q_host_entity_overlap,
    "url_recrawl_priority": q_url_recrawl_priority,
    "merge_cluster_stats": q_merge_cluster_stats,
    "doclen_percentiles": q_doclen_percentiles,
    "postings_lists": q_postings_lists,
    "partition_agreement": q_partition_agreement,
    "claim_beliefs": q_claim_beliefs,
    "source_trust": q_source_trust,
    "kg_resolved": q_kg_resolved,
    "host_error_rate": q_host_error_rate,
    "literal_profiles": q_literal_profiles,
    "typed_wedges": q_typed_wedges,
    "kg_completeness": q_kg_completeness,
    "extraction_yield": q_extraction_yield,
    # Continuation batch 23: SPARQL-algebra read paths — appended
    # past position 50, prefix untouched.
    "chain_patterns": q_chain_patterns,
    "optional_query": q_optional_query,
    "negation_query": q_negation_query,
    # Continuation batch 24: integer TransE scoring + filtered
    # link-prediction ranks — appended past position 50.
    "transe_scores": q_transe_scores,
    "transe_ranks": q_transe_ranks,
    # Continuation batch 25: exact integer modularity — appended past
    # position 50.
    "modularity": q_modularity,
    # Continuation batch 26: meta-blocking entity resolution —
    # appended past position 50.
    "token_blocks": q_token_blocks,
    "meta_block_edges": q_meta_block_edges,
    # Continuation batch 27: exact 2-D Pareto skyline — appended past
    # position 50.
    "entity_skyline": q_entity_skyline,
    # Continuation batch 28: deterministic weighted bottom-k sampling
    # — appended past position 50.
    "weighted_sample": q_weighted_sample,
    # Continuation batch 29: approximate functional dependencies —
    # appended past position 50.
    "pred_fds": q_pred_fds,
    # Continuation batch 30: per-fact SCD2 run/gap/uptime profile —
    # appended past position 50.
    "fact_runs": q_fact_runs,
    # Continuation batch 31: directed precedence graph -> SCC ->
    # web-bowtie decomposition — appended past position 50.
    "precedence_edges": q_precedence_edges,
    "scc_components": q_scc_components,
    "bowtie_structure": q_bowtie_structure,
    # Continuation batch 32: greedy max-coverage corpus selection —
    # appended past position 50.
    "greedy_coverage": q_greedy_coverage,
    # Continuation batch 33: exact set-similarity join by prefix
    # filtering — appended past position 50.
    "prefix_filter_pairs": q_prefix_filter_pairs,
    # Continuation batch 34: Luby maximal independent set — appended
    # past position 50.
    "mis_nodes": q_mis_nodes,
    # Continuation batch 35: RDFS domain/range type inference —
    # appended past position 50.
    "type_inference": q_type_inference,
    # Continuation batch 36: sorted-neighborhood blocking — appended
    # past position 50.
    "sn_pairs": q_sn_pairs,
    # Continuation batch 37: truncated integer Katz centrality —
    # appended past position 50.
    "katz_scores": q_katz_scores,
    # Continuation batch 38: bipartite butterfly counts — appended
    # past position 50.
    "butterflies": q_butterflies,
    # Continuation batch 39: B-cubed clustering evaluation — appended
    # past position 50.
    "bcubed": q_bcubed,
    # Continuation batch 40: co-citation + bibliographic coupling —
    # appended past position 50.
    "cocitation": q_cocitation,
    # Continuation batch 41: Boruvka minimum spanning forest —
    # appended past position 50.
    "msf_edges": q_msf_edges,
    # Continuation batch 42: HyperBall neighborhood function —
    # appended past position 50.
    "hyperball": q_hyperball,
    # Continuation batch 43: neighborhood-function distribution —
    # appended past position 50.
    "nf_distribution": q_nf_distribution,
    # Continuation batch 44: fixed-round integer SimRank — appended
    # past position 50.
    "simrank": q_simrank,
    # Continuation batch 45: blocking-quality metrics (PC/RR) —
    # appended past position 50.
    "blocking_metrics": q_blocking_metrics,
    # Continuation batch 46: edge triangle support / local bridges —
    # appended past position 50.
    "local_bridges": q_local_bridges,
    # Continuation batch 47: 3-node graphlet orbit counts — appended
    # past position 50.
    "orbit_counts": q_orbit_counts,
    # Continuation batch 48: bounded property-path reachability —
    # appended past position 50.
    "rpq_reach": q_rpq_reach,
    # Continuation batch 49: rolling per-day HLL distinct estimates —
    # appended past position 50.
    "rolling_entity_hll": q_rolling_entity_hll,
    # Continuation batch 50: categorical type-mixing matrix —
    # appended past position 50.
    "type_mixing": q_type_mixing,
    # Continuation batch 51: deterministic independent-cascade
    # spread — appended past position 50.
    "ic_spread": q_ic_spread,
    # Continuation batch 52: boolean-retrieval read path — appended
    # past position 50.
    "boolean_search": q_boolean_search,
    # Continuation batch 53: mention-concentration Gini — appended
    # past position 50.
    "mention_gini": q_mention_gini,
    # Continuation batch 55: k-core decomposition by H-index
    # iteration — appended past position 50.
    "core_numbers": q_core_numbers,
    # Continuation batch 56: landmark closeness/harmonic centrality —
    # appended past position 50.
    "landmark_centrality": q_landmark_centrality,
    # Continuation batch 57: Fellegi-Sunter probabilistic record
    # linkage — appended past position 50.
    "fs_weights": q_fs_weights,
    "fs_scores": q_fs_scores,
    # Continuation batch 58: AMS tug-of-war F2 sketch — appended past
    # position 50.
    "ams_f2": q_ams_f2,
    # Continuation batch 59: KMV bottom-k theta distinct sketch —
    # appended past position 50.
    "kmv_entities": q_kmv_entities,
    # Continuation batch 60: theta-sketch set operations between host
    # entity sets — appended past position 50.
    "theta_host_sets": q_theta_host_sets,
    # Continuation batch 61: rendezvous-hash resharding plan —
    # appended past position 50.
    "shard_rebalance": q_shard_rebalance,
    # Continuation batch 63: Kleinberg burst detection — appended past
    # position 50.
    "event_bursts": q_event_bursts,
    # Continuation batch 64: Allen interval-algebra profile — appended
    # past position 50.
    "allen_relations": q_allen_relations,
    # Continuation batch 65: V-optimal histogram DP — appended past
    # position 50.
    "vopt_histogram": q_vopt_histogram,
    # Continuation batch 66: consecutive session trigram patterns —
    # appended past position 50.
    "session_trigrams": q_session_trigrams,
    # Continuation batch 68: weighted-interval-scheduling timeline
    # repair — appended past position 50.
    "timeline_repair": q_timeline_repair,
    # Continuation batch 69: Dunning-LLR distinctive shingles per
    # source — appended past position 50.
    "host_terms": q_host_terms,
    # Continuation batch 70: NDCG@10 retrieval evaluation of the BM25
    # ranking — appended past position 50.
    "retrieval_ndcg": q_retrieval_ndcg,
    # Continuation batch 71: term-proximity minimal co-occurrence
    # window — appended past position 50.
    "term_proximity": q_term_proximity,
    # Continuation batch 72: query-biased snippet extraction —
    # appended past position 50.
    "snippet_windows": q_snippet_windows,
    # Continuation batch 73: entity-card fact ranking — appended past
    # position 50.
    "entity_cards": q_entity_cards,
    # Continuation batch 74: Jones-Plassmann greedy graph coloring —
    # appended past position 50.
    "graph_coloring": q_graph_coloring,
    # Continuation batch 75: LSH candidate-quality evaluation —
    # appended past position 50.
    "lsh_eval": q_lsh_eval,
    # Continuation batch 77: Hamilton crawl-budget apportionment —
    # appended past position 50.
    "crawl_budget": q_crawl_budget,
    # Continuation batch 78: type-ahead completion index — appended
    # past position 50.
    "completions": q_completions,
    # Continuation batch 79: critical-path layering of the SCC
    # condensation — appended past position 50.
    "dag_layers": q_dag_layers,
    # Continuation batch 80: locally-dominant-edge weighted matching —
    # appended past position 50.
    "dominant_matching": q_dominant_matching,
    # Continuation batch 81: multi-probe SRP ANN — appended past
    # position 50.
    "srp_multiprobe": q_srp_multiprobe,
    # Continuation batch 82: content-syndication provenance graph —
    # appended past position 50.
    "syndication_edges": q_syndication_edges,
    # Continuation batch 83: dedup-threshold tuning curve — appended
    # past position 50.
    "dup_rate_curve": q_dup_rate_curve,
    # Continuation batch 84: per-(page, entity) evidence snippets —
    # appended past position 50.
    "evidence_snippets": q_evidence_snippets,
    # Continuation batch 85: DistMult scoring + ranker agreement —
    # appended past position 50.
    "distmult_scores": q_distmult_scores,
    "scorer_agreement": q_scorer_agreement,
    # Continuation batch 86: single-linkage clusters via MSF cut —
    # appended past position 50.
    "single_linkage": q_single_linkage,
    # Continuation batch 87: join-skew hot-key profile — appended
    # past position 50.
    "join_skew": q_join_skew,
    # Continuation batch 88: one-pass GROUPING-SETS fact rollup —
    # appended past position 50.
    "fact_rollup": q_fact_rollup,
    # Continuation batch 89: Bloomjoin semi-join reduction audit —
    # appended past position 50.
    "bloom_semi_join": q_bloom_semi_join,
    # Continuation batch 90: densest subgraph by greedy peeling —
    # appended past position 50.
    "densest_subgraph": q_densest_subgraph,
    # Continuation batch 91: Z-order vs linear layout pruning audit —
    # appended past position 50.
    "layout_pruning": q_layout_pruning,
    # Continuation batch 92: 3-D Pareto-frontier skyline —
    # appended past position 50.
    "skyline_3d": q_skyline_3d,
    # Continuation batch 93: a-priori frequent itemsets — appended
    # past position 50.
    "apriori_itemsets": q_apriori_itemsets,
    # Continuation batch 94: LM-quality reliability calibration —
    # appended past position 50.
    "quality_calibration": q_quality_calibration,
    # Continuation batch 95: robust median/MAD host outliers —
    # appended past position 50.
    "host_outliers": q_host_outliers,
    # Continuation batch 96: gate-fairness chi-square per source —
    # appended past position 50.
    "source_gate_chi2": q_source_gate_chi2,
    # Continuation batch 97: hub-removal robustness probe — appended
    # past position 50.
    "hub_robustness": q_hub_robustness,
    # Continuation batch 98: PII scrubbing pass — appended past
    # position 50.
    "pii_scrub": q_pii_scrub,
    # Continuation batch 99: CUSUM drift alarms — appended past
    # position 50.
    "cusum_drift": q_cusum_drift,
    # Continuation batch 100: Heaps vocabulary growth — appended
    # past position 50.
    "vocab_growth": q_vocab_growth,
    # Continuation batch 102: Theil-Sen robust trend — appended past
    # position 50 (batch 101 is the streaming CUSUM twin, pytest-
    # gated like all streaming ops).
    "theil_sen_trend": q_theil_sen_trend,
    "benford_digits": q_benford_digits,
    "mmr_rerank": q_mmr_rerank,
    "bpe_merges": q_bpe_merges,
    "bpe_compression": q_bpe_compression,
    "pettitt_change": q_pettitt_change,
    # Continuation batch 108: RAKE keyword extraction — appended past
    # position 50.
    "rake_keywords": q_rake_keywords,
    # Continuation batch 109: exact tie-aware ROC AUC of the LM
    # quality score — appended past position 50.
    "quality_auc": q_quality_auc,
    # Continuation batch 110: Cohen's kappa for the language
    # identifier — appended past position 50.
    "langid_kappa": q_langid_kappa,
    # Continuation batch 111: 1D vs 2D graph-partitioning audit —
    # appended past position 50.
    "partition_replication": q_partition_replication,
    # Continuation batch 112: isotonic calibration of the quality
    # reliability curve — appended past position 50.
    "isotonic_calibration": q_isotonic_calibration,
    # Continuation batch 113: Kendall ranker concordance — appended
    # past position 50.
    "ranker_tau": q_ranker_tau,
    # Continuation batch 114: Good-Turing smoothing table — appended
    # past position 50.
    "good_turing": q_good_turing,
    # Continuation batch 115: Zipf rank-doubling curve — appended
    # past position 50.
    "zipf_doubling": q_zipf_doubling,
    # Continuation batch 116: inter-arrival gap statistics —
    # appended past position 50.
    "interarrival_stats": q_interarrival_stats,
    # Continuation batch 117: host Pareto coverage curve — appended
    # past position 50.
    "host_pareto": q_host_pareto,
    # Continuation batch 118: SALSA closed-form authority scores —
    # appended past position 50.
    "salsa_scores": q_salsa_scores,
    # Continuation batch 119: Fano dispersion factor — appended past
    # position 50.
    "fano_factor": q_fano_factor,
    # Continuation batch 120: next-event transition Gini — appended
    # past position 50.
    "transition_gini": q_transition_gini,
    # Continuation batch 121: Mann-Kendall trend test — appended past
    # position 50.
    "mann_kendall": q_mann_kendall,
    # Continuation batch 122: bipartiteness / odd-cycle census —
    # appended past position 50.
    "bipartite_check": q_bipartite_check,
    # Continuation batch 123: k-anonymity audit — appended past
    # position 50.
    "k_anonymity": q_k_anonymity,
    # Continuation batch 124: per-pred reciprocity — appended past
    # position 50.
    "pred_reciprocity": q_pred_reciprocity,
    # Continuation batch 125: tokenizer fertility per language —
    # appended past position 50.
    "token_fertility": q_token_fertility,
    # Continuation batch 126: daily-count autocorrelation — appended
    # past position 50.
    "autocorrelation": q_autocorrelation,
    # Continuation batch 127: signed count-sketch audit — appended
    # past position 50.
    "count_sketch": q_count_sketch,
    # Continuation batch 128: split-balance TVD audit — appended past
    # position 50.
    "split_balance": q_split_balance,
    # Continuation batch 129: cumulative gains / lift curve —
    # appended past position 50.
    "gains_curve": q_gains_curve,
    # Continuation batch 130: exact eccentricity/diameter audit —
    # appended past position 50.
    "graph_eccentricity": q_graph_eccentricity,
    # Continuation batch 131: KS + W1 doc-length drift — appended
    # past position 50.
    "doclen_drift": q_doclen_drift,
    # Continuation batch 132: weekday seasonality strength — appended
    # past position 50.
    "weekday_seasonality": q_weekday_seasonality,
    # Continuation batch 133: predicate transitivity — appended past
    # position 50.
    "pred_transitivity": q_pred_transitivity,
    # Continuation batch 134: dictionary-encoding advisor — appended
    # past position 50.
    "encoding_advisor": q_encoding_advisor,
    # Continuation batch 135: Simpson's-paradox audit — appended past
    # position 50.
    "simpson_check": q_simpson_check,
    # Continuation batch 137: hash-uniformity audit — appended past
    # position 50.
    "hash_uniformity": q_hash_uniformity,
    # Continuation batch 138: inclusion-dependency discovery —
    # appended past position 50.
    "inclusion_deps": q_inclusion_deps,
    # Continuation batch 139: float-free Q1 pricing summary —
    # appended past position 50.
    "q1_pricing": q_q1_pricing,
    # Continuation batch 140: embedding health profile — appended
    # past position 50.
    "embedding_profile": q_embedding_profile,
    # Continuation batch 141: embedding label separability —
    # appended past position 50.
    "label_separation": q_label_separation,
    # Continuation batch 142: NER type-confusion matrix — appended
    # past position 50.
    "ner_confusion": q_ner_confusion,
    # Continuation batch 143: casing/digit profile — appended past
    # position 50.
    "casing_profile": q_casing_profile,
    # Continuation batch 144: rich-club coefficient — appended past
    # position 50.
    "rich_club": q_rich_club,
    # Continuation batch 145: cross-type co-burst covariance —
    # appended past position 50.
    "type_covariance": q_type_covariance,
    # Continuation batch 146: watermark lateness audit — appended
    # past position 50.
    "lateness_audit": q_lateness_audit,
    # Continuation batch 147: Z-order layout audit — appended past
    # position 50.
    "zorder_locality": q_zorder_locality,
    # Continuation batch 148: zone-map pruning audit — appended past
    # position 50.
    "zonemap_pruning": q_zonemap_pruning,
    # Continuation batch 149: peak prominence — appended past
    # position 50.
    "peak_prominence": q_peak_prominence,
    # Continuation batch 150: Wald-Wolfowitz runs test — appended
    # past position 50.
    "runs_test": q_runs_test,
    # Continuation batch 151: McNemar paired-gate check — appended
    # past position 50.
    "mcnemar_gates": q_mcnemar_gates,
    # Continuation batch 152: Matthews correlation — appended past
    # position 50.
    "mcc_scores": q_mcc_scores,
    # Continuation batch 153: l-diversity / t-closeness — appended
    # past position 50.
    "l_diversity": q_l_diversity,
    # Continuation batch 154: harmonic centrality — appended past
    # position 50.
    "harmonic_centrality": q_harmonic_centrality,
    # Continuation batch 155: EWMA forecast — appended past
    # position 50.
    "ewma_forecast": q_ewma_forecast,
    # Continuation batch 156: LIS trend strength — appended past
    # position 50.
    "lis_trend": q_lis_trend,
    # Continuation batch 157: DAG path counts — appended past
    # position 50.
    "dag_path_counts": q_dag_path_counts,
    # Continuation batch 158: Eulerian census — appended past
    # position 50.
    "eulerian_census": q_eulerian_census,
    # Continuation batch 159: interpolated PR curve — appended past
    # position 50.
    "pr_curve": q_pr_curve,
    # Continuation batch 160: SQ8 quantization audit — appended past
    # position 50.
    "sq8_audit": q_sq8_audit,
    # Continuation batch 161: politeness audit — appended past
    # position 50.
    "politeness_audit": q_politeness_audit,
    # Continuation batch 162: Jain fairness — appended past
    # position 50.
    "jain_fairness": q_jain_fairness,
    # Continuation batch 163: Spearman rho — appended past
    # position 50.
    "spearman_check": q_spearman_check,
    # Continuation batch 164: series motifs — appended past
    # position 50.
    "series_motifs": q_series_motifs,
    # Continuation batch 165: readability profile — appended past
    # position 50.
    "readability_profile": q_readability_profile,
    # Continuation batch 166: bitmap-runs encoding audit — appended
    # past position 50.
    "bitmap_runs": q_bitmap_runs,
    # Continuation batch 167: sweep-line concurrency — appended past
    # position 50.
    "sweep_concurrency": q_sweep_concurrency,
    # Continuation batch 168: hash-collision audit — appended past
    # position 50.
    "hash_collisions": q_hash_collisions,
    # Continuation batch 169: language vocab overlap — appended past
    # position 50.
    "lang_vocab_overlap": q_lang_vocab_overlap,
    # Continuation batch 170: pagerank convergence delta — appended
    # past position 50.
    "pagerank_delta": q_pagerank_delta,
    # Continuation batch 171: IVF quality audit — appended past
    # position 50.
    "ivf_quality": q_ivf_quality,
    # Continuation batch 172: Pareto knee — appended past
    # position 50.
    "pareto_knee": q_pareto_knee,
    # Continuation batch 173: OOV audit — appended past position 50.
    "oov_rate": q_oov_rate,
    # Continuation batch 176: Borda fusion — appended past
    # position 50.
    "borda_fusion": q_borda_fusion,
    # Continuation batch 177: Mann-Whitney location-shift audit —
    # appended past position 50.
    "mann_whitney": q_mann_whitney,
    # Continuation batch 178: content-defined chunking census —
    # appended past position 50.
    "cdc_chunks": q_cdc_chunks,
    # Continuation batch 179: Neyman allocation — appended past
    # position 50.
    "neyman_allocation": q_neyman_allocation,
    # Continuation batch 180: gapped sequential patterns — appended
    # past position 50.
    "seq_patterns": q_seq_patterns,
    # Continuation batch 181: ComplEx fact scoring — appended past
    # position 50.
    "complex_scores": q_complex_scores,
    # Continuation batch 182: stress centrality — appended past
    # position 50.
    "stress_centrality": q_stress_centrality,
    # Continuation batch 183: robust location audit — appended past
    # position 50.
    "robust_location": q_robust_location,
    # Continuation batch 184: sorted-neighborhood blocking —
    # appended past position 50.
    "sorted_neighborhood": q_sorted_neighborhood,
    # Continuation batch 185: consistent-hash ring audit — appended
    # past position 50.
    "hash_ring": q_hash_ring,
    # Continuation batch 186: Fagin TA depth audit — appended past
    # position 50.
    "ta_depth_audit": q_ta_depth_audit,
    # Continuation batch 187: running-record census — appended past
    # position 50.
    "record_census": q_record_census,
    # Continuation batch 188: Kruskal-Wallis omnibus rank test —
    # appended past position 50.
    "kruskal_wallis": q_kruskal_wallis,
    # Continuation batch 189: Wilcoxon signed-rank shift test —
    # appended past position 50.
    "wilcoxon_signed": q_wilcoxon_signed,
    # Continuation batch 190: Brier + Murphy decomposition —
    # appended past position 50.
    "brier_decomposition": q_brier_decomposition,
    # Continuation batch 191: Markov stationary distribution —
    # appended past position 50.
    "markov_stationary": q_markov_stationary,
    # Continuation batch 192: resource-allocation link prediction —
    # appended past position 50.
    "resource_allocation": q_resource_allocation,
    # Continuation batch 193: Chao1 vocabulary richness — appended
    # past position 50.
    "chao1_richness": q_chao1_richness,
    # Continuation batch 194: lead-lag cross-covariance — appended
    # past position 50.
    "lead_lag": q_lead_lag,
    # Continuation batch 195: embedding PCA power iteration —
    # appended past position 50.
    "embedding_pca": q_embedding_pca,
    # Continuation batch 196: BM25 MRR / Hits@k eval — appended
    # past position 50.
    "mrr_eval": q_mrr_eval,
    # Continuation batch 197: clustering coefficients — appended
    # past position 50.
    "clustering_coeffs": q_clustering_coeffs,
    # Continuation batch 198: Cochran's Q gate omnibus — appended
    # past position 50.
    "cochran_q": q_cochran_q,
    # Continuation batch 199: Kendall's W ranker concordance —
    # appended past position 50.
    "kendall_w": q_kendall_w,
    # Continuation batch 200: Soundex phonetic blocking — appended
    # past position 50.
    "soundex_blocks": q_soundex_blocks,
    # Continuation batch 201: stylometric Burrows' Delta — appended
    # past position 50.
    "stylometric_delta": q_stylometric_delta,
    # Continuation batch 202: winnowing fingerprints — appended
    # past position 50.
    "winnow_dups": q_winnow_dups,
    # Continuation batch 203: one-way ANOVA F — appended past
    # position 50.
    "anova_f": q_anova_f,
    # Continuation batch 204: Brown-Forsythe variance test —
    # appended past position 50.
    "levene_test": q_levene_test,
    # Continuation batch 205: OLS daily trend — appended past
    # position 50.
    "ols_trend": q_ols_trend,
    # Continuation batch 206: Fleiss' kappa gate agreement —
    # appended past position 50.
    "fleiss_kappa": q_fleiss_kappa,
    # Continuation batch 207: capture-recapture coverage — appended
    # past position 50.
    "capture_recapture": q_capture_recapture,
    # Continuation batch 208: decision-stump split search —
    # appended past position 50.
    "stump_split": q_stump_split,
    # Continuation batch 209: Bradley-Terry pairwise ranking —
    # appended past position 50.
    "bradley_terry": q_bradley_terry,
    # Continuation batch 210: empirical-Bayes rate shrinkage —
    # appended past position 50.
    "eb_shrinkage": q_eb_shrinkage,
    # Continuation batch 211: site-section path rollup — appended
    # past position 50.
    "path_rollup": q_path_rollup,
    # Continuation batch 213: quantile normalization — appended
    # past position 50.
    "quantile_normalize": q_quantile_normalize,
    # Continuation batch 214: weighted Jaccard verify — appended
    # past position 50.
    "weighted_jaccard": q_weighted_jaccard,
    # Continuation batch 215: eigenvector centrality — appended
    # past position 50.
    "eigen_centrality": q_eigen_centrality,
    # Continuation batch 216: lexical tf-idf top-k — appended past
    # position 50.
    "lexical_topk": q_lexical_topk,
}

# Round-6 rotation (r05 verdict item 1): the driver snapshots
# ``list(QUERIES)[:50]`` each round, so the prefix is rotated onto 50
# keys that have NEVER had a driver-side CORRECTNESS row (r01-r05
# union covers 99 of 357 keys).  These 50 are the oldest continuation
# batches still unsnapshotted — the graph family (k-core, k-truss,
# walks, link prediction, centralities, communities), the mergeable
# sketches (HLL, count-min, Bloom) and the KG-analytics layer.  Every
# key keeps its callable and oracle SQL unchanged; only dict insertion
# order moves (order pinned by tests/test_registry_order.py, as in
# rounds 3-5).
_R06_SNAPSHOT = [
    "kcore_nodes", "ktruss_edges", "entity_walks", "link_pred",
    "pq_rerank", "ivfpq_codes", "textrank_tokens", "hll_shingles",
    "cm_tokens", "cm_token_est", "alias_edit_links", "bloom_bits",
    "bloom_decontam", "triple_snapshots", "bm25_entities",
    "entity_salience", "pred_lift", "doclen_hist", "kg_neg_samples",
    "pred_signatures", "pred_obj_linkage", "entity_assoc",
    "walk_centrality", "degree_dist", "rrf_fusion", "clustering_coeff",
    "pred_violations", "pred_drift", "ntriples_export",
    "pred_cardinality", "object_rules", "entity_jaccard",
    "hits_scores", "kg_asof", "interval_conflicts", "entity_types",
    "star_query", "attr_merge_clusters", "wl_labels", "schema_graph",
    "kg_churn", "hapax_objects", "trending_entities",
    "graph_distances", "jaccard_best_match", "warc_roundtrip",
    "pred_jaccard", "degree_assortativity", "community_stats",
    "pred_ifp",
]
QUERIES = {k: QUERIES[k] for k in
           _R06_SNAPSHOT + [k for k in QUERIES
                            if k not in set(_R06_SNAPSHOT)]}


def oracle_sql() -> dict[str, str]:
    return {k: ORACLE[k] for k in QUERIES if k in ORACLE}
