"""Pin the QUERIES registry order.

The driver snapshots exactly ``list(QUERIES)[:50]`` in insertion
order, so ANY key insertion or reorder above position 50 silently
rotates queries out of the verified set.  This test turns the
"ORDER IS LOAD-BEARING" comment into an explicit, reviewed diff:
changing the registry requires changing this file too.
"""

from __future__ import annotations

from ehr_relation_extraction_spark.driver_queries import QUERIES, oracle_sql

# Round-6 rotation: the 50-key driver snapshot moves onto 50 keys
# that have never had a driver-side CORRECTNESS row (graph family,
# sketches, KG-analytics — r05 verdict item 1).  The previous (r05)
# order is kept below as _R05_PREFIX/_R05_TAIL and the new full order
# is derived from it: the rotated 50 lead, everything else keeps its
# relative order.
EXPECTED_PREFIX = [
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

# Round-5 rotation (historical): the 3 PQ queries (registered
# in-round) and the 4 round-5 staged queries lead; then the 42 keys
# that sat past round 4's 50-key snapshot (driver-green in r01-r03);
# then quality_model (value-oracle upgrade) closes the prefix.
_R05_PREFIX = [
    "pq_codebook", "pq_codes", "pq_search",
    "substring_spans", "cut_substrings", "maximal_repeats",
    "lpa_communities",
    "relations_fused", "wide_table", "distinct_subjects",
    "link_mentions", "canonical_components", "fuzzy_alias_candidates",
    "mentions_second_pass", "graph_nodes", "graph_edges",
    "eval_mentions", "eval_mentions_micro", "eval_relations_lenient",
    "eval_triples", "eval_triples_by_pred", "iob2_labels",
    "mentions_model", "mentions_perceptron", "host_stats",
    "candidates_labeled", "candidates_sampled", "eval_re_accuracy",
    "minhash_signatures", "lsh_bands", "near_duplicates", "simhash",
    "quality_features", "lang_id", "token_count_bpe", "fingerprint",
    "top_terms_tfidf", "similarity_topk", "ann_buckets", "srp_buckets",
    "ann_topk", "events_hourly", "retention_cohorts", "session_funnel",
    "triples_daily", "events_asof", "cooccurrence_pmi", "corpus_split",
    "decontaminate",
    "quality_model",
]

_R05_TAIL = [
    "triples_fused", "mentions", "extract_text",
    "duplicated_spans", "cut_spans", "url_redirects", "cc_update",
    "repetition_features", "corpus_export", "pack_sequences",
    "mixture_sample", "lm_quality", "source_stats", "media_features",
    "bigram_lm", "corpus_curation", "candidates_balanced",
    "eval_mentions_lenient", "eval_mentions_macro",
    "eval_mentions_by_doc", "sessionize", "pagerank", "graph_ppr",
    "graph_bfs", "graph_degrees", "related_topics", "component_sizes",
    "embedding_near_dups", "ivf_assign", "dup_clusters",
    "containment_dups", "ivf_centroids", "ivf_topk", "url_canonical",
    "boilerplate_strip", "kg_support", "entity_centroids",
    "passage_dups", "entity_neighbors", "triple_history",
    "simhash_near_dups", "graph_triangles", "entity_first_seen",
    "tokenize", "shards", "candidates", "relations", "triples",
    "dedup_exact",
    # Round-5 continuation: staged round-6 oracles registered at the
    # tail (appends past position 50 leave the driver snapshot prefix
    # bit-identical; each key was cross-engine green in
    # tests/test_round6_oracles.py before registration).
    "kcore_nodes", "ktruss_edges", "entity_walks", "link_pred",
    "pq_rerank", "ivfpq_codes", "textrank_tokens", "hll_shingles",
    "cm_tokens", "cm_token_est", "alias_edit_links",
    "bloom_bits", "bloom_decontam", "triple_snapshots",
    "bm25_entities", "entity_salience", "pred_lift",
    "doclen_hist", "kg_neg_samples", "pred_signatures",
    "pred_obj_linkage", "entity_assoc", "walk_centrality",
    "degree_dist", "rrf_fusion",
    # Continuation batch 2: KG-quality layer (schema enforcement,
    # temporal drift, RDF export, per-node clustering) — appended
    # past position 50, prefix untouched.
    "clustering_coeff", "pred_violations", "pred_drift",
    "ntriples_export",
    # Continuation batch 3: rule mining + schema cardinality +
    # attribute Jaccard + HITS — appended past position 50.
    "pred_cardinality", "object_rules", "entity_jaccard",
    "hits_scores",
    # Continuation batch 4: temporal-KG read paths (as-of, interval
    # conflicts), node typing, BGP coverage — appended past position
    # 50.
    "kg_asof", "interval_conflicts", "entity_types", "star_query",
    # Continuation batch 5: attribute-based entity merging + WL
    # structural roles — appended past position 50.
    "attr_merge_clusters", "wl_labels",
    # Continuation batch 6: typed schema summary, KG churn, hapax
    # noise — appended past position 50.
    "schema_graph", "kg_churn", "hapax_objects",
    # Continuation batch 7: trending entities, weighted shortest
    # paths, reciprocal best-match alignment — appended past
    # position 50.
    "trending_entities", "graph_distances", "jaccard_best_match",
    # Continuation batch 8: WARC/1.0 record source round trip —
    # appended past position 50.
    "warc_roundtrip",
    # Continuation batch 9: predicate subject-set Jaccard +
    # assortativity moments — appended past position 50.
    "pred_jaccard", "degree_assortativity",
    # Continuation batch 10: LPA community-quality report — appended
    # past position 50.
    "community_stats",
    # Continuation batch 11: inverse-functional keys + shingle
    # novelty — appended past position 50.
    "pred_ifp", "shingle_novelty",
    # Continuation batch 12: host correlation + recrawl scheduling —
    # appended past position 50.
    "host_entity_overlap", "url_recrawl_priority",
    # Continuation batch 13: merge-proposal quality + exact
    # percentiles — appended past position 50.
    "merge_cluster_stats", "doclen_percentiles",
    # Continuation batch 14: inverted-index postings — appended past
    # position 50.
    "postings_lists",
    # Continuation batch 15: clustering-agreement evaluation —
    # appended past position 50.
    "partition_agreement",
    # Continuation batch 17: truth finding (knowledge fusion) —
    # appended past position 50.
    "claim_beliefs", "source_trust",
    # Continuation batch 18: belief-argmax conflict resolution —
    # appended past position 50.
    "kg_resolved",
    # Continuation batch 19: source error rate — appended past
    # position 50.
    "host_error_rate",
    # Continuation batch 20: numeric-literal range induction —
    # appended past position 50.
    "literal_profiles",
    # Continuation batch 21: typed metapath wedges — appended past
    # position 50.
    "typed_wedges",
    # Continuation batch 22: KG-quality KPIs — appended past
    # position 50.
    "kg_completeness", "extraction_yield",
    # Continuation batch 23: SPARQL-algebra read paths — appended
    # past position 50.
    "chain_patterns", "optional_query", "negation_query",
    # Continuation batch 24: integer TransE scoring + filtered
    # link-prediction ranks — appended past position 50.
    "transe_scores", "transe_ranks",
    # Continuation batch 25: exact integer modularity — appended past
    # position 50.
    "modularity",
    # Continuation batch 26: meta-blocking entity resolution —
    # appended past position 50.
    "token_blocks", "meta_block_edges",
    # Continuation batch 27: exact 2-D Pareto skyline — appended past
    # position 50.
    "entity_skyline",
    # Continuation batch 28: deterministic weighted bottom-k sampling
    # — appended past position 50.
    "weighted_sample",
    # Continuation batch 29: approximate functional dependencies —
    # appended past position 50.
    "pred_fds",
    # Continuation batch 30: per-fact SCD2 run/gap/uptime profile —
    # appended past position 50.
    "fact_runs",
    # Continuation batch 31: directed precedence graph -> SCC ->
    # web-bowtie decomposition — appended past position 50.
    "precedence_edges", "scc_components", "bowtie_structure",
    # Continuation batch 32: greedy max-coverage corpus selection —
    # appended past position 50.
    "greedy_coverage",
    # Continuation batch 33: exact set-similarity join by prefix
    # filtering — appended past position 50.
    "prefix_filter_pairs",
    # Continuation batch 34: Luby maximal independent set — appended
    # past position 50.
    "mis_nodes",
    # Continuation batch 35: RDFS domain/range type inference —
    # appended past position 50.
    "type_inference",
    # Continuation batch 36: sorted-neighborhood blocking — appended
    # past position 50.
    "sn_pairs",
    # Continuation batch 37: truncated integer Katz centrality —
    # appended past position 50.
    "katz_scores",
    # Continuation batch 38: bipartite butterfly counts — appended
    # past position 50.
    "butterflies",
    # Continuation batch 39: B-cubed clustering evaluation — appended
    # past position 50.
    "bcubed",
    # Continuation batch 40: co-citation + bibliographic coupling —
    # appended past position 50.
    "cocitation",
    # Continuation batch 41: Boruvka minimum spanning forest —
    # appended past position 50.
    "msf_edges",
    # Continuation batch 42: HyperBall neighborhood function —
    # appended past position 50.
    "hyperball",
    # Continuation batch 43: neighborhood-function distribution —
    # appended past position 50.
    "nf_distribution",
    # Continuation batch 44: fixed-round integer SimRank — appended
    # past position 50.
    "simrank",
    # Continuation batch 45: blocking-quality metrics (PC/RR) —
    # appended past position 50.
    "blocking_metrics",
    # Continuation batch 46: edge triangle support / local bridges —
    # appended past position 50.
    "local_bridges",
    # Continuation batch 47: 3-node graphlet orbit counts — appended
    # past position 50.
    "orbit_counts",
    # Continuation batch 48: bounded property-path reachability —
    # appended past position 50.
    "rpq_reach",
    # Continuation batch 49: rolling per-day HLL distinct estimates —
    # appended past position 50.
    "rolling_entity_hll",
    # Continuation batch 50: categorical type-mixing matrix —
    # appended past position 50.
    "type_mixing",
    # Continuation batch 51: deterministic independent-cascade
    # spread — appended past position 50.
    "ic_spread",
    # Continuation batch 52: boolean-retrieval read path — appended
    # past position 50.
    "boolean_search",
    # Continuation batch 53: mention-concentration Gini — appended
    # past position 50.
    "mention_gini",
    # Continuation batch 55: k-core decomposition by H-index
    # iteration — appended past position 50.
    "core_numbers",
    # Continuation batch 56: landmark closeness/harmonic centrality —
    # appended past position 50.
    "landmark_centrality",
    # Continuation batch 57: Fellegi-Sunter probabilistic record
    # linkage — appended past position 50.
    "fs_weights",
    "fs_scores",
    # Continuation batch 58: AMS tug-of-war F2 sketch — appended past
    # position 50.
    "ams_f2",
    # Continuation batch 59: KMV bottom-k theta distinct sketch —
    # appended past position 50.
    "kmv_entities",
    # Continuation batch 60: theta-sketch set operations between host
    # entity sets — appended past position 50.
    "theta_host_sets",
    # Continuation batch 61: rendezvous-hash resharding plan —
    # appended past position 50.
    "shard_rebalance",
    # Continuation batch 63: Kleinberg burst detection — appended past
    # position 50.
    "event_bursts",
    # Continuation batch 64: Allen interval-algebra profile — appended
    # past position 50.
    "allen_relations",
    # Continuation batch 65: V-optimal histogram DP — appended past
    # position 50.
    "vopt_histogram",
    # Continuation batch 66: consecutive session trigram patterns —
    # appended past position 50.
    "session_trigrams",
    # Continuation batch 68: weighted-interval-scheduling timeline
    # repair — appended past position 50.
    "timeline_repair",
    # Continuation batch 69: Dunning-LLR distinctive shingles per
    # source — appended past position 50.
    "host_terms",
    # Continuation batch 70: NDCG@10 retrieval evaluation of the BM25
    # ranking — appended past position 50.
    "retrieval_ndcg",
    # Continuation batch 71: term-proximity minimal co-occurrence
    # window — appended past position 50.
    "term_proximity",
    # Continuation batch 72: query-biased snippet extraction —
    # appended past position 50.
    "snippet_windows",
    # Continuation batch 73: entity-card fact ranking — appended past
    # position 50.
    "entity_cards",
    # Continuation batch 74: Jones-Plassmann greedy graph coloring —
    # appended past position 50.
    "graph_coloring",
    # Continuation batch 75: LSH candidate-quality evaluation —
    # appended past position 50.
    "lsh_eval",
    # Continuation batch 77: Hamilton crawl-budget apportionment —
    # appended past position 50.
    "crawl_budget",
    # Continuation batch 78: type-ahead completion index — appended
    # past position 50.
    "completions",
    # Continuation batch 79: critical-path layering of the SCC
    # condensation — appended past position 50.
    "dag_layers",
    # Continuation batch 80: locally-dominant-edge weighted matching —
    # appended past position 50.
    "dominant_matching",
    # Continuation batch 81: multi-probe SRP ANN — appended past
    # position 50.
    "srp_multiprobe",
    # Continuation batch 82: content-syndication provenance graph —
    # appended past position 50.
    "syndication_edges",
    # Continuation batch 83: dedup-threshold tuning curve — appended
    # past position 50.
    "dup_rate_curve",
    # Continuation batch 84: per-(page, entity) evidence snippets —
    # appended past position 50.
    "evidence_snippets",
    # Continuation batch 85: DistMult scoring + ranker agreement —
    # appended past position 50.
    "distmult_scores",
    "scorer_agreement",
    # Continuation batch 86: single-linkage clusters via MSF cut —
    # appended past position 50.
    "single_linkage",
    # Continuation batch 87: join-skew hot-key profile — appended
    # past position 50.
    "join_skew",
    # Continuation batch 88: one-pass GROUPING-SETS fact rollup —
    # appended past position 50.
    "fact_rollup",
    # Continuation batch 89: Bloomjoin semi-join reduction audit —
    # appended past position 50.
    "bloom_semi_join",
    # Continuation batch 90: densest subgraph by greedy peeling —
    # appended past position 50.
    "densest_subgraph",
    # Continuation batch 91: Z-order vs linear layout pruning audit —
    # appended past position 50.
    "layout_pruning",
    # Continuation batch 92: 3-D Pareto-frontier skyline —
    # appended past position 50.
    "skyline_3d",
    # Continuation batch 93: a-priori frequent itemsets — appended
    # past position 50.
    "apriori_itemsets",
    # Continuation batch 94: LM-quality reliability calibration —
    # appended past position 50.
    "quality_calibration",
    # Continuation batch 95: robust median/MAD host outliers —
    # appended past position 50.
    "host_outliers",
    # Continuation batch 96: gate-fairness chi-square per source —
    # appended past position 50.
    "source_gate_chi2",
    # Continuation batch 97: hub-removal robustness probe — appended
    # past position 50.
    "hub_robustness",
    # Continuation batch 98: PII scrubbing pass — appended past
    # position 50.
    "pii_scrub",
    # Continuation batch 99: CUSUM drift alarms — appended past
    # position 50.
    "cusum_drift",
    # Continuation batch 100: Heaps vocabulary growth — appended
    # past position 50.
    "vocab_growth",
    # Continuation batch 102: Theil-Sen robust trend — appended past
    # position 50 (batch 101 is the streaming CUSUM twin).
    "theil_sen_trend",
    # Continuation batch 103: Benford first-digit forensics —
    # appended past position 50.
    "benford_digits",
    # Continuation batch 104: MMR diversified reranking — appended
    # past position 50.
    "mmr_rerank",
    # Continuation batch 105: BPE merge training — appended past
    # position 50.
    "bpe_merges",
    # Continuation batch 106: BPE compression curve — appended past
    # position 50.
    "bpe_compression",
    # Continuation batch 107: Pettitt change-point test — appended
    # past position 50.
    "pettitt_change",
    # Continuation batch 108: RAKE keyword extraction — appended past
    # position 50.
    "rake_keywords",
    # Continuation batch 109: exact ROC AUC — appended past
    # position 50.
    "quality_auc",
    # Continuation batch 110: Cohen's kappa — appended past
    # position 50.
    "langid_kappa",
    # Continuation batch 111: partitioning audit — appended past
    # position 50.
    "partition_replication",
    # Continuation batch 112: isotonic calibration — appended past
    # position 50.
    "isotonic_calibration",
    # Continuation batch 113: Kendall ranker concordance — appended
    # past position 50.
    "ranker_tau",
    # Continuation batch 114: Good-Turing smoothing table — appended
    # past position 50.
    "good_turing",
    # Continuation batch 115: Zipf rank-doubling curve — appended
    # past position 50.
    "zipf_doubling",
    # Continuation batch 116: inter-arrival gap statistics —
    # appended past position 50.
    "interarrival_stats",
    # Continuation batch 117: host Pareto coverage curve — appended
    # past position 50.
    "host_pareto",
    # Continuation batch 118: SALSA closed-form authorities —
    # appended past position 50.
    "salsa_scores",
    # Continuation batch 119: Fano dispersion factor — appended past
    # position 50.
    "fano_factor",
    # Continuation batch 120: next-event transition Gini — appended
    # past position 50.
    "transition_gini",
    # Continuation batch 121: Mann-Kendall trend test — appended past
    # position 50.
    "mann_kendall",
    # Continuation batch 122: bipartiteness / odd-cycle census —
    # appended past position 50.
    "bipartite_check",
    # Continuation batch 123: k-anonymity audit — appended past
    # position 50.
    "k_anonymity",
    # Continuation batch 124: per-pred reciprocity — appended past
    # position 50.
    "pred_reciprocity",
    # Continuation batch 125: tokenizer fertility per language —
    # appended past position 50.
    "token_fertility",
    # Continuation batch 126: daily-count autocorrelation — appended
    # past position 50.
    "autocorrelation",
    # Continuation batch 127: signed count-sketch audit — appended
    # past position 50.
    "count_sketch",
    # Continuation batch 128: split-balance TVD audit — appended past
    # position 50.
    "split_balance",
    # Continuation batch 129: cumulative gains / lift curve —
    # appended past position 50.
    "gains_curve",
    # Continuation batch 130: exact eccentricity/diameter audit —
    # appended past position 50.
    "graph_eccentricity",
    # Continuation batch 131: KS + W1 doc-length drift — appended
    # past position 50.
    "doclen_drift",
    # Continuation batch 132: weekday seasonality strength — appended
    # past position 50.
    "weekday_seasonality",
    # Continuation batch 133: predicate transitivity — appended past
    # position 50.
    "pred_transitivity",
    # Continuation batch 134: dictionary-encoding advisor — appended
    # past position 50.
    "encoding_advisor",
    # Continuation batch 135: Simpson's-paradox audit — appended past
    # position 50.
    "simpson_check",
    # Continuation batch 137: hash-uniformity audit — appended past
    # position 50.
    "hash_uniformity",
    # Continuation batch 138: inclusion-dependency discovery —
    # appended past position 50.
    "inclusion_deps",
    # Continuation batch 139: float-free Q1 pricing summary —
    # appended past position 50.
    "q1_pricing",
    # Continuation batch 140: embedding health profile — appended
    # past position 50.
    "embedding_profile",
    # Continuation batch 141: embedding label separability —
    # appended past position 50.
    "label_separation",
    # Continuation batch 142: NER type-confusion matrix — appended
    # past position 50.
    "ner_confusion",
    # Continuation batch 143: casing/digit profile — appended past
    # position 50.
    "casing_profile",
    # Continuation batch 144: rich-club coefficient — appended past
    # position 50.
    "rich_club",
    # Continuation batch 145: cross-type co-burst covariance —
    # appended past position 50.
    "type_covariance",
    # Continuation batch 146: watermark lateness audit — appended
    # past position 50.
    "lateness_audit",
    # Continuation batch 147
    "zorder_locality",
    # Continuation batch 148
    "zonemap_pruning",
    # Continuation batch 149
    "peak_prominence",
    # Continuation batch 150
    "runs_test",
    # Continuation batch 151
    "mcnemar_gates",
    # Continuation batch 152
    "mcc_scores",
    # Continuation batch 153
    "l_diversity",
    # Continuation batch 154
    "harmonic_centrality",
    # Continuation batch 155
    "ewma_forecast",
    # Continuation batch 156
    "lis_trend",
    # Continuation batch 157
    "dag_path_counts",
    # Continuation batch 158
    "eulerian_census",
    # Continuation batch 159
    "pr_curve",
    # Continuation batch 160
    "sq8_audit",
    # Continuation batch 161
    "politeness_audit",
    # Continuation batch 162
    "jain_fairness",
    # Continuation batch 163
    "spearman_check",
    # Continuation batch 164
    "series_motifs",
    # Continuation batch 165
    "readability_profile",
    # Continuation batch 166
    "bitmap_runs",
    # Continuation batch 167
    "sweep_concurrency",
    # Continuation batch 168
    "hash_collisions",
    # Continuation batch 169
    "lang_vocab_overlap",
    # Continuation batch 170
    "pagerank_delta",
    # Continuation batch 171
    "ivf_quality",
    # Continuation batch 172
    "pareto_knee",
    # Continuation batch 173
    "oov_rate",
    # Continuation batch 176
    "borda_fusion",
    "mann_whitney",
    # Continuation batch 178
    "cdc_chunks",
    # Continuation batch 179
    "neyman_allocation",
    # Continuation batch 180
    "seq_patterns",
    # Continuation batch 181
    "complex_scores",
    # Continuation batch 182
    "stress_centrality",
    # Continuation batch 183
    "robust_location",
    # Continuation batch 184
    "sorted_neighborhood",
    # Continuation batch 185
    "hash_ring",
    # Continuation batch 186
    "ta_depth_audit",
    # Continuation batch 187
    "record_census",
    # Continuation batch 188
    "kruskal_wallis",
    # Continuation batch 189
    "wilcoxon_signed",
    # Continuation batch 190
    "brier_decomposition",
    # Continuation batch 191
    "markov_stationary",
    # Continuation batch 192
    "resource_allocation",
    # Continuation batch 193
    "chao1_richness",
    # Continuation batch 194
    "lead_lag",
    # Continuation batch 195
    "embedding_pca",
    # Continuation batch 196
    "mrr_eval",
    # Continuation batch 197
    "clustering_coeffs",
    # Continuation batch 198
    "cochran_q",
    # Continuation batch 199
    "kendall_w",
    # Continuation batch 200
    "soundex_blocks",
    # Continuation batch 201
    "stylometric_delta",
    # Continuation batch 202
    "winnow_dups",
    # Continuation batch 203
    "anova_f",
    # Continuation batch 204
    "levene_test",
    # Continuation batch 205
    "ols_trend",
    # Continuation batch 206
    "fleiss_kappa",
    # Continuation batch 207
    "capture_recapture",
    # Continuation batch 208
    "stump_split",
    # Continuation batch 209
    "bradley_terry",
    # Continuation batch 210
    "eb_shrinkage",
    # Continuation batch 211
    "path_rollup",
    # Continuation batch 213
    "quantile_normalize",
    # Continuation batch 214
    "weighted_jaccard",
    # Continuation batch 215
    "eigen_centrality",
    # Continuation batch 216
    "lexical_topk",
]


# Full r06 order: the rotated 50 first, then every other key in its
# r05 relative order.
EXPECTED_TAIL = [k for k in _R05_PREFIX + _R05_TAIL
                 if k not in set(EXPECTED_PREFIX)]


def test_snapshot_prefix_pinned():
    assert len(EXPECTED_PREFIX) == 50
    assert list(QUERIES)[:50] == EXPECTED_PREFIX


def test_rotated_keys_never_driver_checked():
    """The r06 snapshot prefix consists entirely of keys absent from
    every prior round's CORRECTNESS file (the rotation's purpose)."""
    import json
    import os

    seen: set[str] = set()
    for r in range(1, 6):
        p = os.path.join(os.path.dirname(__file__), "..",
                         f"CORRECTNESS_r0{r}.json")
        with open(p) as f:
            seen |= set(json.load(f))
    overlap = [k for k in EXPECTED_PREFIX if k in seen]
    assert overlap == [], overlap


def test_full_registry_order_pinned():
    assert list(QUERIES) == EXPECTED_PREFIX + EXPECTED_TAIL


def test_prefix_oracle_coverage():
    """Every registry key has a value-exact oracle — round 5 closed
    the last two rows-only keys (quality_model unrolled-GD oracle,
    mentions_perceptron batch-perceptron oracle)."""
    oracles = set(oracle_sql())
    missing = [k for k in EXPECTED_PREFIX + EXPECTED_TAIL
               if k not in oracles]
    assert missing == [], f"registry keys without oracle SQL: {missing}"
