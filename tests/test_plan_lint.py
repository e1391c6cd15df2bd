"""Plan-hygiene lint over the ENTIRE driver-query registry: no query
may plan a CartesianProduct or BroadcastNestedLoopJoin except the
allowlisted bounded-dimension cases.  This is the regression net for
the class of bug fixed in round 3 (ivf_topk's probes⋈assigned planned
as a SortMergeJoin on an n_cells-ary key — at scale that funnels the
corpus onto n_cells reducers): any NEW non-equi/cartesian join in any
of the 110 queries turns the build red with the query named.

The allowlist is TIGHT (exact expected counts): removing a flagged
join must update this file too, so the list can never rot into "it's
probably fine".
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

#: (cartesian_count, bnlj_count) -> why it is correct at 100 TB
ALLOWED = {
    # corpus x 8-row broadcast codebook: every vector scores against
    # every centroid; BNLJ over a broadcast dimension IS the right
    # plan (an equi-join key does not exist for argmax scoring)
    "ivf_assign": (0, 1),
    "ivf_centroids": (0, 1),
    # assign (1 BNLJ) + probe scoring vs the same broadcast codebook
    "ivf_topk": (0, 2),
    # same class as ivf_assign: corpus x 8-row broadcast codebook
    # argmax scoring (top-2 window instead of top-1)
    "ivf_quality": (0, 1),
    # composed index build: coarse assign vs the 8-row broadcast seed
    # (1 BNLJ) + residual sub-vector scoring vs the broadcast PQ
    # sub-codebooks (1 BNLJ) — both are bounded broadcast dimensions,
    # identical in class to ivf_assign
    "ivfpq_codes": (0, 2),
    # bounded-query-set brute force (vec_id < 50): the labeled
    # correctness BASELINE for the ANN paths, not the scale path —
    # its docstring says exactly that
    "similarity_topk": (0, 1),
    # inherits similarity_topk's one BNLJ through its exact-ranking
    # input; the fusion itself is union + aggregate + window over
    # top-k-bounded tables
    "rrf_fusion": (0, 1),
    # same inputs and class as rrf_fusion (Borda scoring instead)
    "borda_fusion": (0, 1),
    # entity-centroid self-pairing: entities are a bounded dimension
    # (gazetteer-sized canonical set), not corpus-sized
    "entity_neighbors": (1, 0),
    # 1-row corpus-total aggregate joined as a lazy scalar (the
    # pagerank dangling-mass device, outside a checkpointed loop so
    # it stays visible in the plan): a BNLJ over a 1-row broadcast
    # side is exactly the right plan
    "trending_entities": (0, 1),
    # same class: the 1-row total-edge-count (two_m) scalar that
    # conductance's min(vol, 2m - vol) denominator needs
    "community_stats": (0, 1),
    # inherits community_stats's two_m scalar over the Jaccard graph
    "merge_cluster_stats": (0, 1),
    # three 1-row Rand-decomposition totals composed by crossJoin —
    # the whole output is ONE row, both BNLJ sides are 1-row frames
    "partition_agreement": (0, 2),
    # 1-row schema-vocabulary count joined as a lazy scalar (the
    # same class as trending_entities' corpus total)
    "kg_completeness": (0, 1),
    # 1-row corpus-total scalar (sum of the bounded host table)
    # crossJoined into the t-closeness arithmetic — same class as
    # trending_entities
    "l_diversity": (0, 1),
    # same class as community_stats: the 1-row total-edge-count (m)
    # scalar the 4·m·L_c − D_c² decomposition needs
    "modularity": (0, 1),
    # the 1-row Fellegi-Sunter weight frame attached lazily to the
    # candidate pairs (train-once/score-everywhere split)
    "fs_scores": (0, 1),
    # the 1-row exact-F2 audit aggregate crossJoined onto the 16-row
    # AMS estimator table
    "ams_f2": (0, 1),
    # theta set algebra: every joined frame is sketch-sized by
    # construction (<= top_n rows of thetas / top_n*k retained hash
    # rows / top_n(top_n-1)/2 pairs) — the a.grp < b.grp pairing and
    # the per-pair retained-entry attachments plan as broadcast NL
    # joins over those bounded frames, which is the right plan; the
    # corpus-sized value stream is reduced to k rows per group BEFORE
    # any of these joins
    "theta_host_sets": (0, 5),
    # Kleinberg grid: (event-type vocabulary x day spine) crossJoin —
    # both bounded dimensions — plus the 1-row grand-total scalar and
    # the per-type 5-row log-rate frame; the event stream itself is
    # only touched by hash aggregates
    "event_bursts": (0, 3),
    # the 1-row total-session scalar the support denominator needs
    # (trending_entities class)
    "session_trigrams": (0, 1),
    # same class: the 1-row total-session scalar behind the gapped
    # pattern support denominator
    "seq_patterns": (0, 1),
    # two 1-row aggregate frames (truth census x candidate census)
    # composed by crossJoin — partition_agreement class
    "sorted_neighborhood": (0, 1),
    # the 1-row corpus-total scalar the G2 expectations need
    # (trending_entities class)
    "host_terms": (0, 1),
    # the 1-row dim-key-count scalar crossJoined onto the 1-row
    # audit aggregate — both BNLJ sides are single rows (the
    # trending_entities lazy-scalar class); the fact table itself is
    # reduced by ONE hash aggregate before any join
    "bloom_semi_join": (0, 1),
    # the shared _day_grid (event-type vocabulary x day spine)
    # crossJoin — both bounded dimensions, the event_bursts class;
    # the event stream itself is reduced by ONE hash aggregate
    # before the grid attaches.  Counts differ only because Catalyst
    # re-plans the grid subtree per consumer (pettitt reads it once;
    # cusum twice — grid + its mu join; theil_sen three times —
    # both pair sides + the n_days aggregate)
    "pettitt_change": (0, 1),
    "cusum_drift": (0, 2),
    "theil_sen_trend": (0, 3),
    # two 1-row frames (confusion-matrix totals x expected-agreement
    # scalar) composed by crossJoin — the partition_agreement class
    "langid_kappa": (0, 1),
    # per strategy, the 1-row balance frame crossJoined with the
    # 1-row replication frame (x2 strategies) — same 1-row class
    "partition_replication": (0, 2),
    # PAVA minimax: interval pairing (j<=k) and interval-to-point
    # containment (j<=i<=k), BOTH sides the 10-row bucket table — a
    # fixed-resolution dimension, never data volume; the corpus is
    # reduced to those 10 rows by ONE hash aggregate upstream
    "isotonic_calibration": (2, 0),
    # the 1-row n_components scalar crossJoined onto the authority
    # table (trending_entities lazy-scalar class)
    "salsa_scores": (0, 1),
    # the shared _day_grid bounded (types x spine) crossJoin — the
    # event_bursts class, read once
    "fano_factor": (0, 1),
    # _day_grid read four times (both pair sides, tie groups, n_days)
    # — four copies of the same bounded (types x spine) crossJoin,
    # the theil_sen_trend class
    "mann_kendall": (0, 4),
    # the (splits x attribute-vocabulary) zero-fill grid crossJoin,
    # re-planned for both pair sides — bounded dims, event_bursts
    # class
    "split_balance": (0, 2),
    # same class: the (splits x length-domain) zero-fill grid
    # crossJoin re-planned for both ECDF pair sides
    "doclen_drift": (0, 2),
    # _day_grid bounded crossJoin, read once before the checkpoint
    # (the fano_factor class)
    "weekday_seasonality": (0, 1),
    # per audited column, the 1-row raw-bytes frame crossJoined with
    # the 1-row dictionary frame (x3 columns) — the 1-row scalar
    # class
    "encoding_advisor": (0, 3),
    # the 1-row pooled-sign scalar crossJoined onto the bounded
    # stratum table (plans as CartesianProduct of a 1-row side —
    # the partition_agreement class)
    "simpson_check": (1, 0),
    # per candidate FK pair, the 1-row distinct-count frame
    # crossJoined with the 1-row containment frame (x7 candidates)
    # — the encoding_advisor 1-row scalar class
    "inclusion_deps": (0, 7),
    # two chained 1-row lazy scalars (N/tie totals, then the H
    # frame whose subtree re-plans the first) — the
    # partition_agreement 1-row class
    "kruskal_wallis": (0, 3),
    # the 1-row window-midpoint scalar + the 1-row zero-differences
    # frame (midpoint subtree re-planned) — same 1-row class
    "wilcoxon_signed": (0, 3),
    # the 1-row (N, S) totals + the 1-row Brier/decomposition frame
    # whose subtree re-plans the totals — same 1-row class
    "brier_decomposition": (0, 3),
    # the 1-row grand-total scalar attached to the final per-type
    # output (the in-loop dangling-mass crossJoins sit behind
    # localCheckpoint, invisible by design) — trending_entities
    # class
    "markov_stationary": (0, 1),
    # the shared _day_grid bounded (types x spine) crossJoin,
    # re-planned for both lag-alignment sides — the doclen_drift /
    # split_balance two-sided grid class
    "lead_lag": (0, 2),
    # the 1-row MRR/Hits summary crossJoined onto the bounded
    # per-term table — the trending_entities 1-row scalar class
    "mrr_eval": (0, 1),
    # the 1-row transitivity scalar crossJoined onto the per-node
    # table — the trending_entities 1-row scalar class
    "clustering_coeffs": (0, 1),
    # the bounded (hosts x top-K vocabulary) zero-fill grid
    # crossJoin, re-planned for both profile pair sides — the
    # doclen_drift two-sided grid class
    "stylometric_delta": (0, 2),
    # _day_grid bounded crossJoin, read once (the fano_factor
    # class)
    "ols_trend": (0, 1),
    # the 1-row (prior mean, tau) frame crossJoined onto the
    # bounded host table — the trending_entities 1-row scalar class
    "eb_shrinkage": (0, 1),
    # the 1-row spectral-radius scalar crossJoined onto the final
    # node table (the in-loop renormalization crossJoins sit behind
    # localCheckpoint) — the markov_stationary class
    "eigen_centrality": (0, 1),
}


def _counts(plan: str) -> tuple[int, int]:
    return (plan.count("CartesianProduct"),
            plan.count("BroadcastNestedLoopJoin"))


def test_registry_plans_have_no_unsanctioned_cartesians(spark):
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    flagged = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        c = _counts(plan)
        if c != (0, 0):
            flagged[name] = c
    assert flagged == ALLOWED, (
        f"plan lint drift: flagged={flagged} allowed={ALLOWED} — a new "
        "cartesian/NL join appeared (fix the plan or justify it here)")


@pytest.mark.parametrize("name", ["ivf_topk", "mentions", "candidates",
                                  "triples_fused", "dup_clusters"])
def test_key_joins_are_hash_or_broadcast(spark, name):
    """The hot-path queries must plan their equi-joins as broadcast or
    shuffled-hash/sort-merge on HIGH-cardinality keys; specifically,
    ivf_topk's cell join must be the broadcast (regression for the
    round-3 fix)."""
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    plan = QUERIES[name](spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    if name == "ivf_topk":
        assert not any("SortMergeJoin" in ln and "cell" in ln
                       for ln in plan.splitlines()), plan
