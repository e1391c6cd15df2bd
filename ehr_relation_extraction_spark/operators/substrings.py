"""Exact substring-granular dedup (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL'22) — the round-3
roadmap stretch: the windowed passage dedup in functions/textstats is
window-granular (win=20, stride=10: duplicated spans shorter than a
window, or misaligned by < stride, escape).  Two exact tools close
that gap:

1. :func:`substring_dups` / :func:`cut_substring_dups` — the
   THRESHOLD-EXACT formulation.  A duplicated substring of >= L tokens
   exists iff some L-token window at SOME offset is duplicated, so
   running the existing window machinery at stride=1 with win=L finds
   exactly the positions covered by a >= L-token repeat: every
   duplicated span >= L is found at its exact boundaries, and nothing
   shorter than L fires.  (This is precisely what Lee et al.'s
   suffix-array pass computes for threshold L.)  The round-4
   overlap-merging island fix (gap >= win breaks) makes stride-1
   correct — islands of heavily-overlapping windows coalesce into one
   maximal span with no double-counted tokens.

   Scale shape: stride-1 windows are n_tokens hashes per doc, each
   over L tokens — O(n*L) map-side work with NO extra shuffle vs the
   strided version (the aggregate is still one hash-count).  For
   L=50 that constant beats a distributed suffix array's ~log(n)
   full-corpus sort rounds by a wide margin, which is why production
   pipelines (ExactSubstr's own Spark ports) ship this form.

2. :func:`suffix_ranks` — a distributed PREFIX-DOUBLING suffix
   ranking (Manber-Myers, the shuffle-bound formulation) over the
   generalized suffix set {doc[i:] for every doc, i}: the full
   suffix-array structure for any-length repeat mining, built from
   O(log maxlen) rounds of join + order-preserving re-rank.  No
   single-partition window, no driver-side sort: rank ids come from
   ``repartitionByRange + monotonically_increasing_id``, which is
   order-preserving across range partitions (partition ordinals are
   the id's high bits and range partition i holds keys < partition
   i+1's), so ranks are comparable without being dense.

Reference analogue: none (single-document service); this is the
training-data-pipeline side of the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import (cut_duplicated_spans, duplicated_spans,
                                   passage_dups)


def substring_dups(docs: DataFrame, min_len: int = 50) -> DataFrame:
    """Maximal duplicated token spans, EXACT at threshold ``min_len``:
    (doc_id, span_start, span_end, n_windows) where every [start, end)
    is a maximal region covered by >= min_len-token content that also
    occurs elsewhere in the corpus (or again in the same doc)."""
    return duplicated_spans(docs, win=min_len, stride=1)


def cut_substring_dups(docs: DataFrame, min_len: int = 50) -> DataFrame:
    """Lee-et-al cut at exact threshold granularity: every repeat of
    >= min_len tokens is removed from all but the globally-first
    (min doc_id) holder.  (doc_id, text_clean, n_cut_tokens)."""
    return cut_duplicated_spans(docs, win=min_len, stride=1)


def duplicated_windows_exact(docs: DataFrame,
                             min_len: int = 50) -> DataFrame:
    """The stride-1 window table itself (doc_id, win_start,
    passage_hash, n_docs_sharing) — every offset at which a
    >= min_len-token repeat starts."""
    return passage_dups(docs, win=min_len, stride=1)


# ---------------------------------------------------------------------------
# distributed suffix ranking (prefix doubling)
# ---------------------------------------------------------------------------


def _order_preserving_rank(df: DataFrame, cols: list[str],
                           out: str) -> DataFrame:
    """Assign an order-preserving (NOT dense) int64 rank to the
    distinct values of ``cols``: range-partition the distinct set by
    the sort key, sort within partitions, then take
    monotonically_increasing_id — ids compare like the key because the
    partition ordinal occupies the id's high bits and range partitions
    are globally ordered.  One shuffle of the distinct set; no
    single-partition window (the usual dense_rank scale killer)."""
    distinct = (df.select(*cols).dropDuplicates()
                .repartitionByRange(*cols)
                .sortWithinPartitions(*cols))
    return distinct.withColumn(out, F.monotonically_increasing_id())


def suffix_ranks(docs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Generalized-suffix-array ranks over the corpus: one row per
    (doc_id, tok_idx) suffix ``doc[tok_idx:]``, with an int64 ``rank``
    such that rank(a) < rank(b) iff suffix a sorts strictly before
    suffix b (end-of-doc sorts before any token, the standard sentinel
    rule) and rank(a) == rank(b) iff the suffixes are IDENTICAL token
    sequences — equal ranks across docs are exact whole-suffix
    repeats.

    Prefix doubling: after round k every rank reflects the first 2^k
    tokens; round k+1 re-ranks by the pair (rank[i], rank[i + 2^k])
    — the second component fetched with an equi-join on (doc_id,
    tok_idx + 2^k), missing (past doc end) ranked as -1 so shorter
    prefixes sort first.  Rounds stop when every pair is unchanged by
    the doubling (checksum fixpoint) or at ceil(log2 maxlen).

    Scale: each round is two shuffles (the pair self-join keyed on
    (doc_id, tok_idx) and the distinct-pair re-rank) over n_tokens
    rows; localCheckpoint per round cuts the iterative-join lineage
    exactly like connected_components does.
    """
    final, _ = _suffix_rank_rounds(docs, max_rounds)
    return final


def _suffix_rank_rounds(docs: DataFrame, max_rounds: int = 20):
    """Run prefix doubling; return (final_ranks, tables) where tables
    is [(plen, rank_df), ...] ascending — rank_df's classes equal iff
    the suffixes' first ``plen`` tokens (sentinel-aware) are equal.
    The per-round tables feed :func:`adjacent_lcp`'s binary lifting."""
    from ..operators.ner import tokenize_df

    pages = docs if "url" in docs.columns else docs.select(
        "doc_id", "text", F.lit("").alias("url"))
    toks = tokenize_df(pages).select("doc_id", "tok_idx", "token")
    # rank_0: order-preserving rank of the single token (vocab-sized
    # rank table; the join back is an equi-join on the token string)
    r0 = _order_preserving_rank(toks, ["token"], "rank")
    cur = (toks.join(r0, "token")
           .select("doc_id", "tok_idx", "rank")
           .localCheckpoint())
    tables = [(1, cur)]

    step = 1
    n_old = cur.select("rank").dropDuplicates().count()
    for _ in range(max_rounds):
        ahead = cur.select(F.col("doc_id"),
                           (F.col("tok_idx") - F.lit(step)).alias("tok_idx"),
                           F.col("rank").alias("rank2"))
        paired = (cur.join(ahead, ["doc_id", "tok_idx"], "left")
                  .withColumn("rank2",
                              F.coalesce("rank2", F.lit(-1).cast("long"))))
        rk = _order_preserving_rank(paired, ["rank", "rank2"], "new_rank")
        nxt = (paired.join(rk, ["rank", "rank2"])
               .select("doc_id", "tok_idx",
                       F.col("new_rank").alias("rank"))
               .localCheckpoint())
        # fixpoint: doubling changed nothing iff the number of distinct
        # ranks stopped growing (ranks only ever split, never merge);
        # the previous round's count carries forward — one count job
        # per round, not two
        n_new = nxt.select("rank").dropDuplicates().count()
        cur = nxt
        step *= 2
        tables.append((step, cur))
        if n_new == n_old:
            break
        n_old = n_new
    return cur.select("doc_id", "tok_idx", "rank"), tables


def adjacent_lcp(docs: DataFrame, max_rounds: int = 20) -> DataFrame:
    """LCP of every ADJACENT pair in generalized-suffix-array order —
    the structure Lee et al. mine for maximal repeats of ANY length
    (filter ``lcp >= L`` for threshold L; no re-run per threshold,
    unlike the windowed form).

    Output: (doc_a, idx_a, doc_b, idx_b, lcp), one row per adjacent
    pair under the total order (suffix content, doc_id, tok_idx) —
    equal-content ties ordered by (doc_id, tok_idx), so the pair set
    is deterministic.

    Two scale-safe constructions on top of :func:`suffix_ranks`:

    - ADJACENCY without a global window: range-partition by (rank,
      doc_id, tok_idx), pair consecutive rows with a PER-PARTITION
      lead() (Window.partitionBy(spark_partition_id()) — no
      single-partition exchange), then stitch the partition
      boundaries from the per-partition first/last rows — a
      #partitions-sized table, the same bounded-collect class as the
      graph seeds.
    - LCP by BINARY LIFTING over the saved doubling tables: greedily
      descend plen = 2^K..1; if both suffixes' classes at the current
      offsets match, the first plen tokens match — advance both
      offsets.  Distinct suffixes always have lcp < 2^K at the
      fixpoint table (same 2^K-class there would mean identical), so
      the greedy powers cover every possible value; identical-content
      pairs overshoot and are capped to the true remainder length.
      Each level is two equi-joins of the n-row pair table against a
      rank table — O(log maxlen) rounds, localCheckpoint each, the
      same shuffle discipline as the ranking itself.
    """
    from pyspark.sql import Window

    final, tables = _suffix_rank_rounds(docs, max_rounds)
    lens = (final.groupBy("doc_id")
            .agg((F.max("tok_idx") + 1).alias("doc_len")))

    key = ["rank", "doc_id", "tok_idx"]
    rows = (final.repartitionByRange(*key)
            .sortWithinPartitions(*key)
            .withColumn("pid", F.spark_partition_id())
            .localCheckpoint())
    w = Window.partitionBy("pid").orderBy(*key)
    nxt = [F.lead(c).over(w).alias(f"n_{c}") for c in key]
    inner = (rows.select(*key, "pid", *nxt)
             .where(F.col("n_rank").isNotNull()))
    # partition-boundary pairs: last row of pid i with first row of
    # the next NON-EMPTY pid — the firsts/lasts table has one row per
    # partition, so the single-partition lead window over it is a
    # bounded scalar op, not a data-sized exchange
    fl = (rows.groupBy("pid")
          .agg(F.min(F.struct(*key)).alias("first"),
               F.max(F.struct(*key)).alias("last")))
    wb = Window.orderBy("pid")
    bnd = (fl.select("pid", "last",
                     F.lead("first").over(wb).alias("nfirst"))
           .where(F.col("nfirst").isNotNull())
           .select(F.col("last.rank").alias("rank"),
                   F.col("last.doc_id").alias("doc_id"),
                   F.col("last.tok_idx").alias("tok_idx"),
                   F.col("nfirst.rank").alias("n_rank"),
                   F.col("nfirst.doc_id").alias("n_doc_id"),
                   F.col("nfirst.tok_idx").alias("n_tok_idx")))
    pairs = (inner.select(*key, "n_rank", "n_doc_id", "n_tok_idx")
             .unionByName(bnd)
             .select(F.col("doc_id").alias("doc_a"),
                     F.col("tok_idx").alias("idx_a"),
                     F.col("n_doc_id").alias("doc_b"),
                     F.col("n_tok_idx").alias("idx_b"))
             .withColumn("lcp", F.lit(0))
             .localCheckpoint())

    for plen, tab in sorted(tables, key=lambda t: -t[0]):
        ra = tab.select(F.col("doc_id").alias("doc_a"),
                        F.col("tok_idx").alias("ja"),
                        F.col("rank").alias("ra"))
        rb = tab.select(F.col("doc_id").alias("doc_b"),
                        F.col("tok_idx").alias("jb"),
                        F.col("rank").alias("rb"))
        j = (pairs.withColumn("ja", F.col("idx_a") + F.col("lcp"))
             .withColumn("jb", F.col("idx_b") + F.col("lcp"))
             .join(ra, ["doc_a", "ja"], "left")
             .join(rb, ["doc_b", "jb"], "left"))
        adv = (F.col("ra").isNotNull() & F.col("rb").isNotNull()
               & (F.col("ra") == F.col("rb")))
        pairs = (j.withColumn(
            "lcp", F.when(adv, F.col("lcp") + F.lit(plen))
            .otherwise(F.col("lcp")))
            .select("doc_a", "idx_a", "doc_b", "idx_b", "lcp")
            .localCheckpoint())

    # identical-content pairs overshoot; cap to the true remainders
    la = lens.select(F.col("doc_id").alias("doc_a"),
                     F.col("doc_len").alias("len_a"))
    lb = lens.select(F.col("doc_id").alias("doc_b"),
                     F.col("doc_len").alias("len_b"))
    return (pairs.join(la, "doc_a").join(lb, "doc_b")
            .select("doc_a", "idx_a", "doc_b", "idx_b",
                    F.least(F.col("lcp"),
                            F.col("len_a") - F.col("idx_a"),
                            F.col("len_b") - F.col("idx_b"))
                    .cast("int").alias("lcp")))


def maximal_repeats(docs: DataFrame, min_len: int = 50,
                    max_rounds: int = 20) -> DataFrame:
    """Suffix pairs whose common prefix is >= min_len tokens — the
    suffix-array route to the same repeats :func:`substring_dups`
    finds, but computed once for ALL thresholds (filter, don't
    re-run)."""
    return adjacent_lcp(docs, max_rounds).where(
        F.col("lcp") >= F.lit(min_len))
