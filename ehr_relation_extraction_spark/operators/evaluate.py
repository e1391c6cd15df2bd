"""Evaluation operators (reference E1-E6, Track2-evaluate-ver4.py).

- strict span match: exact (start, end) + type (``span_matches`` /
  ``equals``, Track2-evaluate-ver4.py:52-67)
- lenient: any overlap + type
- multi-match pare-down: when several system spans match one gold span
  keep the first (Track2-evaluate-ver4.py:281-294) — implemented as a
  two-sided rank-1 filter so each gold and each system span is counted
  at most once
- TP/FP/FN counting (:296-299) and micro P/R/F1 (:457-463) with
  zero-division guards (:201-257)

Float note: P/R/F1 are also emitted as ``*_micro6`` integers
(floor(x * 1e6)) so cross-engine value hashing never trips on float
formatting; both engines compute the same IEEE double first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def match_spans(gold: DataFrame, pred: DataFrame, strict: bool = True) -> DataFrame:
    """Matched (gold, pred) span pairs on (url, ent_type)."""
    g = gold.select("url", "ent_type",
                    F.col("start").alias("g_start"),
                    F.col("end").alias("g_end"))
    p = pred.select("url", "ent_type",
                    F.col("start").alias("p_start"),
                    F.col("end").alias("p_end"))
    if strict:
        cond = (F.col("g_start") == F.col("p_start")) & (F.col("g_end") == F.col("p_end"))
    else:
        cond = (F.col("g_start") < F.col("p_end")) & (F.col("p_start") < F.col("g_end"))
    return g.join(p, ["url", "ent_type"]).where(cond)


def pare_down(matches: DataFrame) -> DataFrame:
    """E3: rank-1 per gold span, then rank-1 per system span."""
    by_gold = Window.partitionBy("url", "ent_type", "g_start", "g_end") \
                    .orderBy("p_start", "p_end")
    m = matches.withColumn("_rg", F.row_number().over(by_gold)) \
               .where(F.col("_rg") == 1).drop("_rg")
    by_pred = Window.partitionBy("url", "ent_type", "p_start", "p_end") \
                    .orderBy("g_start", "g_end")
    return m.withColumn("_rp", F.row_number().over(by_pred)) \
            .where(F.col("_rp") == 1).drop("_rp")


def prf_by_type(gold: DataFrame, pred: DataFrame,
                strict: bool = True) -> DataFrame:
    """Per-type strict/lenient TP/FP/FN + micro P/R/F1 (scaled ints)."""
    tp = (pare_down(match_spans(gold, pred, strict))
          .groupBy("ent_type").agg(F.count(F.lit(1)).cast("long").alias("tp")))
    n_gold = gold.groupBy("ent_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gold"))
    n_pred = pred.groupBy("ent_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pred"))
    out = (n_gold.join(n_pred, "ent_type", "full")
           .join(tp, "ent_type", "left")
           .fillna(0, ["tp", "n_gold", "n_pred"]))
    return _with_prf(out)


def _with_prf(counts: DataFrame) -> DataFrame:
    """E5 score block (Measures, Track2-evaluate-ver4.py:201-257):
    P/R/F1 plus specificity = tn/(fp+tn) and auc = (recall+spec)/2.
    The reference hard-codes tn = 0 for tags and relations
    (Track2-evaluate-ver4.py:299,338), so specificity degenerates to 0
    and auc to recall/2 — replicated faithfully here; a caller with a
    real tn column (the binary RE track, :375-394) gets the full
    formulas."""
    if "tn" not in counts.columns:
        counts = counts.withColumn("tn", F.lit(0).cast("long"))
    fp = F.col("n_pred") - F.col("tp")
    fn = F.col("n_gold") - F.col("tp")
    p = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(F.lit(0.0))
    r = F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")).otherwise(F.lit(0.0))
    f1 = F.when((p + r) > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    spec = F.when((fp + F.col("tn")) > 0,
                  F.col("tn") / (fp + F.col("tn"))).otherwise(F.lit(0.0))
    auc = (r + spec) / 2
    return (counts
            .withColumn("fp", fp.cast("long"))
            .withColumn("fn", fn.cast("long"))
            .withColumn("p_micro6", F.floor(p * 1000000).cast("long"))
            .withColumn("r_micro6", F.floor(r * 1000000).cast("long"))
            .withColumn("f1_micro6", F.floor(f1 * 1000000).cast("long"))
            .withColumn("specificity_micro6",
                        F.floor(spec * 1000000).cast("long"))
            .withColumn("auc_micro6", F.floor(auc * 1000000).cast("long")))


def micro_totals(per_type: DataFrame) -> DataFrame:
    """E6 micro roll-up: summed counts -> one row."""
    aggs = [F.sum("tp").cast("long").alias("tp"),
            F.sum("n_gold").cast("long").alias("n_gold"),
            F.sum("n_pred").cast("long").alias("n_pred")]
    if "tn" in per_type.columns:
        aggs.append(F.sum("tn").cast("long").alias("tn"))
    return _with_prf(per_type.agg(*aggs))


def prf_by_doc(gold: DataFrame, pred: DataFrame,
               strict: bool = True) -> DataFrame:
    """Per-document score table (the reference's SingleEvaluator runs
    per doc before the corpus roll-up, Track2-evaluate-ver4.py:261-344):
    one row per url with TP/FP/FN + P/R/F1."""
    tp = (pare_down(match_spans(gold, pred, strict))
          .groupBy("url").agg(F.count(F.lit(1)).cast("long").alias("tp")))
    n_gold = gold.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_gold"))
    n_pred = pred.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_pred"))
    counts = (n_gold.join(n_pred, "url", "full").join(tp, "url", "left")
              .fillna(0, ["tp", "n_gold", "n_pred"]))
    return _with_prf(counts)


def macro_by_doc(gold: DataFrame, pred: DataFrame,
                 strict: bool = True) -> DataFrame:
    """E6 macro roll-up: per-doc F1 averaged over gold docs
    (Track2-evaluate-ver4.py:453-455 divides by the corpus doc count).
    Output: one row (n_docs, macro_f1_micro6)."""
    tp = (pare_down(match_spans(gold, pred, strict))
          .groupBy("url").agg(F.count(F.lit(1)).cast("long").alias("tp")))
    n_gold = gold.groupBy("url").agg(F.count(F.lit(1)).cast("long").alias("n_gold"))
    n_pred = pred.groupBy("url").agg(F.count(F.lit(1)).cast("long").alias("n_pred"))
    per_doc = (n_gold.join(n_pred, "url", "full").join(tp, "url", "left")
               .fillna(0, ["tp", "n_gold", "n_pred"]))
    p = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(F.lit(0.0))
    r = F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")).otherwise(F.lit(0.0))
    f1 = F.when((p + r) > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return (per_doc.withColumn("f1", f1)
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.floor(F.avg("f1") * 1000000).cast("long").alias("macro_f1_micro6")))


def prf_relations(gold_rel: DataFrame, pred_rel: DataFrame,
                  strict: bool = False) -> DataFrame:
    """E2 relation match on the ARG SPANS (Relation.equals,
    Track2-evaluate-ver4.py:86-93): both args match — strict: exact
    (start, end); lenient: any overlap — plus same rel_type, with the
    E3 two-sided pare-down (:322-333) so each gold and each system
    relation is counted at most once.  Per-rel_type counts + P/R/F1.

    DOCUMENTED DEVIATION (pare-down tie-break): the reference keeps
    the FIRST matching system relation in its dict-iteration order
    (insertion order of the .ann file) and discards later ones that
    match an already-matched gold; this implementation ranks by
    (span-start, span-end) per gold, then dedups per system relation.
    Both count each gold/system relation at most once, but in
    multi-overlap LENIENT cases the chosen pairing — and so the TP
    count — can differ from reference-published scores by the
    tie-break.  Span order is kept deliberately: it is deterministic
    under any row order (a distributed engine has no file order),
    whereas insertion order is an artifact of the reference's
    single-file parse.  Spark and the DuckDB oracle implement the
    same rule and agree exactly.

    This is the span-level complement of ``prf_triples`` (which matches
    on the emitted triple text identity): a system relation whose arg
    spans drift but overlap still scores under lenient."""
    cols = ["url", "rel_type", "hub_start", "hub_end",
            "attr_start", "attr_end"]
    g = gold_rel.select(*cols).dropDuplicates().select(
        "url", "rel_type",
        F.col("hub_start").alias("g_hs"), F.col("hub_end").alias("g_he"),
        F.col("attr_start").alias("g_as"), F.col("attr_end").alias("g_ae"))
    p = pred_rel.select(*cols).dropDuplicates().select(
        "url", "rel_type",
        F.col("hub_start").alias("p_hs"), F.col("hub_end").alias("p_he"),
        F.col("attr_start").alias("p_as"), F.col("attr_end").alias("p_ae"))
    if strict:
        cond = ((F.col("g_hs") == F.col("p_hs")) & (F.col("g_he") == F.col("p_he"))
                & (F.col("g_as") == F.col("p_as")) & (F.col("g_ae") == F.col("p_ae")))
    else:
        cond = ((F.col("g_hs") < F.col("p_he")) & (F.col("p_hs") < F.col("g_he"))
                & (F.col("g_as") < F.col("p_ae")) & (F.col("p_as") < F.col("g_ae")))
    m = g.join(p, ["url", "rel_type"]).where(cond)
    by_gold = Window.partitionBy("url", "rel_type", "g_hs", "g_he",
                                 "g_as", "g_ae") \
                    .orderBy("p_hs", "p_he", "p_as", "p_ae")
    by_pred = Window.partitionBy("url", "rel_type", "p_hs", "p_he",
                                 "p_as", "p_ae") \
                    .orderBy("g_hs", "g_he", "g_as", "g_ae")
    pared = (m.withColumn("_rg", F.row_number().over(by_gold))
             .where(F.col("_rg") == 1)
             .withColumn("_rp", F.row_number().over(by_pred))
             .where(F.col("_rp") == 1))
    tp = pared.groupBy("rel_type").agg(
        F.count(F.lit(1)).cast("long").alias("tp"))
    ng = g.groupBy("rel_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gold"))
    np_ = p.groupBy("rel_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pred"))
    counts = (ng.join(np_, "rel_type", "full")
              .join(tp, "rel_type", "left")
              .fillna(0, ["tp", "n_gold", "n_pred"]))
    return _with_prf(counts)


def prf_triples_by_pred(gold_triples: DataFrame,
                        pred_triples: DataFrame) -> DataFrame:
    """Per-relation-type triple P/R/F1 (the reference's per-relation
    table, Track2-evaluate-ver4.py:466-589 / biobert_re/README.md:44-51)
    — one row per pred with the same counts algebra as the micro
    roll-up.  Distributed: two distinct + one semi-join + grouped
    counts, all keyed on pred."""
    key = ["url", "subj", "pred", "obj"]
    g = gold_triples.select(*key).dropDuplicates()
    p = pred_triples.select(*key).dropDuplicates()
    tp = (g.join(p, key, "left_semi").groupBy("pred")
          .agg(F.count(F.lit(1)).cast("long").alias("tp")))
    ng = g.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_gold"))
    np_ = p.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_pred"))
    counts = (ng.join(np_, "pred", "full")
              .join(tp, "pred", "left")
              .fillna(0, ["tp", "n_gold", "n_pred"]))
    return _with_prf(counts)


def re_classification_metrics(labeled: DataFrame,
                              pred: "F.Column | None" = None) -> DataFrame:
    """E8 (biobert_re/metrics.py:14-29 acc_and_f1): binary
    sequence-classification metrics over labeled candidate pairs —
    simple_accuracy, binary F1 on the positive class, and
    acc_and_f1 = (acc + f1) / 2.  Unlike the span evals, tn here is
    REAL (pairs both sides call negative), so the E5 specificity and
    AUC formulas (Track2-evaluate-ver4.py:244-257) are non-degenerate.

    ``labeled`` needs a gold ``label`` column (0/1); ``pred`` defaults
    to the rule classifier's decision (gap <= MAX_PAIR_GAP_CHARS,
    operators/relations.classify_rule)."""
    from ..config import MAX_PAIR_GAP_CHARS

    if pred is None:
        pred = (F.col("gap") <= MAX_PAIR_GAP_CHARS).cast("int")
    y, yh = F.col("label"), pred
    counts = labeled.agg(
        F.sum(((y == 1) & (yh == 1)).cast("long")).cast("long").alias("tp"),
        F.sum(((y == 0) & (yh == 0)).cast("long")).cast("long").alias("tn"),
        F.sum(((y == 0) & (yh == 1)).cast("long")).cast("long").alias("_fp"),
        F.sum(((y == 1) & (yh == 0)).cast("long")).cast("long").alias("_fn"),
        F.count(F.lit(1)).cast("long").alias("n"))
    counts = counts.select(
        "n", "tp", "tn",
        (F.col("tp") + F.col("_fp")).cast("long").alias("n_pred"),
        (F.col("tp") + F.col("_fn")).cast("long").alias("n_gold"))
    out = _with_prf(counts)
    acc = (F.col("tp") + F.col("tn")) / F.col("n")
    # f1 recomputed as a double (f1_micro6 is already floored)
    p = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(F.lit(0.0))
    r = F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")).otherwise(F.lit(0.0))
    f1 = F.when((p + r) > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return (out
            .withColumn("acc_micro6", F.floor(acc * 1000000).cast("long"))
            .withColumn("acc_and_f1_micro6",
                        F.floor((acc + f1) / 2 * 1000000).cast("long")))


def prf_triples(gold_triples: DataFrame, pred_triples: DataFrame) -> DataFrame:
    """Relation/triple-level eval on distinct (url, subj, pred, obj)
    sets (reference E2 relation match reduced to the triple identity
    the long table emits).

    r06: one full-outer join + a single aggregate — the previous
    version ran THREE driver-side ``.count()`` actions (three jobs,
    three scans of the eval inputs); only scalars crossed the driver so
    it was scale-safe, but at 100 TB it tripled the eval input scans.
    ``F.count(col)`` counts non-nulls, so the side flags give all three
    totals in one pass (and an empty input yields zeros, not nulls)."""
    key = ["url", "subj", "pred", "obj"]
    g = gold_triples.select(*key).dropDuplicates().withColumn("_g", F.lit(1))
    p = pred_triples.select(*key).dropDuplicates().withColumn("_p", F.lit(1))
    counts = (g.join(p, key, "full")
              .agg(F.count(F.when(F.col("_g").isNotNull()
                                  & F.col("_p").isNotNull(), 1))
                   .cast("long").alias("tp"),
                   F.count("_g").cast("long").alias("n_gold"),
                   F.count("_p").cast("long").alias("n_pred")))
    return _with_prf(counts)


def bcubed_scores(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """B-cubed extrinsic clustering evaluation (Bagga & Baldwin '98)
    — the coreference-standard score for the entity-merging passes:
    per item i, P_i = |C(i) n L(i)| / |C(i)| and R_i = the same over
    |L(i)|, averaged over items; unlike pairwise F1 it weights every
    ITEM equally, so one giant wrong merge can't hide behind many
    tiny correct ones.

    Integer protocol: each item's P_i/R_i is floor-scaled to micro6
    BEFORE averaging (order-independent integer sums), the averages
    are integer divisions, and F1 = (2*P*R) // (P + R) on the already
    floored averages — bit-exact across engines.

    Input: ``pred (item, cluster)``, ``gold (item, label)`` — one row
    per item each; items missing from either side are dropped (inner
    join).  Output: one row (n_items, bcubed_p_micro6,
    bcubed_r_micro6, bcubed_f1_micro6).

    Scale: three keyed counts (cluster size, class size, and the
    cluster-class contingency count) joined back per item — O(n),
    never a pairwise item join.
    """
    j = pred.join(gold, "item").select("item", "cluster", "label")
    csize = j.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("_cs"))
    gsize = j.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("_gs"))
    inter = j.groupBy("cluster", "label").agg(
        F.count(F.lit(1)).cast("long").alias("_in"))
    per = (j.join(inter, ["cluster", "label"])
           .join(csize, "cluster").join(gsize, "label")
           .select(
               F.floor(F.col("_in") * F.lit(1000000) / F.col("_cs"))
               .cast("long").alias("_p"),
               F.floor(F.col("_in") * F.lit(1000000) / F.col("_gs"))
               .cast("long").alias("_r")))
    return (per.agg(F.count(F.lit(1)).cast("long").alias("n_items"),
                    F.sum("_p").cast("long").alias("_sp"),
                    F.sum("_r").cast("long").alias("_sr"))
            .select(
                "n_items",
                F.floor(F.col("_sp") / F.col("n_items")).cast("long")
                .alias("bcubed_p_micro6"),
                F.floor(F.col("_sr") / F.col("n_items")).cast("long")
                .alias("bcubed_r_micro6"))
            .withColumn(
                "bcubed_f1_micro6",
                F.when(F.col("bcubed_p_micro6")
                       + F.col("bcubed_r_micro6") > 0,
                       F.floor(F.lit(2) * F.col("bcubed_p_micro6")
                               * F.col("bcubed_r_micro6")
                               / (F.col("bcubed_p_micro6")
                                  + F.col("bcubed_r_micro6"))))
                .otherwise(F.lit(0)).cast("long")))


def ner_confusion(a: DataFrame, b: DataFrame,
                  a_name: str = "rule",
                  b_name: str = "model") -> DataFrame:
    """Type-confusion matrix between two mention detectors on
    EXACT-span agreement, plus each system's unmatched mass — the
    diagnostic that says WHERE two NER paths disagree (type swaps vs
    missed spans), which strict/lenient F1 alone cannot.

    Spans align on (doc_id, start, end); aligned pairs contribute a
    (type_a, type_b) cell, spans only one side found contribute the
    '<none>' row/column.  All counts exact.

    Output: (type_a, type_b, n) — type_a = '<none>' means b-only
    spans, type_b = '<none>' means a-only.

    Scale shape: one equi-join on the span key (both sides already
    keyed by doc for every downstream stage), two anti-join
    aggregates — no pair products.
    """
    ka = a.select("doc_id", "start", "end",
                  F.col("ent_type").alias("_ta"))
    kb = b.select("doc_id", "start", "end",
                  F.col("ent_type").alias("_tb"))
    both = (ka.join(kb, ["doc_id", "start", "end"])
            .groupBy(F.col("_ta").alias("type_a"),
                     F.col("_tb").alias("type_b"))
            .agg(F.count(F.lit(1)).cast("long").alias("n")))
    only_a = (ka.join(kb, ["doc_id", "start", "end"], "left_anti")
              .groupBy(F.col("_ta").alias("type_a"))
              .agg(F.count(F.lit(1)).cast("long").alias("n"))
              .select("type_a", F.lit("<none>").alias("type_b"), "n"))
    only_b = (kb.join(ka, ["doc_id", "start", "end"], "left_anti")
              .groupBy(F.col("_tb").alias("type_b"))
              .agg(F.count(F.lit(1)).cast("long").alias("n"))
              .select(F.lit("<none>").alias("type_a"), "type_b", "n"))
    return both.unionByName(only_a).unionByName(only_b)
