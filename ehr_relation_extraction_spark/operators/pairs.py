"""Candidate-pair generation (reference R1/R2/R3/R4/R5).

Spark shape: mention rows join to their pairing window (an equi-join on
url + a range predicate over ≤ a handful of shards per url), then the
hub x attr cross product *within* (url, shard_id) is an equi-join whose
per-key fan-out is bounded by the shard length (the reference bounds it
the same way via max_len shards, predict.py:31-33).

Scale notes:
- the join key (url, shard_id) is high-cardinality and near-uniform
  after sharding, so the shuffle is well distributed; AQE skew-join
  covers residual entity-dense pages.
- gold flagging (R3) is a left semi-style join on the symmetric arg
  form (least/greatest of spans), mirroring Relation.__eq__'s symmetric
  equality (annotations.py:149-160).
- negative down-sampling (R4) uses a partition-stable md5 bucket
  instead of the reference's seeded ``random.random()``
  (biobert_re/utils_re.py:237,272-274) — documented deviation: Python
  RNG order is partition-order-sensitive; a hash of the pair identity
  is stable under any repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import HUB_TYPE, MAX_PAIR_GAP_CHARS, NEG_SAMPLE_PCT


def shard_mentions(mentions: DataFrame, shards: DataFrame) -> DataFrame:
    """Attach each mention to the pairing window that contains it.

    Reference semantics (utils_re.py:263-266, 283-284): the pairing
    universe filter is ``start >= win_start AND end <= win_end`` but the
    emitted-pair guard re-checks with strict ``end < win_end``; the
    strict form dominates, so we join on it directly.
    """
    wins = shards.select("url", "shard_id", "re_start", "re_end") \
                 .where(F.col("re_start").isNotNull())
    cond = (
        (mentions["url"] == wins["url"])
        & (mentions["start"] >= wins["re_start"])
        & (mentions["end"] < wins["re_end"])
    )
    return mentions.alias("m").join(wins.alias("w"), cond).select(
        "m.doc_id", "m.url", "m.ent_id", "m.ent_type", "m.start", "m.end",
        "m.ent_text", "w.shard_id",
    )


def candidate_pairs(mentions_in_windows: DataFrame) -> DataFrame:
    """Hub x attr cross product per (url, shard_id) with rel_type and
    deterministic R-ids (reference map_entities, utils.py:454-471:
    ``rel_type = ent2.name + "-Drug"``, sequential R%d in drug-major
    position order)."""
    m = mentions_in_windows
    hubs = m.where(F.col("ent_type") == HUB_TYPE).alias("h")
    attrs = m.where(F.col("ent_type") != HUB_TYPE).alias("a")
    pairs = hubs.join(
        attrs,
        (F.col("h.url") == F.col("a.url"))
        & (F.col("h.shard_id") == F.col("a.shard_id")),
    ).select(
        F.col("h.doc_id").alias("doc_id"),
        F.col("h.url").alias("url"),
        F.col("h.shard_id").alias("shard_id"),
        F.concat(F.col("a.ent_type"), F.lit("-"), F.lit(HUB_TYPE)).alias("rel_type"),
        F.col("h.ent_id").alias("hub_id"),
        F.col("h.ent_text").alias("hub_text"),
        F.col("h.start").alias("hub_start"),
        F.col("h.end").alias("hub_end"),
        F.col("a.ent_id").alias("attr_id"),
        F.col("a.ent_type").alias("attr_type"),
        F.col("a.ent_text").alias("attr_text"),
        F.col("a.start").alias("attr_start"),
        F.col("a.end").alias("attr_end"),
    )
    gap = F.greatest("hub_start", "attr_start") - F.least("hub_end", "attr_end")
    w = Window.partitionBy("url").orderBy(
        "shard_id", "hub_start", "hub_end", "attr_start", "attr_end", "rel_type")
    return pairs.withColumn("gap", F.greatest(gap, F.lit(0))) \
                .withColumn("rel_id",
                            F.concat(F.lit("R"), F.row_number().over(w).cast("string")))


def flag_gold(pairs: DataFrame, gold_relations: DataFrame) -> DataFrame:
    """R3: pair is positive iff it symmetric-matches a gold relation of
    the same type (utils.py:477-494 via annotations.py:149-160).

    ``gold_relations`` columns: url, rel_type, a_start, a_end, b_start,
    b_end (arg order arbitrary).
    """
    g = gold_relations.select(
        "url", "rel_type",
        F.least("a_start", "b_start").alias("lo_start"),
        F.least("a_end", "b_end").alias("lo_end"),
        F.greatest("a_start", "b_start").alias("hi_start"),
        F.greatest("a_end", "b_end").alias("hi_end"),
    ).dropDuplicates()
    p = pairs.withColumn("lo_start", F.least("hub_start", "attr_start")) \
             .withColumn("lo_end", F.least("hub_end", "attr_end")) \
             .withColumn("hi_start", F.greatest("hub_start", "attr_start")) \
             .withColumn("hi_end", F.greatest("hub_end", "attr_end"))
    joined = p.join(
        g, ["url", "rel_type", "lo_start", "lo_end", "hi_start", "hi_end"], "left_semi"
    ).select(pairs.columns).withColumn("label", F.lit(1))
    rest = p.join(
        g, ["url", "rel_type", "lo_start", "lo_end", "hi_start", "hi_end"], "left_anti"
    ).select(pairs.columns).withColumn("label", F.lit(0))
    return joined.unionByName(rest)


def balance_classes(pairs_with_label: DataFrame,
                    per_class: int = 50) -> DataFrame:
    """Stratified per-class downsampling for RE training: keep at most
    ``per_class`` candidates per (rel_type, label) stratum, chosen by a
    deterministic md5 ordering of the pair identity — partition-stable
    (same rows at any parallelism), unlike seeded ``random``/
    ``sampleBy``.  One shuffle on the stratum key; skewed strata are
    bounded by the cap itself.

    Output: (url, rel_id, rel_type, label, class_rank)."""
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", "url", "rel_id"))
    w = Window.partitionBy("rel_type", "label").orderBy(h)
    return (pairs_with_label
            .withColumn("class_rank", F.row_number().over(w).cast("int"))
            .where(F.col("class_rank") <= per_class)
            .select("url", "rel_id", "rel_type", "label", "class_rank"))


def sample_negatives(pairs_with_label: DataFrame,
                     keep_pct: int = NEG_SAMPLE_PCT) -> DataFrame:
    """R4 (training path only): keep negatives with p=keep_pct/100 via a
    stable md5 bucket of the pair identity."""
    bucket = F.conv(F.substring(F.md5(F.concat_ws(
        ":", "url", "rel_id", "rel_type")), 31, 2), 16, 10).cast("int") % 256
    keep = (F.col("label") == 1) | (bucket < F.lit(int(256 * keep_pct / 100)))
    return pairs_with_label.where(keep)
