"""Triple emit + aggregation (reference G1-G4).

G1 (utils.py:497-530): the long (subj, pred, obj) table, arg order
normalized so the hub is always the subject; ``pred`` is the relation
type head (``split(rel_type, '-')[0]``, utils.py:527).  In our pair
representation the hub is already arg1, so normalization is a direct
projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def long_triple_table(relations: DataFrame) -> DataFrame:
    """G1: (url, subj_id, subj, pred, obj)."""
    return relations.select(
        "doc_id",
        "url",
        F.col("hub_id").alias("subj_id"),
        F.col("hub_text").alias("subj"),
        F.split(F.col("rel_type"), "-").getItem(0).alias("pred"),
        F.col("attr_text").alias("obj"),
    )


def dedup_triples(triples: DataFrame) -> DataFrame:
    """G2: drop_duplicates on the long table (utils.py:553)."""
    return triples.dropDuplicates(["url", "subj_id", "subj", "pred", "obj"])


def wide_table(triples: DataFrame) -> DataFrame:
    """G3: groupby (subj_id, subj, pred) -> newline-joined obj list
    (utils.py:561-569).  The reference's list order is pandas insertion
    order after a shuffle — non-deterministic — so we sort the list
    (SURVEY G3 note) for stable comparisons."""
    return (
        triples.groupBy("url", "subj_id", "subj", "pred")
        .agg(F.array_join(F.array_sort(F.collect_list("obj")), "\n").alias("obj_texts"),
             F.count(F.lit(1)).cast("long").alias("n_objs"))
    )


def distinct_subjects(triples: DataFrame) -> DataFrame:
    """G4: sorted distinct subject ids (utils.py:185)."""
    return triples.select("url", "subj_id", "subj").distinct()


def kg_support(triples: DataFrame) -> DataFrame:
    """Evidence scoring per canonical triple — the KG-construction
    step after dedup: how broadly is (subj, pred, obj) attested?
    (n_docs, n_hosts, first_day, last_day) per triple; n_hosts is the
    anti-spam signal (one host repeating a claim 1M times is weaker
    evidence than 100 hosts saying it once).

    day derives from the synthetic crawl clock (warc_ts = CRAWL_EPOCH
    + doc_id seconds, sources/pages.py) so the aggregate needs no side
    join.  One hash-aggregate, map-side combinable, single shuffle on
    the triple key.
    """
    host = F.regexp_extract("url", r"^https?://([^/]*)", 1)
    day = F.expr("(1704067200 + doc_id) div 86400")
    return (triples
            .groupBy("subj", "pred", "obj")
            .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"),
                 F.countDistinct(host).cast("long").alias("n_hosts"),
                 F.min(day).cast("long").alias("first_day"),
                 F.max(day).cast("long").alias("last_day")))
