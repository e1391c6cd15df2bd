"""A-priori frequent-itemset mining (Agrawal & Srikant VLDB'94) over
doc -> entity-set transactions: which entities co-occur in documents
often enough to be a pattern, up to size-3 sets.

The whole point of the lattice at scale: candidate (k)-itemsets are
generated ONLY from frequent (k-1)-itemsets (downward closure), so
the expensive verify joins run on the pruned candidate table, never
on the raw co-occurrence product.  All joins are equi-joins on item
ids; supports are exact integer doc counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def apriori_itemsets(tx: DataFrame, min_support: int = 5) -> DataFrame:
    """``tx``: transactions as (doc_id, item) rows (duplicates fine —
    deduped on entry).  Returns every frequent itemset of size 1-3:
    (k, item1, item2, item3, support) with items in lexicographic
    order inside a set and '' filling unused slots.

    Plan: L1 = one hash aggregate.  C2 = the doc-grain self-join of
    L1-filtered transactions (item_a < item_b), one aggregate -> L2.
    C3 = L2 join L2 on the shared FIRST item (pair-of-pairs trick)
    + the a-priori prune that the third face (item2, item3) is
    itself in L2 — only then does the doc-grain verify join run.

    Scale: the doc-grain joins key on doc_id (co-partitioned, no
    skew beyond doc fan-out); every candidate-generation join keys
    on frequent items only.  The classic failure mode — generating
    C3 from raw pairs — is structurally absent."""
    t = (tx.select("doc_id", F.col("item").cast("string").alias("item"))
         .dropDuplicates())
    l1 = (t.groupBy("item")
          .agg(F.count(F.lit(1)).cast("long").alias("support"))
          .where(F.col("support") >= min_support))
    tf = t.join(l1.select("item"), "item").select("doc_id", "item")

    p2 = (tf.alias("a").join(tf.alias("b"), "doc_id")
          .where(F.col("a.item") < F.col("b.item"))
          .select("doc_id", F.col("a.item").alias("i1"),
                  F.col("b.item").alias("i2")))
    l2 = (p2.groupBy("i1", "i2")
          .agg(F.count(F.lit(1)).cast("long").alias("support"))
          .where(F.col("support") >= min_support))

    c3 = (l2.alias("p").join(l2.alias("q"),
                             F.col("p.i1") == F.col("q.i1"))
          .where(F.col("p.i2") < F.col("q.i2"))
          .select(F.col("p.i1").alias("i1"),
                  F.col("p.i2").alias("i2"),
                  F.col("q.i2").alias("i3"))
          # downward closure: the (i2, i3) face must be frequent too
          .join(l2.select(F.col("i1").alias("i2"),
                          F.col("i2").alias("i3")), ["i2", "i3"]))
    v3 = (c3.join(p2.select("doc_id", "i1", "i2"), ["i1", "i2"])
          .join(tf.select("doc_id", F.col("item").alias("i3")),
                ["doc_id", "i3"])
          .groupBy("i1", "i2", "i3")
          .agg(F.count(F.lit(1)).cast("long").alias("support"))
          .where(F.col("support") >= min_support))

    e = F.lit("")
    return (l1.select(F.lit(1).alias("k"),
                      F.col("item").alias("item1"),
                      e.alias("item2"), e.alias("item3"), "support")
            .unionByName(l2.select(
                F.lit(2).alias("k"), F.col("i1").alias("item1"),
                F.col("i2").alias("item2"), e.alias("item3"),
                "support"))
            .unionByName(v3.select(
                F.lit(3).alias("k"), F.col("i1").alias("item1"),
                F.col("i2").alias("item2"),
                F.col("i3").alias("item3"), "support")))


def entity_itemsets(triples: DataFrame,
                    min_support: int = 12) -> DataFrame:
    """Frequent attribute-value co-occurrence sets: transactions are
    the distinct lowercased object values extracted per document
    (objects, not subjects — the hub-entity vocabulary is too small
    to exercise the lattice)."""
    return apriori_itemsets(
        triples.select("doc_id", F.lower("obj").alias("item")),
        min_support)
