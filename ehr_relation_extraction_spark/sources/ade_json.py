"""ADE-corpus JSON source (reference S3, utils.py:309-419).

Reference semantics replicated:
- entity type ``Adverse-Effect`` is renamed ``ADE`` (utils.py:379-380);
  our web schema analogue maps it to ``Misc`` only at the caller's
  option — the reader itself keeps the renamed reference types.
- entity ranges are TOKEN indices with an end-exclusive input form
  converted to the reference's inclusive form minus one... precisely:
  the reference stores ``[start, end - 1]`` (utils.py:385-386); we keep
  ``(tok_start, tok_end_incl)`` columns mirroring that.
- relations reference entities by list position (``head``/``tail``
  indices, utils.py:399-416).

Input shape (one JSON object per document):
  {"tokens": [...], "entities": [{"type": ..., "start": ..., "end": ...}],
   "relations": [{"type": ..., "head": i, "tail": j}]}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def read_ade_json(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (docs, entities, relations):

    docs:      (doc_id, tokens array<string>)
    entities:  (doc_id, ent_idx, ent_type, tok_start, tok_end_incl, ent_text)
    relations: (doc_id, rel_idx, rel_type, head, tail)
    """
    raw = spark.read.json(path)
    docs = raw.select(
        F.monotonically_increasing_id().alias("_rid"), "tokens",
        "entities", "relations")
    # deterministic doc ids: order by the token fingerprint
    docs = docs.withColumn(
        "doc_id",
        (F.row_number().over(Window.orderBy(F.md5(F.concat_ws(" ", "tokens"))))
         - 1).cast("long"))

    ents = (docs.select("doc_id", "tokens",
                        F.posexplode("entities").alias("ent_idx", "e"))
            .select(
                "doc_id",
                F.col("ent_idx").cast("int").alias("ent_idx"),
                F.when(F.col("e.type") == "Adverse-Effect", F.lit("ADE"))
                 .otherwise(F.col("e.type")).alias("ent_type"),
                F.col("e.start").cast("int").alias("tok_start"),
                (F.col("e.end").cast("int") - 1).alias("tok_end_incl"),
                F.array_join(
                    F.slice(F.col("tokens"), F.col("e.start").cast("int") + 1,
                            F.col("e.end").cast("int") - F.col("e.start").cast("int")),
                    " ").alias("ent_text")))

    rels = (docs.select("doc_id", F.posexplode("relations").alias("rel_idx", "r"))
            .select("doc_id",
                    F.col("rel_idx").cast("int").alias("rel_idx"),
                    F.col("r.type").alias("rel_type"),
                    F.col("r.head").cast("int").alias("head"),
                    F.col("r.tail").cast("int").alias("tail")))
    return docs.select("doc_id", "tokens"), ents, rels
