"""Fixture-format readers/writers (reference S2-S7).

These parse/emit the reference's interchange formats so gold
annotations produced for the reference can be loaded as DataFrames:

- brat ``.ann`` (S2, ehr.py:100-194): ``T<n>\\tType start end[;s e]*\\ttext``
  entity lines (multi-range collapsed to [first_start, last_end],
  ehr.py:149-156) and ``R<n>\\tRType Arg1:Tx Arg2:Ty`` relation lines;
  forward references resolved by a second pass (the reference keeps a
  backlog, ehr.py:168-176 — a second pass is the set-equivalent).
- CoNLL token/label files (S4, biobert_ner/utils_ner.py:135-162):
  blank-line-delimited sentences; sessionized with a running-sum window
  (no per-file Python).
- CoNLL writer (S6) and GLUE-style RE TSV reader/writer (S5/S7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def parse_brat(ann_lines: DataFrame) -> tuple[DataFrame, DataFrame]:
    """``ann_lines``: (doc_id string, line string) rows of .ann files.

    Returns (entities, relations):
      entities:  (doc_id, ent_id, ent_type, start, end, ent_text)
      relations: (doc_id, rel_id, rel_type, arg1_id, arg2_id)
    """
    t = ann_lines.where(F.col("line").startswith("T"))
    parts = F.split(F.col("line"), "\t")
    spans = F.element_at(parts, 2)
    ent = t.select(
        "doc_id",
        F.element_at(parts, 1).alias("ent_id"),
        F.element_at(F.split(spans, " "), 1).alias("ent_type"),
        # multi-range "a b;c d" -> [a, d]  (ehr.py:149-156)
        F.element_at(F.split(spans, "[ ;]"), 2).cast("int").alias("start"),
        F.element_at(F.split(spans, "[ ;]"), -1).cast("int").alias("end"),
        F.element_at(parts, 3).alias("ent_text"),
    )
    r = ann_lines.where(F.col("line").startswith("R"))
    body = F.element_at(F.split(F.col("line"), "\t"), 2)
    rel = r.select(
        "doc_id",
        F.element_at(F.split(F.col("line"), "\t"), 1).alias("rel_id"),
        F.element_at(F.split(body, " "), 1).alias("rel_type"),
        F.regexp_extract(body, r"Arg1:(\S+)", 1).alias("arg1_id"),
        F.regexp_extract(body, r"Arg2:(\S+)", 1).alias("arg2_id"),
    )
    # second pass = forward-reference resolution: keep only relations
    # whose both args exist (the reference raises on dangling refs;
    # we drop and count them instead — scale-safe)
    e_ids = ent.select("doc_id", F.col("ent_id").alias("arg1_id"))
    rel = rel.join(e_ids, ["doc_id", "arg1_id"], "left_semi")
    e_ids2 = ent.select("doc_id", F.col("ent_id").alias("arg2_id"))
    rel = rel.join(e_ids2, ["doc_id", "arg2_id"], "left_semi")
    return ent, rel


def read_conll(spark: SparkSession, path: str, sep: str = " ") -> DataFrame:
    """CoNLL reader via running-sum sessionization (SURVEY S4):
    (file, sent_id, tok_idx, token, label)."""
    lines = (spark.read.text(path)
             .withColumn("file", F.input_file_name())
             .withColumn("line_id", F.monotonically_increasing_id()))
    w = Window.partitionBy("file").orderBy("line_id")
    lines = lines.withColumn(
        "sent_id",
        F.sum((F.trim("value") == "").cast("int")).over(w))
    toks = lines.where(F.trim("value") != "")
    return toks.select(
        "file",
        F.col("sent_id").cast("int").alias("sent_id"),
        (F.row_number().over(
            Window.partitionBy("file", "sent_id").orderBy("line_id")) - 1
         ).alias("tok_idx"),
        F.element_at(F.split("value", sep), 1).alias("token"),
        F.element_at(F.split("value", sep), -1).alias("label"),
    )


def write_conll(tokens: DataFrame, path: str, sep: str = " ") -> None:
    """CoNLL writer (S6): token<sep>label lines, blank line between
    sentences.  One output line per row; the blank separators are
    emitted as rows so the file round-trips through read_conll."""
    rows = tokens.select(
        "sent_id", "tok_idx",
        F.concat_ws(sep, "token", "label").alias("value"))
    blanks = (tokens.select("sent_id").distinct()
              .select("sent_id", F.lit(2_000_000_000).alias("tok_idx"),
                      F.lit("").alias("value")))
    (rows.unionByName(blanks)
     .orderBy("sent_id", "tok_idx")
     .select("value")
     .coalesce(1).write.mode("overwrite").text(path))


def write_re_tsv(masked: DataFrame, path: str) -> None:
    """RE TSV writer (S7, biobert_re/utils_re.py:187-194): header then
    ``index<TAB>sentence`` rows; the index->relation map is carried as
    ordinary columns (no side pickle)."""
    w = Window.orderBy("url", "rel_id")
    (masked.select(
        (F.row_number().over(w) - 1).cast("string").alias("index"),
        F.col("masked_text").alias("sentence"),
        "url", "rel_id", "rel_type")
     .coalesce(1)
     .write.mode("overwrite").option("header", True).option("sep", "\t")
     .csv(path))


def read_re_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S5: GLUE-style TSV reader."""
    return (spark.read.option("header", True).option("sep", "\t").csv(path))
