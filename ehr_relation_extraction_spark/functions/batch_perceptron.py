"""Oracle-exact batch perceptron NER — the driver-checkable reduced
form of the production structured perceptron.

The production learned stage (functions/perceptron.py: averaged
structured perceptron, Viterbi decode, distributed parameter mixing)
is deliberately NOT SQL-expressible: its per-document sequential
updates nest a dynamic program inside every training step.  This
module is the round-4 verdict's sanctioned alternative ("a
reduced-epoch/reduced-feature driver variant with an exact oracle
beats rows-only"): a FULL-BATCH multiclass perceptron over the same
hashed feature template (token_features in perceptron.py — surface,
3/4-char affixes, shape, +/-1 context, context bigram; md5 buckets,
D = 2**17), with greedy per-token decode instead of Viterbi and
synchronous full-batch weight updates instead of online ones.

Why this trains exactly in SQL: every decision is integer arithmetic.
Weights are integer counts; scores are integer sums; argmax ties break
to the smallest label index; the per-epoch update is ONE aggregate of
+1/-1 feature deltas over the mispredicted tokens.  The DuckDB oracle
(oracle/sqlgen._batch_perceptron_sql) unrolls the epochs as chained
MATERIALIZED CTEs and bit-reproduces the weights, the predictions, and
the decoded spans.

Everything here is pure DataFrame algebra — not a single Python UDF:
feature hashing is md5/conv codegen, scoring is an equi-join +
aggregate, argmax is a struct-max, the IOB2 chunk decode is two window
functions.  At 100 TB the same plan holds: the weight table is bounded
by D * K rows (and in practice by active features), the per-epoch
shuffle is keyed on the hashed feature id (uniform by construction —
md5), and training runs on a bounded doc sample exactly like the
production stage.

Deviations from the production tagger (documented, deliberate):
greedy decode can emit I-X after O (the chunk decoder treats it as a
chunk start, the reference's own IOB repair quirk, model_ner.py N7);
the shape feature uses ASCII character classes (regex-expressible in
both engines) where Python str.isalpha is unicode-aware.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import IOB2_LABELS

D_BUCKETS = 1 << 17

#: feature-string expressions over (ltok, ptok, ntok, token); the same
#: template as perceptron.token_features, as SQL so both engines
#: evaluate identical strings.  ORDER IS PART OF THE CONTRACT (the
#: oracle enumerates the same list).
FEATURE_EXPRS = [
    "'w=' || ltok",
    "'p3=' || substr(ltok, 1, 3)",
    "'p4=' || substr(ltok, 1, 4)",
    "'s3=' || CASE WHEN length(ltok) <= 3 THEN ltok"
    " ELSE substr(ltok, length(ltok) - 2, 3) END",
    "'s4=' || CASE WHEN length(ltok) <= 4 THEN ltok"
    " ELSE substr(ltok, length(ltok) - 3, 4) END",
    "'sh=' || CASE WHEN regexp_like(token, '^[0-9]+$') THEN 'd'"
    " WHEN regexp_like(token, '^[a-z]+$') THEN 'a'"
    " WHEN regexp_like(token, '^[A-Za-z]+$') THEN 'A'"
    " ELSE 'x' END",
    "'pw=' || ptok",
    "'nw=' || ntok",
    "'pb=' || ptok || '|' || ltok",
]


def token_feature_frame(toks: DataFrame) -> DataFrame:
    """toks (doc_id, url, tok_idx, token, ...) -> (doc_id, tok_idx, f):
    the 9 hashed features per token.  Hashing is md5/conv codegen —
    identical buckets to DuckDB's digit-expansion of the same hex."""
    w = Window.partitionBy("doc_id").orderBy("tok_idx")
    base = (toks
            .withColumn("ltok", F.lower("token"))
            .withColumn("ptok", F.coalesce(
                F.lag(F.lower("token")).over(w), F.lit("<s>")))
            .withColumn("ntok", F.coalesce(
                F.lead(F.lower("token")).over(w), F.lit("</s>"))))
    feats = F.array(*[F.expr(e) for e in FEATURE_EXPRS])
    return (base.select("doc_id", "tok_idx", F.explode(feats).alias("fs"))
            .select("doc_id", "tok_idx",
                    (F.conv(F.substring(F.md5("fs"), 1, 8), 16, 10)
                     .cast("long") % D_BUCKETS).alias("f")))


def teacher_label_frame(toks: DataFrame, mentions: DataFrame,
                        labels: tuple[str, ...] = IOB2_LABELS
                        ) -> DataFrame:
    """(doc_id, tok_idx, y_gold): teacher IOB2 label INDEX per token,
    derived relationally from the rule mentions (the lab CTE of the
    mentions_model oracle): a token inside a mention span is B- at the
    mention's first token else I-; overlaps resolve to the mention
    with the greatest (start, end) — same tie-break both engines."""
    contained = (toks.alias("t").join(
        mentions.alias("m"),
        (F.col("t.doc_id") == F.col("m.doc_id"))
        & (F.col("t.char_start") >= F.col("m.start"))
        & (F.col("t.char_end") <= F.col("m.end")))
        .select(F.col("t.doc_id").alias("doc_id"), "tok_idx",
                "char_start", "ent_type", "start", "end"))
    first_ts = (contained.groupBy("doc_id", "ent_type", "start", "end")
                .agg(F.min("char_start").alias("first_ts")))
    cand = (contained.join(first_ts,
                           ["doc_id", "ent_type", "start", "end"])
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("doc_id", "tok_idx")
                .orderBy(F.col("start").desc(), F.col("end").desc())))
            .where(F.col("rn") == 1))
    lab = (toks.join(cand.select("doc_id", "tok_idx", "ent_type",
                                 "first_ts"),
                     ["doc_id", "tok_idx"], "left")
           .withColumn("label", F.when(
               F.col("ent_type").isNull(), F.lit("O")).otherwise(
               F.when(F.col("char_start") == F.col("first_ts"),
                      F.concat(F.lit("B-"), F.col("ent_type")))
               .otherwise(F.concat(F.lit("I-"), F.col("ent_type"))))))
    idx = label_index_frame(toks.sparkSession, labels)
    return (lab.join(F.broadcast(idx), "label")
            .select("doc_id", "tok_idx", F.col("y").alias("y_gold")))


def label_index_frame(spark, labels: tuple[str, ...] = IOB2_LABELS):
    """(y, label) broadcast dimension — index order IS the tie-break
    order, so it is part of the training contract."""
    return spark.createDataFrame(
        [(i, lab) for i, lab in enumerate(labels)], "y int, label string")


def _predict(feats: DataFrame, grid: DataFrame, w: DataFrame
             ) -> DataFrame:
    """(doc_id, tok_idx, y_pred): integer-score argmax with ties to
    the smallest label index (struct-max on (score, -y))."""
    scores = (feats.join(w, "f")
              .groupBy("doc_id", "tok_idx", "y")
              .agg(F.sum("wt").alias("s")))
    full = (grid.join(scores, ["doc_id", "tok_idx", "y"], "left")
            .fillna({"s": 0}))
    return (full.groupBy("doc_id", "tok_idx")
            .agg(F.max(F.struct(F.col("s").alias("s"),
                                (-F.col("y")).alias("ny"))).alias("m"))
            .select("doc_id", "tok_idx",
                    (-F.col("m.ny")).cast("int").alias("y_pred")))


def train_batch_tagger(feats: DataFrame, gold: DataFrame,
                       n_labels: int, epochs: int = 3) -> DataFrame:
    """Full-batch perceptron: per epoch, predict every training token
    with the current weights, then apply ONE aggregated update of
    (+1 gold, -1 pred) feature deltas over the mispredicted tokens.
    Returns the integer weight table (f, y, wt).  Deterministic under
    any partitioning — integer sums only."""
    spark = feats.sparkSession
    feats = feats.localCheckpoint()
    gold = gold.localCheckpoint()
    grid = (gold.select(
        "doc_id", "tok_idx",
        F.explode(F.sequence(F.lit(0), F.lit(n_labels - 1))).alias("y"))
        .localCheckpoint())
    w = spark.createDataFrame([], "f long, y int, wt long")
    for _ in range(epochs):
        pred = _predict(feats, grid, w)
        wrong = (pred.join(gold, ["doc_id", "tok_idx"])
                 .where(F.col("y_pred") != F.col("y_gold")))
        upd = (feats.join(wrong, ["doc_id", "tok_idx"])
               .select("f", F.explode(F.array(
                   F.struct(F.col("y_gold").alias("y"),
                            F.lit(1).alias("v")),
                   F.struct(F.col("y_pred").alias("y"),
                            F.lit(-1).alias("v")))).alias("u"))
               .select("f", F.col("u.y").alias("y"),
                       F.col("u.v").cast("long").alias("wt")))
        w = (w.unionByName(upd).groupBy("f", "y")
             .agg(F.sum("wt").alias("wt"))
             .where(F.col("wt") != 0)
             .localCheckpoint())
    return w


def decode_spans(toks: DataFrame, pred: DataFrame, pages: DataFrame,
                 labels: tuple[str, ...] = IOB2_LABELS) -> DataFrame:
    """Predicted label indexes -> IOB2 chunk decode -> char spans with
    T-ids — the window-function form of model_ner.decode_chunks (B
    starts a chunk; I after O / after a different type starts one too;
    end-of-seq closes implicitly).  ``pages`` supplies the doc text for
    ent_text extraction (joined at SPAN level, not per token)."""
    idx = label_index_frame(toks.sparkSession, labels)
    lab = (toks.join(pred, ["doc_id", "tok_idx"])
           .join(F.broadcast(idx), pred["y_pred"] == idx["y"])
           .select("doc_id", "url", "tok_idx", "char_start", "char_end",
                   "label"))
    w = Window.partitionBy("doc_id").orderBy("tok_idx")
    lab2 = (lab
            .withColumn("tag", F.substring("label", 1, 1))
            .withColumn("ltype", F.expr("substr(label, 3)"))
            .withColumn("prev", F.lag("label").over(w)))
    chunk_toks = (lab2.where(F.col("label") != "O")
                  .withColumn("is_start", F.when(
                      (F.col("tag") == "B") | F.col("prev").isNull()
                      | (F.col("prev") == "O")
                      | (F.expr("substr(prev, 3)") != F.col("ltype")),
                      F.lit(1)).otherwise(F.lit(0))))
    wd = Window.partitionBy("doc_id").orderBy("tok_idx") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunked = chunk_toks.withColumn("chunk_id",
                                    F.sum("is_start").over(wd))
    spans = (chunked.groupBy("doc_id", "url", "chunk_id")
             .agg(F.min("ltype").alias("ent_type"),
                  F.min("char_start").cast("int").alias("start"),
                  F.max("char_end").cast("int").alias("end"))
             .join(pages.select("doc_id", "text"), "doc_id")
             .withColumn("ent_text", F.expr(
                 "substr(text, start + 1, `end` - start)")))
    wt = Window.partitionBy("url").orderBy("start", "end", "ent_type")
    return (spans.withColumn(
        "ent_id", F.concat(F.lit("T"), F.row_number().over(wt)
                           .cast("string")))
        .select("doc_id", "url", "ent_id", "ent_type", "start", "end",
                "ent_text"))


def batch_perceptron_mentions(pages: DataFrame, toks: DataFrame,
                              mentions: DataFrame,
                              train_docs_below: int = 200,
                              epochs: int = 3,
                              labels: tuple[str, ...] = IOB2_LABELS
                              ) -> DataFrame:
    """End-to-end driver-query surface: train on the teacher labels of
    docs with doc_id < ``train_docs_below``, predict + decode spans
    over ALL docs.  Output: (doc_id, url, ent_id, ent_type, start,
    end, ent_text)."""
    feats_all = token_feature_frame(toks).localCheckpoint()
    tr_filter = F.col("doc_id") < train_docs_below
    gold = teacher_label_frame(toks.where(tr_filter), mentions, labels)
    w = train_batch_tagger(feats_all.where(tr_filter), gold,
                           n_labels=len(labels), epochs=epochs)
    grid_all = toks.select(
        "doc_id", "tok_idx",
        F.explode(F.sequence(F.lit(0), F.lit(len(labels) - 1)))
        .alias("y"))
    pred = _predict(feats_all, grid_all, w)
    return decode_spans(toks, pred, pages, labels)
