"""Batch-perceptron learned NER (functions/batch_perceptron.py) —
the oracle-exact reduced form of the production structured perceptron.
Cross-engine value parity is covered by the parametrized driver
contract (mentions_perceptron); here we pin the properties the oracle
cannot see: learning quality vs the teacher, partition invariance of
the integer training loop, and the feature-hash contract."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _frames(spark):
    from ehr_relation_extraction_spark import driver_queries as dq

    return dq._frames(spark, SF)


def _model_out(spark):
    from ehr_relation_extraction_spark import driver_queries as dq

    return dq.QUERIES["mentions_perceptron"](spark, SF)


def test_learns_above_majority_baseline(spark):
    """3 full-batch epochs must recover most teacher spans exactly —
    the model starts from all-zero weights (epoch-1 predictions are
    the degenerate smallest-index label), so any real recall proves
    the update loop learns."""
    out = _model_out(spark).select("doc_id", "ent_type", "start", "end")
    teach = _frames(spark).mentions.select(
        "doc_id", "ent_type", "start", "end")
    tp = out.intersect(teach).count()
    n_pred, n_gold = out.count(), teach.count()
    assert n_pred > 0
    assert tp / n_gold >= 0.65, f"recall {tp / n_gold:.3f}"
    assert tp / n_pred >= 0.65, f"precision {tp / n_pred:.3f}"


def test_training_partition_invariant(spark):
    """Integer-quantized full-batch updates are order-independent:
    retraining under a different partitioning bit-reproduces the
    weight table."""
    from ehr_relation_extraction_spark.functions.batch_perceptron import (
        teacher_label_frame, token_feature_frame, train_batch_tagger)
    from ehr_relation_extraction_spark.config import IOB2_LABELS
    from ehr_relation_extraction_spark.operators import ner

    fr = _frames(spark)
    toks = ner.tokenize_df(fr.pages).where(F.col("doc_id") < 50)
    feats = token_feature_frame(toks)
    gold = teacher_label_frame(toks, fr.mentions)

    def wtab(f, g):
        w = train_batch_tagger(f, g, n_labels=len(IOB2_LABELS), epochs=2)
        return sorted(tuple(r) for r in w.collect())

    a = wtab(feats, gold)
    b = wtab(feats.repartition(17), gold.repartition(3))
    assert a == b and len(a) > 0


def test_feature_hash_matches_production_template(spark):
    """The DataFrame-side md5/conv bucket must equal the production
    tagger's Python hash for the same feature string (perceptron.
    _bucket) — the reduced model shares the feature space."""
    from ehr_relation_extraction_spark.functions.perceptron import _bucket

    strings = ["w=the", "p3=tok", "s4=tion", "sh=A", "pw=<s>",
               "nw=</s>", "pb=a|b", "w=café"]
    df = spark.createDataFrame([(s,) for s in strings], "fs string")
    got = {r["fs"]: r["f"] for r in df.select(
        "fs", (F.conv(F.substring(F.md5("fs"), 1, 8), 16, 10)
               .cast("long") % (1 << 17)).alias("f")).collect()}
    for s in strings:
        assert got[s] == _bucket(s), s


def test_decode_handles_i_after_o(spark):
    """Greedy decode can emit I-X with no preceding B-X; the chunk
    decoder must open a chunk there (the reference's IOB repair quirk,
    model_ner decode_chunks / N7)."""
    from ehr_relation_extraction_spark.functions.batch_perceptron import (
        decode_spans)
    from ehr_relation_extraction_spark.config import IOB2_LABELS

    text = "aa bb cc"
    toks = spark.createDataFrame(
        [(1, "u", 0, "aa", 0, 2), (1, "u", 1, "bb", 3, 5),
         (1, "u", 2, "cc", 6, 8)],
        "doc_id long, url string, tok_idx int, token string, "
        "char_start int, char_end int")
    lab_to_y = {lab: i for i, lab in enumerate(IOB2_LABELS)}
    pred = spark.createDataFrame(
        [(1, 0, lab_to_y["O"]), (1, 1, lab_to_y["I-Topic"]),
         (1, 2, lab_to_y["I-Date"])],
        "doc_id long, tok_idx int, y_pred int")
    pages = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["ent_type"], r["start"], r["end"], r["ent_text"])
        for r in decode_spans(toks, pred, pages).collect())
    assert rows == [("Date", 6, 8, "cc"), ("Topic", 3, 5, "bb")]
