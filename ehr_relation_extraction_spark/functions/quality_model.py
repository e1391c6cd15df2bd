"""Learned quality classifier distilled from the rule gate.

The corpus-curation rules (textstats.corpus_curation) are hard
thresholds; production pipelines (CCNet, Gopher, RefinedWeb) replace
them with a LEARNED quality model once labels exist.  This module
distills the rule gate's quality verdict (too_short / low_diversity /
not_english vs ok — the duplicate rule is identity, not quality, and
is excluded) into a logistic-regression classifier trained fully
inside Spark.

Training is **bit-deterministic AND distributed**: full-batch gradient
descent where each epoch computes the gradient as ONE hash-aggregate —
per-row gradient contributions are quantized to integer micro-units
(floor(g * 1e6) as long) BEFORE summing, so the sum is independent of
partition count and row order (float accumulation order would not be).
The weight vector (5 floats) lives on the driver; each epoch ships it
back as literals — the classic broadcast-scalars / aggregate-gradients
loop, the same shape a 1000-executor cluster would run.  No .collect()
of data, no per-row Python: the sigmoid/gradient math is codegen
expressions; only the D+1 aggregated longs cross to the driver per
epoch.

Inference is a pure column expression (dot product of literal weights
inside whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: clipped rule-margin features (standard distillation practice:
#: engineer features on the rule boundaries, learn the weighting).
#: Order matters — m_min references the three margins before it.
_FEATS = (
    ("m_short", "least(greatest((n_tokens - 20) / 20, -1.0), 1.0)"),
    ("m_divers", "least(greatest((n_distinct_tokens / greatest(n_tokens, 1)"
                 " - 0.35) / 0.35, -1.0), 1.0)"),
    ("m_stop", "least(greatest(20 * n_stopwords / greatest(n_tokens, 1)"
               " - 1.0, -1.0), 1.0)"),
    ("m_min", "least(m_short, m_divers, m_stop)"),
)


def with_features(df: DataFrame) -> DataFrame:
    """Append the margin feature columns to any frame that carries
    (n_tokens, n_distinct_tokens, n_stopwords) — batch or streaming
    (pure column expressions, streaming-safe)."""
    out = df
    for name, expr in _FEATS:
        out = out.withColumn(name, F.expr(expr).cast("double"))
    return out


def quality_training_frame(docs: DataFrame) -> DataFrame:
    """Features + rule label per doc.  Label = the QUALITY subset of
    the curation gate (1 = passes too_short + low_diversity +
    not_english; duplicates excluded — identity, not quality)."""
    from .textstats import quality_features

    q = quality_features(docs)
    label = F.when(
        (F.col("n_tokens") >= 20)
        & (F.col("n_distinct_tokens") * 100 >= F.col("n_tokens") * 35)
        & (F.lit(20) * F.col("n_stopwords") >= F.col("n_tokens")),
        F.lit(1)).otherwise(F.lit(0))
    return with_features(q.withColumn("label", label.cast("int")))


def train_quality_classifier(train: DataFrame, epochs: int = 60,
                             lr: float = 8.0) -> list[float]:
    """Full-batch logistic GD; returns weights [bias, w1..wD].

    Each epoch: gradient g_j = sum_i floor(1e6 * (sigmoid(w.x_i) -
    y_i) * x_ij) aggregated as LONGs (order-independent), then the
    driver updates w_j -= lr * (g_j / 1e6) / n.  Deterministic under
    any partitioning; one narrow aggregate per epoch.
    """
    names = [n for n, _ in _FEATS]
    n_rows = train.count()
    if n_rows == 0:
        raise ValueError(
            "train_quality_classifier: empty training fold (0 rows) — "
            "the md5 hash split can leave no is_train=1 rows on a tiny "
            "corpus, or the caller passed an already-filtered frame")
    cached = train.select("label", *names).persist()
    try:
        w = [0.0] * (len(names) + 1)
        for _ in range(epochs):
            z = F.lit(w[0])
            for j, nm in enumerate(names):
                z = z + F.lit(w[j + 1]) * F.col(nm)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col("label")
            aggs = [F.sum(F.floor(err * F.lit(1e6)).cast("long")).alias("g0")]
            aggs += [
                F.sum(F.floor(err * F.col(nm) * F.lit(1e6)).cast("long"))
                .alias(f"g{j + 1}")
                for j, nm in enumerate(names)]
            g = cached.agg(*aggs).first()
            for j in range(len(w)):
                w[j] -= lr * (g[f"g{j}"] / 1e6) / n_rows
    finally:
        cached.unpersist()
    return w


def score_quality(df: DataFrame, weights: list[float]) -> DataFrame:
    """Append pred_keep (and the margin as micro-int) using literal
    weights — pure codegen, no Python at inference."""
    names = [n for n, _ in _FEATS]
    z = F.lit(weights[0])
    for j, nm in enumerate(names):
        z = z + F.lit(weights[j + 1]) * F.col(nm)
    return (df.withColumn("margin_micro6",
                          F.floor(z * F.lit(1e6)).cast("long"))
            .withColumn("pred_keep",
                        (F.col("margin_micro6") >= 0).cast("int")))


def quality_model_verdicts(docs: DataFrame, epochs: int = 60) -> DataFrame:
    """Driver-query surface: train on the hash-split train fold
    (md5(doc_id) bucket < 80%), score ALL docs.  Output: (doc_id,
    label, pred_keep, margin_micro6, is_train)."""
    frame = quality_training_frame(docs)
    bucket = F.pmod(F.conv(F.substring(F.md5(F.col("doc_id")
                                             .cast("string")), 1, 6),
                           16, 10).cast("long"), F.lit(100))
    frame = frame.withColumn("is_train", (bucket < 80).cast("int"))
    w = train_quality_classifier(frame.where(F.col("is_train") == 1),
                                 epochs=epochs)
    return score_quality(frame, w).select(
        "doc_id", "label", "pred_keep", "margin_micro6", "is_train")
