"""Relation classification (reference R6/R7/R8/R9) + masking (T7/T8/T9).

The classifier contract matches the reference's RE stage
(predict.py:376-387): candidates in -> ``pred`` column -> keep
``pred == 1`` -> reassign sequential R-ids.  v1 ships the deterministic
rule classifier (same-window pair + char-gap threshold) so the oracle is
exact; a batched torch sequence classifier slots into
``classify_with_model`` behind the same contract without touching the
DAG.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import StringType, StructField, StructType, LongType

from ..config import MAX_PAIR_GAP_CHARS


def classify_rule(pairs: DataFrame,
                  max_gap: int = MAX_PAIR_GAP_CHARS) -> DataFrame:
    """Deterministic rule classifier: positive iff the char gap between
    the two spans is <= max_gap.  Pure JVM expression (codegen)."""
    return pairs.withColumn(
        "pred", (F.col("gap") <= F.lit(max_gap)).cast("int"))


def classify_learned(pairs: DataFrame, model) -> DataFrame:
    """Learned RE classifier (reference R8 contract): scores candidate
    rows with a trained ``functions.perceptron.PairClassifier`` in one
    Arrow pass — the weights (a few hundred KB used) ship in the
    closure; schema = input columns + ``pred`` int, so it drops into
    ``keep_positive`` exactly like ``classify_rule``."""
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.types import IntegerType, StructField, StructType

    from ..functions.perceptron import PairClassifier

    fields = list(PairClassifier.FIELDS)
    schema = StructType(pairs.schema.fields
                        + [StructField("pred", IntegerType())])
    cols = [f.name for f in pairs.schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            preds = [model.predict(row) for row in
                     zip(*(pdf[f] for f in fields))]
            out = pdf[cols].copy()
            out["pred"] = pd.Series(preds, dtype="int32")
            yield out

    return pairs.mapInPandas(gen, schema)


def keep_positive(classified: DataFrame) -> DataFrame:
    """R9: keep pred==1, reassign R%d sequentially per url in position
    order (predict.py:379-387 reassigns in candidate order)."""
    w = Window.partitionBy("url").orderBy(
        "shard_id", "hub_start", "hub_end", "attr_start", "attr_end", "rel_type")
    return classified.where(F.col("pred") == 1).withColumn(
        "rel_id", F.concat(F.lit("R"), F.row_number().over(w).cast("string")))


MASKED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("url", StringType()),
    StructField("rel_id", StringType()),
    StructField("rel_type", StringType()),
    StructField("masked_text", StringType()),
])


def collapse_consecutive_duplicates(tokens: list[str]) -> list[str]:
    """T9 (biobert_re/utils_re.py:328-333): after masking, collapse
    equal consecutive tokens (``@ADE$ @ADE$`` -> ``@ADE$``) — the ADE
    corpus branch's cleanup, exposed for that input form."""
    out: list[str] = []
    for tok in tokens:
        if not out or out[-1] != tok:
            out.append(tok)
    return out


def _mask(text: str, s1: int, e1: int, t1: str, s2: int, e2: int, t2: str,
          offset: int) -> str:
    """T7: replace each arg span with @Type$, later span first so earlier
    offsets stay valid (utils_re.py:210-230 via :182-184); then T8 scrub
    (utils_re.py:289).  Offsets are rebased by the window start
    (utils_re.py:211-216)."""
    a = (s1 - offset, e1 - offset, t1)
    b = (s2 - offset, e2 - offset, t2)
    first, second = (a, b) if a[0] <= b[0] else (b, a)
    out = text[:second[0]] + f"@{second[2]}$" + text[second[1]:]
    out = out[:first[0]] + f"@{first[2]}$" + out[first[1]:]
    return out.replace("\n", " ").replace("\t", " ")


def build_masked_inputs(pairs: DataFrame, shards: DataFrame,
                        pages: DataFrame) -> DataFrame:
    """R6: produce the masked window text per candidate (the RE model's
    input sentence).  One Arrow hop over pairs joined with window
    bounds + page text.

    Join strategy: pairs ⋈ shards is an equi-join on (url, shard_id);
    pages text is joined on url — both keys are the pipeline's standard
    bucket key, so with bucketed tables these are co-located joins.
    """
    wins = shards.select("url", "shard_id", "re_start", "re_end")
    src = (
        pairs.join(wins, ["url", "shard_id"])
        .join(pages.select("url", "text"), ["url"])
        .select("doc_id", "url", "rel_id", "rel_type", "text",
                "re_start", "re_end",
                "hub_start", "hub_end", "attr_start", "attr_end", "attr_type")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                win_text = r.text[r.re_start:r.re_end]
                rows.append((r.doc_id, r.url, r.rel_id, r.rel_type,
                             _mask(win_text, r.hub_start, r.hub_end, "Topic",
                                   r.attr_start, r.attr_end, r.attr_type,
                                   r.re_start)))
            yield pd.DataFrame(rows, columns=[f.name for f in MASKED_SCHEMA.fields])

    return src.mapInPandas(gen, MASKED_SCHEMA)
