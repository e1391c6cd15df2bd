"""Sharding + mention detection as fused Arrow stages.

Design (SURVEY §4.2.2): tokenize + split + detect run in ONE
``mapInPandas`` hop per output table — documents never ship token
arrays or char maps through a shuffle; only compact span rows leave the
Python worker.  At 100 TB this is the scale-critical property: the
stage is embarrassingly parallel over pages partitions, with no shuffle
at all until the pair join.

Determinism: every output row is a pure function of (url, text) and the
broadcast-free module-level gazetteer (config.py), so re-running any
partition yields identical rows (checkpoint/resume safe).

Reference parity notes:
- shards: predict.py:204-208 (token slices) + utils_re.py:197-207
  (pairing char windows; quirks replicated — see functions/split.py).
- mentions: dict_ner.py:82-119 semantics with two documented bug fixes
  (functions/ner_kernel.py); T-ids assigned by deterministic
  ``row_number`` over (start, end, ent_type) per url — the reference
  assigns sequential ids in chunk order (predict.py:342), which for
  position-sorted predictions is the same ordering.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

from ..functions.ner_kernel import detect_mentions, gazetteer_by_ngram
from ..functions.split import re_char_ranges, shard_token_ranges, split_points_for
from ..functions.text import tokenize_with_offsets
from ..config import MAX_LEN_TOKENS

TOKEN_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("url", StringType()),
    StructField("tok_idx", IntegerType()),
    StructField("token", StringType()),
    StructField("char_start", IntegerType()),
    StructField("char_end", IntegerType()),
])

SHARD_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("url", StringType()),
    StructField("shard_id", IntegerType()),
    StructField("tok_start", IntegerType()),
    StructField("tok_end", IntegerType()),
    StructField("char_start", IntegerType()),
    StructField("char_end", IntegerType()),
    StructField("re_start", IntegerType()),   # pairing window (nullable)
    StructField("re_end", IntegerType()),
    StructField("n_tokens", IntegerType()),
])

MENTION_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("url", StringType()),
    StructField("ent_type", StringType()),
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
    StructField("ent_text", StringType()),
])


def _shard_rows(doc_id: int, url: str, text: str, max_len: int):
    toks = tokenize_with_offsets(text)
    if not toks:
        return
    splits = split_points_for(text, toks, max_len)
    ranges = shard_token_ranges(splits)
    re_ranges = re_char_ranges(splits, [t[2] for t in toks])
    n = len(toks)
    for sid, (ts, te) in enumerate(ranges):
        rs, rend = (re_ranges[sid] if sid < len(re_ranges) else (None, None))
        if ts >= n or te <= ts:  # degenerate duplicate split point
            cs = ce = len(text)
        else:
            cs, ce = toks[ts][1], toks[te - 1][2]
        yield (doc_id, url, sid, ts, te, cs, ce, rs, rend, n)


def tokenize_df(pages: DataFrame) -> DataFrame:
    """pages -> token rows with char offsets (T1 + T4), one Arrow hop."""
    src = pages.select("doc_id", "url", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (doc_id, url, i, tok, s, e)
                for doc_id, url, text in zip(pdf["doc_id"], pdf["url"], pdf["text"])
                for i, (tok, s, e) in enumerate(tokenize_with_offsets(text))
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in TOKEN_SCHEMA.fields])

    return src.mapInPandas(gen, TOKEN_SCHEMA)


def build_shards(pages: DataFrame, max_len: int = MAX_LEN_TOKENS) -> DataFrame:
    """pages(doc_id, url, text, ...) -> shard rows (one Arrow hop)."""
    src = pages.select("doc_id", "url", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [r
                    for doc_id, url, text in zip(pdf["doc_id"], pdf["url"], pdf["text"])
                    for r in _shard_rows(doc_id, url, text, max_len)]
            yield pd.DataFrame(rows, columns=[f.name for f in SHARD_SCHEMA.fields])

    return src.mapInPandas(gen, SHARD_SCHEMA)


def detect_mentions_df(pages: DataFrame,
                       gazetteer: tuple | None = None,
                       with_ids: bool = True) -> DataFrame:
    """pages -> mention spans with deterministic T-ids.

    ``gazetteer`` overrides the default dictionary (used by the eval
    operators to build an imperfect "system" run).  The tuple is tiny
    and is shipped in the UDF closure — the broadcast-variable analogue
    for a dictionary this size (SURVEY N1 note).

    The window for T-ids shuffles by url once; mention rows are tiny
    (≈40 bytes) compared to page text, so this is the cheap place to
    pay a shuffle.
    """
    src = pages.select("doc_id", "url", "text")
    gaz_by_n = gazetteer_by_ngram(gazetteer) if gazetteer is not None else None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, url, text in zip(pdf["doc_id"], pdf["url"], pdf["text"]):
                toks = tokenize_with_offsets(text)
                for (ent_type, s, e, surf) in detect_mentions(text, toks, gaz_by_n):
                    rows.append((doc_id, url, ent_type, s, e, surf))
            yield pd.DataFrame(rows, columns=[f.name for f in MENTION_SCHEMA.fields])

    raw = src.mapInPandas(gen, MENTION_SCHEMA)
    if not with_ids:
        # streaming callers: the per-url T-id row_number window is not
        # streaming-legal and id-free consumers (trending counts)
        # don't need it — the kernel output alone is a pure per-page
        # function, so the plan stays a legal streaming aggregation.
        return raw
    w = Window.partitionBy("url").orderBy("start", "end", "ent_type")
    return raw.withColumn(
        "ent_id", F.concat(F.lit("T"), F.row_number().over(w).cast("string"))
    )
