"""Fused single-pass extraction: pages -> relation rows in ONE Arrow hop.

Every stage of the reference's per-document pipeline (tokenize, split,
mention detect, T-ids, pairing windows, hub x attr pairing, rule
classification, R-ids) is a pure function of one page row — so the
scale-optimal physical plan is map-side fusion: one ``mapInPandas``
pass emits finished relation rows, and the only shuffle in the whole
job is the final triple dedup.  (SURVEY §4.2.2 prescribes fusing the
Python stages; this takes it to its logical end.)

The composable relational operators (operators/ner.py, pairs.py,
relations.py) implement the same semantics as separate exchanges —
they exist for oracle-checking each stage and for workloads that need
the intermediate tables.  ``tests/test_fused.py`` asserts the fused
path emits EXACTLY the composed path's relations, and the driver
checks it against the same DuckDB oracle as the relational path.

ID parity: T-ids enumerate mentions by (start, end, type) per url;
R-ids enumerate kept pairs by (shard_id, hub_start, hub_end,
attr_start, attr_end, rel_type) per url — the same deterministic
orderings the window-function path uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

from ..config import HUB_TYPE, MAX_LEN_TOKENS, MAX_PAIR_GAP_CHARS
from ..functions.ner_kernel import detect_mentions
from ..functions.split import re_char_ranges, split_points_for
from ..functions.text import tokenize_with_offsets

RELATION_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("url", StringType()),
    StructField("shard_id", IntegerType()),
    StructField("rel_id", StringType()),
    StructField("rel_type", StringType()),
    StructField("hub_id", StringType()),
    StructField("hub_text", StringType()),
    StructField("hub_start", IntegerType()),
    StructField("hub_end", IntegerType()),
    StructField("attr_id", StringType()),
    StructField("attr_type", StringType()),
    StructField("attr_text", StringType()),
    StructField("attr_start", IntegerType()),
    StructField("attr_end", IntegerType()),
    StructField("gap", IntegerType()),
])


def candidate_pairs_for_doc(text: str,
                            max_len: int = MAX_LEN_TOKENS,
                            mentions: list[tuple] | None = None,
                            ) -> list[tuple]:
    """Pre-classification candidate set of one page: every windowed
    hub x attr pair with its char gap, as ``(window_id, hub, attr,
    gap)`` where hub/attr are ``(T-id, type, start, end, surface)``.
    The RE classification (rule: gap <= max_gap) is deliberately NOT
    applied — incremental consumers (streaming negative cache) gate it
    per pair."""
    toks = tokenize_with_offsets(text)
    if not toks:
        return []
    if mentions is None:
        mentions = detect_mentions(text, toks)
    if not mentions:
        return []
    splits = split_points_for(text, toks, max_len)
    windows = re_char_ranges(splits, [e for _, _, e in toks])
    if not windows:
        return []

    # T-ids: (start, end, type) order — detect_mentions already sorts
    ments = [(f"T{i + 1}", t, s, e, surf)
             for i, (t, s, e, surf) in enumerate(mentions)]

    pairs = []
    for wid, (ws, we) in enumerate(windows):
        in_win = [m for m in ments if m[2] >= ws and m[3] < we]
        hubs = [m for m in in_win if m[1] == HUB_TYPE]
        attrs = [m for m in in_win if m[1] != HUB_TYPE]
        for h in hubs:
            for a in attrs:
                gap = max(max(h[2], a[2]) - min(h[3], a[3]), 0)
                pairs.append((wid, h, a, gap))
    return pairs


def relations_for_doc(doc_id: int, url: str, text: str,
                      max_len: int = MAX_LEN_TOKENS,
                      max_gap: int = MAX_PAIR_GAP_CHARS,
                      mentions: list[tuple] | None = None) -> list[tuple]:
    """Per-document kernel: the whole reference pipeline, doc-locally.

    ``mentions`` (optional): precomputed (type, start, end, surface)
    list — lets a model detector (e.g. the perceptron) feed the same
    pairing/RE stages, mirroring the reference's model_choice cascade
    (fast_api.py:29-56).  Default: the gazetteer detector."""
    kept = [p for p in candidate_pairs_for_doc(text, max_len, mentions)
            if p[3] <= max_gap]

    # R-ids: same ordering as the window-function path
    kept.sort(key=lambda k: (k[0], k[1][2], k[1][3], k[2][2], k[2][3],
                             f"{k[2][1]}-{HUB_TYPE}"))
    out = []
    for i, (wid, h, a, gap) in enumerate(kept):
        out.append((doc_id, url, wid, f"R{i + 1}", f"{a[1]}-{HUB_TYPE}",
                    h[0], h[4], h[2], h[3],
                    a[0], a[1], a[4], a[2], a[3], gap))
    return out


def fused_relations(pages: DataFrame,
                    max_len: int = MAX_LEN_TOKENS,
                    max_gap: int = MAX_PAIR_GAP_CHARS) -> DataFrame:
    src = pages.select("doc_id", "url", "text")
    cols = [f.name for f in RELATION_SCHEMA.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [r
                    for d, u, t in zip(pdf["doc_id"], pdf["url"], pdf["text"])
                    for r in relations_for_doc(d, u, t, max_len, max_gap)]
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(gen, RELATION_SCHEMA)


def fused_triples(pages: DataFrame,
                  max_len: int = MAX_LEN_TOKENS,
                  max_gap: int = MAX_PAIR_GAP_CHARS) -> DataFrame:
    """The production triple path: one Arrow pass + one dedup shuffle."""
    rel = fused_relations(pages, max_len, max_gap)
    return (rel.select(
        "doc_id", "url",
        F.col("hub_id").alias("subj_id"),
        F.col("hub_text").alias("subj"),
        F.split(F.col("rel_type"), "-").getItem(0).alias("pred"),
        F.col("attr_text").alias("obj"))
        .dropDuplicates(["url", "subj_id", "subj", "pred", "obj"]))
