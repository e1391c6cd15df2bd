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

from bisect import bisect_right
from collections.abc import Iterator

import pyarrow as pa

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

_REL_PA_TYPES = [pa.int64(), pa.string(), pa.int32(), pa.string(),
                 pa.string(), pa.string(), pa.string(), pa.int32(),
                 pa.int32(), pa.string(), pa.string(), pa.string(),
                 pa.int32(), pa.int32(), pa.int32()]
_REL_NAMES = [f.name for f in RELATION_SCHEMA.fields]


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

    # windows are consecutive [s0,s1),[s1,s2),...: a mention can satisfy
    # (start >= ws AND end < we) for AT MOST the window containing its
    # start (any earlier window's `end < we` fails because end >= start
    # >= that window's we; any later window's `start >= ws` fails) — so
    # the old per-window O(W x M) scan reduces to one bisect per
    # mention (r06, same pair set).
    win_starts = [w[0] for w in windows]
    hubs_by_w: list[list] = [[] for _ in windows]
    attrs_by_w: list[list] = [[] for _ in windows]
    for m in ments:
        wi = bisect_right(win_starts, m[2]) - 1
        if wi >= 0 and m[3] < windows[wi][1]:
            (hubs_by_w if m[1] == HUB_TYPE else attrs_by_w)[wi].append(m)

    pairs = []
    for wid in range(len(windows)):
        attrs = attrs_by_w[wid]
        if not attrs:
            continue
        for h in hubs_by_w[wid]:
            hs, he = h[2], h[3]
            for a in attrs:
                gap = max(hs, a[2]) - min(he, a[3])
                pairs.append((wid, h, a, gap if gap > 0 else 0))
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

    # R-ids: same ordering as the window-function path.  The last key
    # is rel_type = f"{attr_type}-{HUB_TYPE}"; with a shared constant
    # suffix and alnum-only type names, ordering by attr_type alone is
    # identical ('-' < every alnum char covers the prefix case), so the
    # per-pair f-string build is dropped (r06).
    kept.sort(key=lambda k: (k[0], k[1][2], k[1][3], k[2][2], k[2][3],
                             k[2][1]))
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

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            rows = [r
                    for d, u, t in zip(b.column("doc_id").to_pylist(),
                                       b.column("url").to_pylist(),
                                       b.column("text").to_pylist())
                    for r in relations_for_doc(d, u, t, max_len, max_gap)]
            # columnar transpose (guide §4.2): zip is C-speed and the
            # typed pa.array construction skips the pandas object-dtype
            # detour the old mapInPandas path paid per batch.
            cols = (list(zip(*rows)) if rows
                    else [[] for _ in _REL_PA_TYPES])
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, type=t) for c, t in zip(cols, _REL_PA_TYPES)],
                names=_REL_NAMES)

    return src.mapInArrow(
        gen, ("doc_id long, url string, shard_id int, rel_id string, "
              "rel_type string, hub_id string, hub_text string, "
              "hub_start int, hub_end int, attr_id string, "
              "attr_type string, attr_text string, attr_start int, "
              "attr_end int, gap int"))


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
