"""Sharding + mention detection as fused Arrow stages.

Design (SURVEY §4.2.2): tokenize + split + detect run in ONE Arrow hop
per output table — documents never ship token arrays or char maps
through a shuffle; only compact span rows leave the Python worker.  At
100 TB this is the scale-critical property: the stage is embarrassingly
parallel over pages partitions, with no shuffle at all until the pair
join.

Optimization round 6 (guide §4.2): the hops are ``mapInArrow`` kernels
that build columnar pyarrow batches directly — no per-row tuple lists,
no pandas object-dtype intermediate, numpy for the repeated/derived
numeric columns.  Measured at sf1.0 local[32]: tokenize hop 1.12 s ->
0.73 s with identical output hashes.

Determinism: every output row is a pure function of (url, text) and the
broadcast-free module-level gazetteer (config.py), so re-running any
partition yields identical rows (checkpoint/resume safe).

Reference parity notes:
- shards: predict.py:204-208 (token slices) + utils_re.py:197-207
  (pairing char windows; quirks replicated — see functions/split.py).
- mentions: dict_ner.py:82-119 semantics with two documented bug fixes
  (functions/ner_kernel.py); T-ids assigned in-kernel by enumerating
  the (start, end, ent_type)-sorted spans per url — provably the same
  ids as the previous ``row_number`` window (detect_mentions returns
  exactly that ordering, url is unique per document), with zero
  exchanges; the fused path (plans/fused.py) has always used this
  enumeration and is oracle-checked against the same DuckDB statement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

from ..functions.ner_kernel import detect_mentions, gazetteer_by_ngram
from ..functions.split import re_char_ranges, shard_token_ranges, split_points_for
from ..functions.text import SEPARATOR_RE, tokenize_with_offsets
from ..config import MAX_LEN_TOKENS

TOKEN_DDL = ("doc_id long, url string, tok_idx int, token string, "
             "char_start int, char_end int")

# StructType form of the raw (id-free) mention schema — kept for
# model_ner.py, which emits the same rows from its learned detector.
from pyspark.sql.types import (IntegerType, LongType, StringType,  # noqa: E402
                               StructField, StructType)

MENTION_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("url", StringType()),
    StructField("ent_type", StringType()),
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
    StructField("ent_text", StringType()),
])

SHARD_DDL = ("doc_id long, url string, shard_id int, tok_start int, "
             "tok_end int, char_start int, char_end int, re_start int, "
             "re_end int, n_tokens int")
_SHARD_TYPES = [pa.int64(), pa.string(), pa.int32(), pa.int32(), pa.int32(),
                pa.int32(), pa.int32(), pa.int32(), pa.int32(), pa.int32()]

MENTION_DDL = ("doc_id long, url string, ent_type string, start int, "
               "end int, ent_text string, ent_id string")
_MENTION_TYPES = [pa.int64(), pa.string(), pa.string(), pa.int32(),
                  pa.int32(), pa.string(), pa.string()]


def _batch(rows: list[tuple], types: list, names: list[str]) -> pa.RecordBatch:
    """Transpose a row list into a typed RecordBatch (zip is C-speed;
    no pandas, no object-dtype detour)."""
    cols = list(zip(*rows)) if rows else [[] for _ in types]
    return pa.RecordBatch.from_arrays(
        [pa.array(c, type=t) for c, t in zip(cols, types)], names=names)


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
    """pages -> token rows with char offsets (T1 + T4), one Arrow hop.

    Columnar kernel: the split loop appends straight to per-column
    lists, doc_id/url/tok_idx are derived with numpy repeats — the
    2.7M-row output at sf1.0 never exists as Python row objects.
    """
    src = pages.select("doc_id", "url", "text")

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        for b in batches:
            texts = b.column("text").to_pylist()
            toks: list[str] = []
            starts: list[int] = []
            ends: list[int] = []
            nper: list[int] = []
            t_app, s_app, e_app = toks.append, starts.append, ends.append
            split = SEPARATOR_RE.split
            for text in texts:
                k = 0
                pos = 0
                for piece in split(text):
                    if piece:
                        t_app(piece)
                        s_app(pos)
                        end = pos + len(piece)
                        e_app(end)
                        pos = end + 1
                        k += 1
                    else:
                        pos += 1
                nper.append(k)
            npa = np.array(nper, dtype="int64")
            tot = len(toks)
            reps = np.repeat(np.arange(len(nper)), npa)
            did = np.asarray(b.column("doc_id"), dtype="int64")[reps]
            urls = b.column("url").take(pa.array(reps))
            idx = (np.arange(tot) - np.repeat(np.cumsum(npa) - npa, npa))
            yield pa.RecordBatch.from_arrays(
                [pa.array(did), urls, pa.array(idx.astype("int32")),
                 pa.array(toks, pa.string()),
                 pa.array(np.array(starts, dtype="int32")),
                 pa.array(np.array(ends, dtype="int32"))],
                names=["doc_id", "url", "tok_idx", "token",
                       "char_start", "char_end"])

    return src.mapInArrow(gen, TOKEN_DDL)


def build_shards(pages: DataFrame, max_len: int = MAX_LEN_TOKENS) -> DataFrame:
    """pages(doc_id, url, text, ...) -> shard rows (one Arrow hop)."""
    src = pages.select("doc_id", "url", "text")

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            rows = [r
                    for doc_id, url, text in zip(
                        b.column("doc_id").to_pylist(),
                        b.column("url").to_pylist(),
                        b.column("text").to_pylist())
                    for r in _shard_rows(doc_id, url, text, max_len)]
            yield _batch(rows, _SHARD_TYPES,
                         ["doc_id", "url", "shard_id", "tok_start",
                          "tok_end", "char_start", "char_end",
                          "re_start", "re_end", "n_tokens"])

    return src.mapInArrow(gen, SHARD_DDL)


def detect_mentions_df(pages: DataFrame,
                       gazetteer: tuple | None = None,
                       with_ids: bool = True) -> DataFrame:
    """pages -> mention spans with deterministic T-ids.

    ``gazetteer`` overrides the default dictionary (used by the eval
    operators to build an imperfect "system" run).  The tuple is tiny
    and is shipped in the UDF closure — the broadcast-variable analogue
    for a dictionary this size (SURVEY N1 note).

    T-ids are assigned in-kernel: ``detect_mentions`` returns spans
    sorted by (start, end, ent_type) — the exact ordering of the
    previous per-url ``row_number`` window — so enumeration yields
    identical ids with no shuffle at all (url is 1:1 with doc_id).
    """
    src = pages.select("doc_id", "url", "text")
    gaz_by_n = gazetteer_by_ngram(gazetteer) if gazetteer is not None else None

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            rows = []
            for doc_id, url, text in zip(b.column("doc_id").to_pylist(),
                                         b.column("url").to_pylist(),
                                         b.column("text").to_pylist()):
                toks = tokenize_with_offsets(text)
                for i, (ent_type, s, e, surf) in enumerate(
                        detect_mentions(text, toks, gaz_by_n)):
                    rows.append((doc_id, url, ent_type, s, e, surf,
                                 f"T{i + 1}"))
            yield _batch(rows, _MENTION_TYPES,
                         ["doc_id", "url", "ent_type", "start", "end",
                          "ent_text", "ent_id"])

    out = src.mapInArrow(gen, MENTION_DDL)
    if not with_ids:
        # id-free consumers (streaming trending counts) — same rows,
        # no T-id column; the kernel output is a pure per-page
        # function either way, so the plan stays a legal streaming map.
        return out.drop("ent_id")
    return out
