"""Pluggable model-NER stage (reference N3-N8) behind the gazetteer
detector's contract: shard text -> [(ent_type, char_start, char_end)].

The reference runs three interchangeable mention detectors (SURVEY
§2.3); the neural ones reduce to: tokens -> per-token IOB2 labels ->
chunk decode -> char spans.  This module implements that whole path
with the *label sequence* as the pluggable part:

- ``iob2_labels_for_doc`` produces the gold/teacher label sequence from
  span annotations (reference ehr.py:322-351 label alignment: a token
  is B-/I- if its char span lies inside an entity span).
- ``decode_chunks`` is the IOB2 chunk decoder, a verbatim port of
  ``get_chunks`` (predict.py:140-184) INCLUDING its quirk: the final
  chunk is closed with end = len(seq) when the sequence ends inside a
  chunk — kept for parity (SURVEY N7).
- ``model_mentions_df`` wires a label function (default: the
  deterministic teacher labels, i.e. a perfect model; a torch model
  slots in by returning predicted label vectors for an Arrow batch)
  through tokens -> labels -> chunks -> char spans in one mapInPandas.

A real BiLSTM-CRF/BERT stage only replaces ``label_fn``; everything
downstream (chunk decode, span conversion, filters, ids) is shared —
the contract the reference's three models share (predict.py:301-352).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from ..config import HUB_TYPE  # noqa: F401  (documented contract type)
from ..functions.ner_kernel import detect_mentions
from ..functions.text import tokenize_with_offsets
from .ner import MENTION_SCHEMA


def iob2_labels_for_doc(text: str,
                        toks: list[tuple[str, int, int]],
                        spans: list[tuple[str, int, int]]) -> list[str]:
    """Token-aligned IOB2 labels from char spans (ehr.py:322-351
    semantics: label a token by the entity span containing it; first
    token of the span gets B-, subsequent get I-)."""
    labels = ["O"] * len(toks)
    for ent_type, s, e in sorted(spans, key=lambda x: (x[1], x[2])):
        first = True
        for i, (_, ts, te) in enumerate(toks):
            if ts >= s and te <= e:
                labels[i] = ("B-" if first else "I-") + ent_type
                first = False
    return labels


def decode_chunks(seq: list[str]) -> list[tuple[str, int, int]]:
    """IOB2 chunk decode — port of get_chunks (predict.py:140-184).

    Quirk kept for parity: when the sequence ends inside a chunk the
    reference closes it with ``end = len(seq)`` (predict.py:180-182),
    so token ranges here are [start, end) with end possibly len(seq).
    New chunk starts on B- or on a type change inside I- tags.
    """
    chunks: list[tuple[str, int, int]] = []
    chunk_type, chunk_start = None, None
    for i, tok in enumerate(seq):
        if tok == "O":
            if chunk_type is not None:
                chunks.append((chunk_type, chunk_start, i))
                chunk_type, chunk_start = None, None
            continue
        tag, _, ttype = tok.partition("-")
        if chunk_type is None:
            chunk_type, chunk_start = ttype, i
        elif ttype != chunk_type or tag == "B":
            chunks.append((chunk_type, chunk_start, i))
            chunk_type, chunk_start = ttype, i
    if chunk_type is not None:
        chunks.append((chunk_type, chunk_start, len(seq)))
    return chunks


def chunks_to_char_spans(toks: list[tuple[str, int, int]],
                         chunks: list[tuple[str, int, int]]
                         ) -> list[tuple[str, int, int]]:
    """token ranges -> char spans via the carried offsets
    (predict.py:254-259; element_at equivalent)."""
    out = []
    for (t, ts, te) in chunks:
        if ts >= len(toks):
            continue
        end_idx = min(te, len(toks)) - 1
        out.append((t, toks[ts][1], toks[end_idx][2]))
    return out


def expand_wordpiece_labels(tokens: list[str],
                            pred_labels: list[str]) -> list[str]:
    """N6 (predict.py:242-252): re-expand flat predictions onto the
    original token sequence when a wordpiece tokenizer split words —
    ``##`` pieces inherit ``I-<type>`` of the previous non-O label.

    ``tokens`` is the wordpiece sequence, ``pred_labels`` the labels of
    the NON-## tokens in order; returns one label per wordpiece.
    """
    out: list[str] = []
    it = iter(pred_labels)
    for tok in tokens:
        if tok.startswith("##") and out:
            prev = out[-1]
            if prev == "O":
                out.append("O")
            else:
                out.append("I-" + prev.partition("-")[2])
        else:
            out.append(next(it))
    return out


def teacher_labels(text: str,
                   toks: list[tuple[str, int, int]]) -> list[str]:
    """Default label_fn: IOB2 labels derived from the deterministic
    gazetteer detector — a 'perfect model' stand-in, so the model path
    is testable end-to-end without torch."""
    spans = [(t, s, e) for (t, s, e, _) in detect_mentions(text, toks)]
    return iob2_labels_for_doc(text, toks, spans)


def wordpiece_split(tokens: list[str], max_piece: int = 4) -> list[str]:
    """Deterministic wordpiece-ish splitter (T3 stand-in for the HF
    tokenizer, generate_data.py:157-173): tokens longer than
    ``max_piece`` chars split into fixed-size pieces, continuation
    pieces prefixed ``##`` — enough structure to exercise N6
    re-expansion and the feature builder without model downloads."""
    out: list[str] = []
    for tok in tokens:
        if len(tok) <= max_piece:
            out.append(tok)
        else:
            out.append(tok[:max_piece])
            for i in range(max_piece, len(tok), max_piece):
                out.append("##" + tok[i:i + max_piece])
    return out


def build_features(tokens: list[str], max_seq_length: int,
                   vocab_hash_buckets: int = 30522,
                   cls_id: int = 101, sep_id: int = 102,
                   pad_id: int = 0) -> dict[str, list[int]]:
    """N5/R7 feature builder (convert_examples_to_features,
    biobert_ner/utils_ner.py:165-291): [CLS] tok_ids [SEP], truncate to
    max_seq_length (utils_ner.py:209-212), pad to fixed length with an
    attention mask.  Token ids come from a stable hash (no vocab file
    ships here); a real tokenizer's ids drop in without changing the
    fixed-length contract."""
    import hashlib as _h

    ids = [cls_id]
    for tok in tokens:
        hv = int(_h.md5(tok.encode()).hexdigest()[:8], 16)
        ids.append(1000 + hv % (vocab_hash_buckets - 1000))
    ids = ids[:max_seq_length - 1] + [sep_id]
    mask = [1] * len(ids)
    pad = max_seq_length - len(ids)
    ids += [pad_id] * pad
    mask += [0] * pad
    assert len(ids) == max_seq_length and len(mask) == max_seq_length
    return {"input_ids": ids, "attention_mask": mask,
            "token_type_ids": [0] * max_seq_length}


IOB2_SCHEMA = ("doc_id long, url string, tok_idx int, token string, "
               "label string")


def iob2_labels_df(pages: DataFrame) -> DataFrame:
    """pages -> (doc_id, url, tok_idx, token, label) teacher IOB2 rows
    (the S6/CoNLL generation path, biobert_ner/utils_ner.py:305-373,
    driven by the gazetteer mentions)."""
    src = pages.select("doc_id", "url", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, url, text in zip(pdf["doc_id"], pdf["url"], pdf["text"]):
                toks = tokenize_with_offsets(text)
                if not toks:
                    continue
                labels = teacher_labels(text, toks)
                rows.extend((doc_id, url, i, toks[i][0], labels[i])
                            for i in range(len(toks)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "url", "tok_idx", "token", "label"])

    return src.mapInPandas(gen, IOB2_SCHEMA)


LabelFn = Callable[[str, list[tuple[str, int, int]]], list[str]]


ChunkFn = Callable[[str, list[tuple[str, int, int]]],
                   list[tuple[str, int, int]]]


def model_mentions_df(pages: DataFrame,
                      label_fn: LabelFn = teacher_labels,
                      chunk_fn: "ChunkFn | None" = None,
                      include_pattern_rules: bool = False) -> DataFrame:
    """pages -> mentions via the tokens->labels->chunks->spans path.

    Batched through Arrow; a torch model's forward pass replaces
    ``label_fn`` (loaded once per worker, applied per batch) without
    touching this plumbing.

    ``chunk_fn`` (text, toks) -> token-range chunks bypasses the
    single-label-sequence contract for models that can emit
    overlapping cross-type chunks (e.g. the per-type multi-channel
    perceptron) — one IOB2 sequence cannot encode those.

    ``include_pattern_rules`` additionally unions in the deterministic
    pattern-rule mentions (``ner_kernel.pattern_spans``) with their
    exact CHAR spans.  Those spans are routinely mid-token (the
    reference's one-char-trim quirk turns '30 km' into '0 k'), so no
    token-aligned model can learn them — the production detector runs
    regex + model side by side, exactly like the reference's strength
    regex next to its dictionary/neural NER (rule_based_ner/
    dict_ner.py:78).
    """
    from ..functions.ner_kernel import ALNUM_RE, pattern_spans

    src = pages.select("doc_id", "url", "text")
    if chunk_fn is None:
        def chunk_fn(text, toks):  # noqa: F811 — default composition
            return decode_chunks(label_fn(text, toks))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, url, text in zip(pdf["doc_id"], pdf["url"], pdf["text"]):
                toks = tokenize_with_offsets(text)
                if not toks:
                    continue
                spans = set(chunks_to_char_spans(toks, chunk_fn(text, toks)))
                if include_pattern_rules:
                    spans |= {(t, s, e)
                              for (t, s, e) in pattern_spans(text)
                              if ALNUM_RE.search(text[s:e])}
                for (t, s, e) in sorted(spans):
                    rows.append((doc_id, url, t, s, e, text[s:e]))
            yield pd.DataFrame(rows, columns=[f.name for f in MENTION_SCHEMA.fields])

    raw = src.mapInPandas(gen, MENTION_SCHEMA)
    w = Window.partitionBy("url").orderBy("start", "end", "ent_type")
    return raw.withColumn(
        "ent_id", F.concat(F.lit("T"), F.row_number().over(w).cast("string")))
