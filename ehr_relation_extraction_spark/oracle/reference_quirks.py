"""Line-faithful pure-Python port of the reference's deterministic
pipeline, INCLUDING its bugs — the parity oracle for the P/R >= 0.95
gate (BASELINE.md).

Faithful quirks (vs. the engine's documented fixes):
- DictNER regex built exactly like rule_based_ner/dict_ner.py:17-46:
  per-type alternation of ``sep + alias + sep`` where sep is the char
  class ``[\\n| |\\t]`` (note the literal '|'), run with
  ``re.finditer(..., IGNORECASE)`` — so the separators are *consumed*
  (adjacent same-type occurrences alternate) and doc-initial/final
  words never match.
- Every match is trimmed by one char on each side (dict_ner.py:106),
  including pattern-rule matches whose regex has no separator wrapper —
  corrupting those spans (the engine fixes this; mention parity on
  pattern spans is expected to fail strict match, which the 0.95
  tolerance absorbs).
- Pairing windows: get_char_split_points drop-first + dead-tail loop
  (utils_re.py:197-207, :260-303) — same as the engine (replicated).
- Relation classifier: the deterministic rule stand-in (char gap <=
  MAX_PAIR_GAP_CHARS), identical on both sides by design.
"""

from __future__ import annotations

import re

from ..config import GAZETTEER, MAX_LEN_TOKENS, MAX_PAIR_GAP_CHARS, PATTERN_RULES
from ..functions.split import get_split_points, re_char_ranges
from ..functions.text import char_to_token_map, tokenize_with_offsets

REGEX_CHARS = ['(', ')', '[', ']', '{', '}', '+', '*', '?', '$', '^', '&']


def _get_clean_re(entity_list: list[str]) -> str:
    """Port of dict_ner.py:17-46 (verbatim semantics)."""
    cleaned = []
    for ent in entity_list:
        for ch in REGEX_CHARS:
            ent = ent.replace(ch, "\\" + ch)
        cleaned.append(ent)
    entity_re = "[\n| |\t]|[\n| |\t]".join(cleaned)
    return "[\n| |\t]" + entity_re + "[\n| |\t]"


def build_type_regexes() -> dict[str, str]:
    """Port of DictNER.fit (dict_ner.py:48-80): per-type alternation
    from the gazetteer + the hard-coded pattern rule."""
    by_type: dict[str, list[str]] = {}
    for alias, ent_type, _ in GAZETTEER:
        by_type.setdefault(ent_type, [])
        if alias.lower() not in by_type[ent_type] and len(alias) > 1:
            by_type[ent_type].append(alias.lower())
    out = {t: _get_clean_re(lst) for t, lst in by_type.items()}
    for pat, ent_type in PATTERN_RULES:
        out[ent_type] = pat  # overrides, like ner_dict['Strength'] = ...
    return out


def predict_mentions(text: str) -> list[tuple[str, int, int]]:
    """Port of DictNER.predict (dict_ner.py:82-119): finditer per type,
    spans trimmed +-1 unconditionally."""
    out = []
    alnum = re.compile(r"[0-9A-Za-z]")
    for ent_type, ent_re in build_type_regexes().items():
        for m in re.finditer(ent_re, text, re.IGNORECASE):
            s, e = m.start(0) + 1, m.end(0) - 1
            # N9 post-filter (predict.py:340-349): keep alnum-bearing spans
            if e > s and alnum.search(text[s:e]):
                out.append((ent_type, s, e))
    return out


def run_pipeline(text: str,
                 max_len: int = MAX_LEN_TOKENS,
                 max_gap: int = MAX_PAIR_GAP_CHARS) -> dict:
    """Full reference-faithful per-document run: mentions -> windows ->
    hub x attr pairs -> rule classifier -> triples."""
    toks = tokenize_with_offsets(text)
    mentions = predict_mentions(text)
    if not toks:
        return {"mentions": mentions, "triples": set()}
    c2t = char_to_token_map(text, toks)
    splits = get_split_points(text, toks, c2t, max_len)
    windows = re_char_ranges(splits, [e for _, _, e in toks])

    triples: set[tuple[str, str, str]] = set()
    for (ws, we) in windows:
        in_win = [m for m in mentions if m[1] >= ws and m[2] < we]
        hubs = [m for m in in_win if m[0] == "Topic"]
        attrs = [m for m in in_win if m[0] != "Topic"]
        for h in hubs:
            for a in attrs:
                gap = max(max(h[1], a[1]) - min(h[2], a[2]), 0)
                if gap <= max_gap:
                    triples.add((text[h[1]:h[2]], a[0], text[a[1]:a[2]]))
    return {"mentions": mentions, "triples": triples}
