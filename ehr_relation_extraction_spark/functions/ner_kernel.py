"""Gazetteer + pattern mention detection kernel (reference N1/N2/N9).

Semantics (documented deviations from rule_based_ner/dict_ner.py):

- A dictionary mention is an occurrence of an alias (case-insensitive,
  dict_ner.py:107 ``re.IGNORECASE``) whose immediately preceding and
  following characters are separator chars.  Because tokens are maximal
  non-separator runs, this is exactly: the alias aligns to a token
  n-gram whose char span satisfies ``start > 0 AND end < len(text)``
  (the reference's regex requires a literal separator on both sides,
  dict_ner.py:44-45, so document-initial/final words never match — we
  keep that behavior for parity).
- DEVIATION 1 (fixed bug): the reference's regex *consumes* the
  surrounding separators, so in a run of adjacent same-type aliases
  ``re.finditer`` only matches alternate occurrences.  We match every
  boundary-valid occurrence.  (dict_ner.py:106-107)
- DEVIATION 2 (fixed bug): the reference trims one char from both ends
  of *every* match (dict_ner.py:106 ``m.start()+1, m.end()-1``) — which
  is correct for dictionary matches (strips the consumed separators)
  but also fires on the pattern rule whose regex has no separator
  wrapper (dict_ner.py:78), corrupting those spans.  Our pattern
  mentions get their true span, boundary-checked the same way.
- Within one type, aliases never overlap (config.GAZETTEER invariant),
  mirroring per-type non-overlapping ``finditer``.
- Post-filter: drop spans with no alphanumeric char (predict.py:345-346).

The quirk-faithful behavior (alternation + trim) lives in
``oracle.reference_quirks`` and is used only to measure P/R parity.
"""

from __future__ import annotations

import re

from ..config import GAZETTEER, PATTERN_RULES

ALNUM_RE = re.compile(r"[0-9A-Za-z]")


def gazetteer_by_ngram(gazetteer=GAZETTEER) -> dict[int, dict[str, tuple[str, str]]]:
    """alias-token-count -> {alias_lower: (ent_type, canonical_id)}."""
    out: dict[int, dict[str, tuple[str, str]]] = {}
    for alias, ent_type, canonical in gazetteer:
        n = len(alias.split(" "))
        out.setdefault(n, {})[alias.lower()] = (ent_type, canonical)
    return out


_GAZ_BY_N = gazetteer_by_ngram()
_PATTERNS = [(re.compile(pat, re.IGNORECASE), ent_type)
             for pat, ent_type in PATTERN_RULES]


def detect_mentions(text: str,
                    offsets: list[tuple[str, int, int]],
                    gaz_by_n: dict | None = None,
                    ) -> list[tuple[str, int, int, str]]:
    """Return mentions ``[(ent_type, start, end, ent_text), ...]``
    sorted by (start, end, ent_type)."""
    n_text = len(text)
    found: set[tuple[str, int, int]] = set()

    # dictionary aliases via token n-gram alignment
    for n, aliases in (gaz_by_n or _GAZ_BY_N).items():
        for i in range(len(offsets) - n + 1):
            start = offsets[i][1]
            end = offsets[i + n - 1][2]
            if start == 0 or end >= n_text:
                continue  # reference requires a separator on both sides
            surface = text[start:end].lower()
            hit = aliases.get(surface)
            if hit is not None:
                found.add((hit[0], start, end))

    # pattern rules (full span, same boundary requirement)
    for rx, ent_type in _PATTERNS:
        for m in rx.finditer(text):
            s, e = m.start(), m.end()
            if s == 0 or e >= n_text:
                continue
            if text[s - 1] not in "\n \t" or text[e] not in "\n \t":
                continue
            found.add((ent_type, s, e))

    out = [(t, s, e, text[s:e]) for (t, s, e) in found
           if ALNUM_RE.search(text[s:e])]
    out.sort(key=lambda r: (r[1], r[2], r[0]))
    return out
