"""Tokenization with character offsets (reference T1 + T4).

Reference semantics:

- ``default_tokenizer`` splits on ``re.split("\\n| |\\t")`` and drops
  empty strings (generate_data.py:59-71).  Every separator is exactly one
  character, so token offsets are recoverable by a running sum.
- ``HealthRecord._compute_tokens`` (ehr.py:196-249) builds bidirectional
  char<->token maps; discarded characters *before* a token map to the
  previous token's index, trailing discarded characters map to the last
  token (ehr.py:216-218, 241-243).  We reproduce that exact behavior
  because the greedy split-point walk (ehr.py:353-432) consumes the
  char->token map per character.
"""

from __future__ import annotations

import re

SEPARATOR_RE = re.compile(r"[\n \t]")
SEPARATORS = ("\n", " ", "\t")
# A maximal run of non-separator chars is exactly a split piece that
# survives the empty-drop (provably the same token set; r06 measured
# split+running-sum faster for list building, so TOKEN_RE is exported
# only for callers that want match objects).
TOKEN_RE = re.compile(r"[^\n \t]+")


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """Split on single-char separators, keeping char offsets.

    Returns ``[(token, start, end), ...]`` with ``end`` exclusive and the
    invariant ``text[start:end] == token``.  Empty pieces (runs of
    separators) are dropped, matching generate_data.py:69-71.
    """
    out: list[tuple[str, int, int]] = []
    pos = 0
    for piece in SEPARATOR_RE.split(text):
        if piece:
            end = pos + len(piece)
            out.append((piece, pos, end))
            pos = end + 1
        else:
            pos += 1
    return out


def char_to_token_map(text: str, offsets: list[tuple[str, int, int]]) -> list[int]:
    """Per-character token index, mirroring ehr.py:196-249.

    Characters inside token ``i`` map to ``i``; separator characters map
    to the *previous* token's index (ehr.py:216-218); any leading
    separators (no previous token — the reference would crash there,
    ehr.py:217 indexes an empty list) map to 0; trailing separators map
    to the last token (ehr.py:241-243).
    """
    n = len(text)
    c2t = [0] * n
    prev = 0
    cursor = 0
    for i, (_, start, end) in enumerate(offsets):
        for j in range(cursor, start):
            c2t[j] = prev
        for j in range(start, end):
            c2t[j] = i
        prev = i
        cursor = end
    for j in range(cursor, n):
        c2t[j] = prev
    return c2t
