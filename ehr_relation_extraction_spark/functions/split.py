"""Document sharding (reference T5/T6) — exact semantic port.

- ``get_split_points`` reproduces ``HealthRecord.get_split_points``
  (ehr.py:353-432) character walk verbatim, including its quirks:
  the paragraph-end marker uses the token of ``text[i-1]`` (which for
  ``i == 0`` wraps to the *last* character in Python — replicated), and
  a chosen paragraph split can lie behind the current position so the
  running counter re-trips immediately.
- ``re_char_ranges`` reproduces the relation-extraction pairing windows:
  ``get_char_split_points`` (biobert_re/utils_re.py:197-207) takes the
  char *end* of each split-point token for ``split_points[:-1]`` and
  drops the first element when there is more than one; the consuming
  loop (utils_re.py:257-307, :399-435) then iterates ``len(points)``
  windows ``[start, end)`` — which means (a) for single-shard documents
  the only window is ``[0, end_of_token_0)`` (no pair can satisfy the
  strict ``ent.end < end`` check, utils_re.py:283-284), and (b) the
  final ``end = len(text) + 1`` assignment happens after the last
  iteration, so text after the last split point is never paired.  Both
  quirks are replicated because they define the reference's candidate
  universe and therefore the emitted triples.
"""

from __future__ import annotations

from .text import char_to_token_map

NEW_LINE_IND = ("[", "#", "-", ">", " ")
SENT_END_IND = (".", "?", "!")


def get_split_points(text: str, tokens: list[tuple[str, int, int]],
                     c2t: list[int], max_len: int) -> list[int]:
    """Greedy token split points; port of ehr.py:353-432."""
    split_idx = [0]
    last_par_end_idx = 0
    last_line_end_idx = 0

    n = len(text)
    for i in range(n):
        curr_counter = c2t[i] - split_idx[-1]

        if curr_counter >= max_len:
            if last_par_end_idx == 0 and last_line_end_idx != 0:
                split_idx.append(last_line_end_idx)
            elif last_par_end_idx != 0:
                split_idx.append(last_par_end_idx)
            else:
                split_idx.append(c2t[i])
            last_par_end_idx = 0
            last_line_end_idx = 0

        if i < n - 2 and text[i] == "\n":
            if text[i + 1] == "\n":
                last_par_end_idx = c2t[i - 1]  # i==0 wraps, as in ehr.py:422
            if text[i + 1] == "." or text[i + 1] == "*":
                last_par_end_idx = c2t[i + 1]
            if (text[i + 1] in NEW_LINE_IND or text[i + 1].isdigit()
                    or text[i - 1] in SENT_END_IND):
                last_line_end_idx = c2t[i]

    split_idx.append(len(tokens))
    return split_idx


def split_points_for(text: str, tokens: list[tuple[str, int, int]],
                     max_len: int,
                     c2t: list[int] | None = None) -> list[int]:
    """Split points with a newline-free fast path.

    Every split trigger in the reference walk (ehr.py:403-430) is
    anchored on a '\\n' character; without one, the walk provably
    reduces to hard cuts at exactly ``max_len`` tokens — so we skip
    building the char->token map entirely (it exists only to serve the
    walk).  With newlines present, fall back to the verbatim port.
    """
    if "\n" not in text:
        pts = list(range(0, len(tokens), max_len))
        pts.append(len(tokens))
        return pts
    if c2t is None:
        c2t = char_to_token_map(text, tokens)
    return get_split_points(text, tokens, c2t, max_len)


def shard_token_ranges(split_points: list[int]) -> list[tuple[int, int]]:
    """NER shards: consecutive ``[start, end)`` token ranges
    (predict.py:207-208 slices ``tokens[p[i]:p[i+1]]``)."""
    return [(split_points[i], split_points[i + 1])
            for i in range(len(split_points) - 1)]


def re_char_ranges(split_points: list[int],
                   token_ends: list[int]) -> list[tuple[int, int]]:
    """Relation-pairing char windows; port of utils_re.py:197-207 plus the
    consuming loop's window sequence (utils_re.py:260-303).

    Returns the list of ``[start, end)`` char windows that the reference
    actually pairs within (dead tail excluded, see module docstring).
    """
    if not token_ends:
        return []
    pts = [token_ends[p] for p in split_points[:-1]]
    if len(pts) > 1:
        pts = pts[1:]
    ranges: list[tuple[int, int]] = []
    start = 0
    for i in range(len(pts)):
        ranges.append((start, pts[i]))
        start = pts[i]
    return ranges
