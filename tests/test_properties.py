"""Property-based tests (hypothesis) for the text kernels — the
offset-fidelity invariants the whole span algebra rests on
(SURVEY §7.2 risk register)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ehr_relation_extraction_spark.functions.ner_kernel import detect_mentions
from ehr_relation_extraction_spark.functions.split import (
    get_split_points, re_char_ranges, shard_token_ranges)
from ehr_relation_extraction_spark.functions.text import (
    char_to_token_map, tokenize_with_offsets)

# text over a small alphabet incl. all separator chars and gazetteer words
WORDS = ["spark", "value", "key", "fast", "slow", "merge", "a", "zz",
         "25", "kg", ".", "*", "[x]"]
SEPS = [" ", "\n", "\t", "  ", "\n\n", " \n"]


@st.composite
def texts(draw):
    n = draw(st.integers(0, 40))
    parts = []
    for _ in range(n):
        parts.append(draw(st.sampled_from(WORDS)))
        parts.append(draw(st.sampled_from(SEPS)))
    lead = draw(st.sampled_from(["", " ", "\n"]))
    return lead + "".join(parts)


@given(texts())
@settings(max_examples=200, deadline=None)
def test_token_offsets_invariant(text):
    toks = tokenize_with_offsets(text)
    for tok, s, e in toks:
        assert text[s:e] == tok
        assert tok != ""
    # offsets strictly increasing and non-overlapping
    for (_, _, e1), (_, s2, _) in zip(toks, toks[1:]):
        assert s2 > e1 - 1 and s2 >= e1 + 1


@given(texts())
@settings(max_examples=200, deadline=None)
def test_c2t_total_and_monotonic(text):
    toks = tokenize_with_offsets(text)
    c2t = char_to_token_map(text, toks)
    assert len(c2t) == len(text)
    assert all(b >= a for a, b in zip(c2t, c2t[1:]))  # non-decreasing
    if toks:
        assert max(c2t) <= len(toks) - 1


@given(texts(), st.integers(2, 8))
@settings(max_examples=200, deadline=None)
def test_split_points_structure(text, max_len):
    toks = tokenize_with_offsets(text)
    if not toks:
        return
    c2t = char_to_token_map(text, toks)
    pts = get_split_points(text, toks, c2t, max_len)
    assert pts[0] == 0 and pts[-1] == len(toks)
    assert all(b >= a for a, b in zip(pts, pts[1:]))  # non-decreasing
    # NER shard token ranges tile [0, n)
    ranges = shard_token_ranges(pts)
    assert sum(b - a for a, b in ranges) == len(toks)
    # pairing windows are disjoint, ordered, within [0, len(text)]
    wins = re_char_ranges(pts, [e for _, _, e in toks])
    for (s1, e1), (s2, e2) in zip(wins, wins[1:]):
        assert e1 == s2
    for s, e in wins:
        assert 0 <= s <= e <= len(text)


@given(texts())
@settings(max_examples=200, deadline=None)
def test_mention_spans_valid(text):
    toks = tokenize_with_offsets(text)
    for (t, s, e, surf) in detect_mentions(text, toks):
        assert 0 <= s < e <= len(text)
        assert text[s:e] == surf
        assert any(ch.isalnum() for ch in surf)


@given(st.lists(st.text(alphabet="ab kx9", min_size=1, max_size=8),
                min_size=1, max_size=12))
@settings(max_examples=30, deadline=None)
def test_perceptron_predictions_obey_iob2_grammar(tokens):
    """Whatever the (even untrained) weights, the grammar-masked
    viterbi may never emit I-X after anything but B-X/I-X."""
    from ehr_relation_extraction_spark.functions.perceptron import (
        PerceptronTagger)

    labels = PerceptronTagger().predict(tokens)
    assert len(labels) == len(tokens)
    prev = "O"
    for lab in labels:
        if lab.startswith("I-"):
            assert prev in (f"B-{lab[2:]}", f"I-{lab[2:]}"), (prev, lab)
        prev = lab
