"""Unit tests for the pure-Python kernels, with hand-computed
expectations for every reference quirk (SURVEY §5.2 item 1)."""

from __future__ import annotations

from ehr_relation_extraction_spark.functions.ner_kernel import detect_mentions
from ehr_relation_extraction_spark.functions.split import (
    get_split_points, re_char_ranges, shard_token_ranges)
from ehr_relation_extraction_spark.functions.text import (
    char_to_token_map, tokenize_with_offsets)


def toks_c2t(text):
    t = tokenize_with_offsets(text)
    return t, char_to_token_map(text, t)


class TestTokenize:
    def test_offsets_invariant(self):
        text = "ab  cd\tef\ngh "
        toks = tokenize_with_offsets(text)
        assert [(t, text[s:e]) for t, s, e in toks] == [
            ("ab", "ab"), ("cd", "cd"), ("ef", "ef"), ("gh", "gh")]
        assert [s for _, s, _ in toks] == [0, 4, 7, 10]

    def test_empty_and_sep_only(self):
        assert tokenize_with_offsets("") == []
        assert tokenize_with_offsets(" \n\t ") == []

    def test_c2t_gap_maps_to_previous(self):
        # ehr.py:216-218: discarded chars map to previous token
        text = "ab  cd"
        toks, c2t = toks_c2t(text)
        assert c2t == [0, 0, 0, 0, 1, 1]

    def test_c2t_trailing(self):
        text = "ab cd  "
        _, c2t = toks_c2t(text)
        assert c2t == [0, 0, 0, 1, 1, 1, 1]


class TestSplitPoints:
    def test_hard_cut_no_newlines(self):
        # no '\n' anywhere -> pure hard cuts at exactly max_len
        text = " ".join(["tok"] * 40)
        toks, c2t = toks_c2t(text)
        assert get_split_points(text, toks, c2t, 16) == [0, 16, 32, 40]

    def test_exact_multiple(self):
        text = " ".join(["t"] * 32)
        toks, c2t = toks_c2t(text)
        assert get_split_points(text, toks, c2t, 16) == [0, 16, 32]

    def test_paragraph_preferred(self):
        # paragraph break ("\n\n") inside the window: split lands on the
        # token of the char before the first '\n' (ehr.py:421-422)
        words = ["w%d" % i for i in range(20)]
        text = " ".join(words[:10]) + "\n\n" + " ".join(words[10:])
        toks, c2t = toks_c2t(text)
        pts = get_split_points(text, toks, c2t, 16)
        # char before '\n\n' is inside token 9 -> paragraph split at 9
        assert pts == [0, 9, 20]

    def test_line_split_when_no_paragraph(self):
        # '\n' followed by a new_line_ind (' ') and no complete paragraph:
        # split on the line end token (ehr.py:427-430)
        text = " ".join(["a%d" % i for i in range(10)]) + "\n " + \
               " ".join(["b%d" % i for i in range(10)])
        toks, c2t = toks_c2t(text)
        pts = get_split_points(text, toks, c2t, 16)
        # '\n' char maps to token 9 (gap char -> previous token)
        assert pts == [0, 9, 20]

    def test_counter_retrips_after_backward_split(self):
        # a paragraph split can land far behind the cursor; the counter
        # must re-trip immediately (reference behavior: the walk keeps
        # appending splits as long as the window is still over-full)
        text = " ".join(["w%d" % i for i in range(3)]) + "\n\n" + \
               " ".join(["x%d" % i for i in range(30)])
        toks, c2t = toks_c2t(text)
        pts = get_split_points(text, toks, c2t, 16)
        assert pts[0] == 0 and pts[1] == 2  # paragraph split at token 2
        assert pts[-1] == 33
        # subsequent cuts are hard cuts 16 apart from the paragraph split
        assert pts[2] == 18

    def test_ner_shard_ranges(self):
        assert shard_token_ranges([0, 16, 32, 40]) == [(0, 16), (16, 32), (32, 40)]


class TestReCharRanges:
    """utils_re.py:197-207 + :260-303 quirks."""

    def test_single_shard_degenerate(self):
        # split_points [0, n]: only window is [0, end_of_token_0)
        text = "alpha beta gamma"
        toks, _ = toks_c2t(text)
        ends = [e for _, _, e in toks]
        assert re_char_ranges([0, 3], ends) == [(0, 5)]

    def test_multi_shard_drops_first_point_and_tail(self):
        # 40 tokens, splits [0,16,32,40]: pts=[E(0),E(16),E(32)] -> drop
        # first -> windows [0,E(16)), [E(16),E(32)); tail never paired
        text = " ".join(["tok"] * 40)
        toks, c2t = toks_c2t(text)
        pts = get_split_points(text, toks, c2t, 16)
        ends = [e for _, _, e in toks]
        ranges = re_char_ranges(pts, ends)
        assert ranges == [(0, ends[16]), (ends[16], ends[32])]

    def test_two_shards_single_window(self):
        text = " ".join(["tok"] * 20)
        toks, c2t = toks_c2t(text)
        pts = get_split_points(text, toks, c2t, 16)  # [0,16,20]
        ends = [e for _, _, e in toks]
        assert re_char_ranges(pts, ends) == [(0, ends[16])]

    def test_empty(self):
        assert re_char_ranges([0, 0], []) == []


class TestNerKernel:
    def run(self, text):
        return detect_mentions(text, tokenize_with_offsets(text))

    def test_boundary_excludes_doc_edges(self):
        # dict_ner.py:44-45 requires a separator on BOTH sides
        out = self.run("spark value spark")
        assert out == [("Money", 6, 11, "value")]

    def test_unigram_and_type(self):
        out = self.run("x spark y")
        assert out == [("Topic", 2, 7, "spark")]

    def test_bigram_requires_single_space(self):
        assert self.run("x fast key y") == [
            ("Event", 2, 10, "fast key"),
            ("Money", 7, 10, "key"),  # cross-type overlap allowed
        ]
        # newline separator inside the bigram -> no Event match
        assert self.run("x fast\nkey y") == [("Money", 7, 10, "key")]
        # double space -> tokens not adjacent -> no Event match
        assert [m[0] for m in self.run("x fast  key y")] == ["Money"]

    def test_adjacent_run_alternates(self):
        # reference quirk (dict_ner.py:106-107): separator consumption
        # makes adjacent same-type occurrences alternate
        out = self.run("x key key key y")
        assert [(s, e) for _, s, e, _ in out] == [(2, 5), (10, 13)]

    def test_adjacent_run_all_match_when_fixed(self):
        from ehr_relation_extraction_spark.functions.text import tokenize_with_offsets

        text = "x key key key y"
        out = detect_mentions(text, tokenize_with_offsets(text), fixed_bugs=True)
        assert [(s, e) for _, s, e, _ in out] == [(2, 5), (6, 9), (10, 13)]

    def test_double_space_breaks_island(self):
        # two separators between occurrences -> both match (scan cursor
        # has a free separator to consume)
        out = self.run("x key  key y")
        assert [(s, e) for _, s, e, _ in out] == [(2, 5), (7, 10)]

    def test_pattern_trimmed_span(self):
        # reference quirk (dict_ner.py:78,106): the +-1 trim corrupts
        # pattern spans (no separator wrapper to strip)
        out = self.run("take 25 mg now")
        assert ("Quantity", 6, 9, "5 m") in out

    def test_pattern_full_span_when_fixed(self):
        from ehr_relation_extraction_spark.functions.text import tokenize_with_offsets

        text = "take 25 mg now"
        out = detect_mentions(text, tokenize_with_offsets(text), fixed_bugs=True)
        assert ("Quantity", 5, 10, "25 mg") in out

    def test_pattern_no_boundary_requirement(self):
        # faithful mode matches anywhere, trimmed
        out = self.run("25 mg now")
        assert ("Quantity", 1, 4, "5 m") in out

    def test_case_insensitive(self):
        out = self.run("x SPARK y")
        assert out == [("Topic", 2, 7, "SPARK")]

    def test_expanded_unigram_shadows_same_type_bigram(self):
        # second linking pass: an accepted fuzzy alias ("fast", Event)
        # prefixes the base bigram ("fast key", Event).  The greedy
        # separator-consumption scan keeps the shorter span first
        # (sorted by (start, end)) and its consumed separator shadows
        # the bigram: start(2) - last_end(6) < 2.
        from ehr_relation_extraction_spark.config import GAZETTEER
        from ehr_relation_extraction_spark.functions.ner_kernel import (
            gazetteer_by_ngram)

        gaz2 = gazetteer_by_ngram(
            tuple(GAZETTEER) + (("fast", "Event", "event:fast-key"),))
        text = "x fast key y"
        out = detect_mentions(text, tokenize_with_offsets(text), gaz_by_n=gaz2)
        events = [(s, e) for t, s, e, _ in out if t == "Event"]
        assert events == [(2, 6)]
        # cross-type overlap still allowed
        assert ("Money", 7, 10, "key") in out

    def test_expanded_greedy_chain_recovers_after_gap(self):
        from ehr_relation_extraction_spark.config import GAZETTEER
        from ehr_relation_extraction_spark.functions.ner_kernel import (
            gazetteer_by_ngram)

        gaz2 = gazetteer_by_ngram(
            tuple(GAZETTEER) + (("fast", "Event", "event:fast-key"),))
        text = "x fast key fast key y"
        out = detect_mentions(text, tokenize_with_offsets(text), gaz_by_n=gaz2)
        events = [(s, e) for t, s, e, _ in out if t == "Event"]
        # both unigrams survive (gap >= 2 after the shadowed bigram);
        # both bigrams shadowed
        assert events == [(2, 6), (11, 15)]

    def test_non_alnum_filter(self):
        # predict.py:345-346 — needs an alnum char; gazetteer words all
        # have them, so craft via pattern? covered by construction; just
        # assert no crash on punctuation soup
        assert self.run("x .. -- y") == []


class TestSplitFastPath:
    """split_points_for must equal the verbatim walk on random inputs."""

    def test_equivalence_random(self):
        import random

        from ehr_relation_extraction_spark.functions.split import (
            split_points_for)

        rng = random.Random(3)
        words = ["w", "xx", "yyy", "spark", "value.", "a!", "25"]
        seps = [" ", "\n", "\t", "\n\n", " \n", "  ", ".\n"]
        for _ in range(300):
            parts = []
            for _ in range(rng.randint(0, 50)):
                parts.append(rng.choice(words))
                parts.append(rng.choice(seps))
            text = "".join(parts)
            toks, c2t = toks_c2t(text)
            if not toks:
                continue
            for ml in (4, 16):
                want = get_split_points(text, toks, c2t, ml)
                got = split_points_for(text, toks, ml)
                assert got == want, (text[:80], ml, got, want)
