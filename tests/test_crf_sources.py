"""Viterbi decode (N4), wordpiece/features (T3/N5), ADE JSON source (S3)."""

from __future__ import annotations

import numpy as np
import pytest

from ehr_relation_extraction_spark.functions.crf import (
    brute_force_decode, crf_label_fn, hash_emissions,
    iob2_transition_matrix, viterbi_decode)


class TestViterbi:
    def test_matches_brute_force_random(self):
        rng = np.random.default_rng(11)
        for _ in range(25):
            t, k = int(rng.integers(1, 6)), int(rng.integers(2, 5))
            em = rng.normal(size=(t, k))
            tr = rng.normal(size=(k, k))
            st = rng.normal(size=k)
            en = rng.normal(size=k)
            assert viterbi_decode(em, tr, st, en) == \
                brute_force_decode(em, tr, st, en)

    def test_grammar_constraint(self):
        # the IOB2 transition matrix forbids I-X after O
        from ehr_relation_extraction_spark.config import IOB2_LABELS

        labels = IOB2_LABELS
        o = labels.index("O")
        i_topic = labels.index("I-Topic")
        em = np.full((2, len(labels)), -1.0)
        em[0, o] = 5.0
        em[1, i_topic] = 5.0  # tempting but forbidden after O
        path = viterbi_decode(em, iob2_transition_matrix())
        decoded = [labels[i] for i in path]
        assert decoded[0] == "O" and decoded[1] != "I-Topic"

    def test_crf_label_fn_deterministic(self):
        from ehr_relation_extraction_spark.functions.text import (
            tokenize_with_offsets)

        toks = tokenize_with_offsets("alpha beta gamma")
        a = crf_label_fn("alpha beta gamma", toks)
        b = crf_label_fn("alpha beta gamma", toks)
        assert a == b and len(a) == 3

    def test_crf_label_fn_pluggable(self, spark):
        """The viterbi label_fn slots into model_mentions_df unchanged."""
        from ehr_relation_extraction_spark.operators.model_ner import (
            model_mentions_df)
        from ehr_relation_extraction_spark.oracle.fixtures import pages_df
        from ehr_relation_extraction_spark.sources.pages import extract_text

        pages = extract_text(pages_df(spark, n_pages=10))
        out = model_mentions_df(pages, label_fn=crf_label_fn)
        rows = out.collect()  # untrained weights -> arbitrary but valid spans
        for r in rows[:20]:
            assert r["end"] > r["start"] and r["ent_type"] != "O"


class TestFeatures:
    def test_wordpiece_split_and_reexpand(self):
        from ehr_relation_extraction_spark.operators.model_ner import (
            expand_wordpiece_labels, wordpiece_split)

        pieces = wordpiece_split(["hyperbole", "ok"])
        assert pieces == ["hype", "##rbol", "##e", "ok"]
        expanded = expand_wordpiece_labels(pieces, ["B-Topic", "O"])
        assert expanded == ["B-Topic", "I-Topic", "I-Topic", "O"]

    def test_build_features_shape(self):
        from ehr_relation_extraction_spark.operators.model_ner import (
            build_features)

        f = build_features(["a", "b", "c"], max_seq_length=8)
        assert len(f["input_ids"]) == 8
        assert f["input_ids"][0] == 101 and 102 in f["input_ids"]
        assert sum(f["attention_mask"]) == 5  # CLS + 3 + SEP

    def test_build_features_truncation(self):
        from ehr_relation_extraction_spark.operators.model_ner import (
            build_features)

        f = build_features(["t%d" % i for i in range(100)], max_seq_length=16)
        assert len(f["input_ids"]) == 16
        assert f["input_ids"][-1] == 102  # SEP survives truncation
        assert sum(f["attention_mask"]) == 16


def test_ade_json_source(spark, tmp_path):
    import json

    from ehr_relation_extraction_spark.sources.ade_json import read_ade_json

    docs = [
        {"tokens": ["pain", "from", "aspirin"],
         "entities": [{"type": "Adverse-Effect", "start": 0, "end": 1},
                      {"type": "Drug", "start": 2, "end": 3}],
         "relations": [{"type": "Adverse-Effect", "head": 0, "tail": 1}]},
        {"tokens": ["mild", "rash", "with", "ibuprofen", "dose"],
         "entities": [{"type": "Adverse-Effect", "start": 0, "end": 2},
                      {"type": "Drug", "start": 3, "end": 4}],
         "relations": [{"type": "Adverse-Effect", "head": 0, "tail": 1}]},
    ]
    p = tmp_path / "ade.json"
    p.write_text("\n".join(json.dumps(d) for d in docs))
    d, e, r = read_ade_json(spark, str(p))
    assert d.count() == 2
    ents = {(x["ent_type"], x["tok_start"], x["tok_end_incl"], x["ent_text"])
            for x in e.collect()}
    # rename + end-exclusive -> inclusive-1 + token-joined text
    assert ("ADE", 0, 0, "pain") in ents
    assert ("ADE", 0, 1, "mild rash") in ents
    assert ("Drug", 2, 2, "aspirin") in ents
    rels = r.collect()
    assert all(x["rel_type"] == "Adverse-Effect" and x["head"] == 0
               and x["tail"] == 1 for x in rels)
