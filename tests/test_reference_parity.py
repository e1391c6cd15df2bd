"""North-rule parity gates (BASELINE.md):

- byte-identical extracted text per url (sha256 join engine vs gold)
- mention-span micro P/R >= 0.95 vs the line-faithful quirky reference
  port (strict span+type match per Track2-evaluate-ver4.py:52-67)
- triple micro P/R >= 0.95 vs the quirky port
"""

from __future__ import annotations

import hashlib

import pytest

from ehr_relation_extraction_spark.oracle import reference_quirks as rq
from ehr_relation_extraction_spark.oracle.fixtures import make_pages, pages_df


@pytest.fixture(scope="module")
def fixture_frames(spark):
    from ehr_relation_extraction_spark.plans.pipeline import build

    return build(pages_df(spark))


def test_byte_identical_extraction(spark, fixture_frames):
    gold = {p["url"]: hashlib.sha256(p["text"].encode("utf-8")).hexdigest()
            for p in make_pages()}
    got = {r["url"]: r["sha"] for r in
           fixture_frames.pages.selectExpr("url", "sha2(text, 256) AS sha").collect()}
    assert got == gold


def _prf(gold: set, pred: set) -> tuple[float, float]:
    tp = len(gold & pred)
    p = tp / len(pred) if pred else 1.0
    r = tp / len(gold) if gold else 1.0
    return p, r


def test_mention_parity_vs_quirky_reference(fixture_frames):
    ref = set()
    for page in make_pages():
        for (t, s, e) in rq.predict_mentions(page["text"]):
            ref.add((page["url"], t, s, e))
    eng = {(r["url"], r["ent_type"], r["start"], r["end"])
           for r in fixture_frames.mentions.collect()}
    p, r = _prf(ref, eng)
    assert p >= 0.95 and r >= 0.95, f"mention parity P={p:.4f} R={r:.4f}"
    # the faithful kernel should in fact be EXACT vs the regex port
    assert eng == ref


def test_triple_parity_vs_quirky_reference(fixture_frames):
    ref = set()
    for page in make_pages():
        for (subj, pred, obj) in rq.run_pipeline(page["text"])["triples"]:
            ref.add((page["url"], subj, pred, obj))
    eng = {(r["url"], r["subj"], r["pred"], r["obj"])
           for r in fixture_frames.triples.collect()}
    p, r = _prf(ref, eng)
    assert p >= 0.95 and r >= 0.95, f"triple parity P={p:.4f} R={r:.4f}"


def test_split_branches_exercised():
    """Fixture sanity: paragraph, line and hard-cut branches all fire."""
    from ehr_relation_extraction_spark.functions.split import get_split_points
    from ehr_relation_extraction_spark.functions.text import (
        char_to_token_map, tokenize_with_offsets)

    saw_multi_shard = 0
    for page in make_pages():
        toks = tokenize_with_offsets(page["text"])
        if not toks:
            continue
        c2t = char_to_token_map(page["text"], toks)
        pts = get_split_points(page["text"], toks, c2t, 16)
        if len(pts) > 2:
            saw_multi_shard += 1
    assert saw_multi_shard > 30
