"""Robustness: empty corpus, unicode text, html edge cases."""

from __future__ import annotations

import datetime

from ehr_relation_extraction_spark.plans.fused import fused_triples
from ehr_relation_extraction_spark.plans.pipeline import build
from ehr_relation_extraction_spark.sources.pages import (
    HTML_PREFIX, HTML_SUFFIX, extract_text)

TS = datetime.datetime(2024, 1, 1)
DDL = "doc_id long, url string, warc_ts timestamp, html binary, lang string"


def _pages(spark, texts):
    rows = [(i, f"https://x/{i}", TS,
             (HTML_PREFIX + t + HTML_SUFFIX).encode("utf-8"), "en")
            for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, DDL)


def test_empty_corpus(spark):
    pages = _pages(spark, [])
    fr = build(pages)
    assert fr.triples.count() == 0
    assert fr.mentions.count() == 0
    assert fused_triples(fr.pages).count() == 0


def test_unicode_offsets_end_to_end(spark):
    # multibyte chars before/inside tokens: char offsets (not bytes)
    # must stay consistent through extraction, NER and pairing
    texts = [
        "héllo wörld spark Überraschung value naïve spark étude " +
        "中文 spark 中文 value x " * 8,
    ]
    fr = build(_pages(spark, texts))
    pages_row = fr.pages.select("text").first()
    assert pages_row["text"] == texts[0]  # byte-identical through html
    for m in fr.mentions.collect():
        assert texts[0][m["start"]:m["end"]] == m["ent_text"]
    # fused equals composed on unicode too
    f = {(r["url"], r["subj"], r["pred"], r["obj"])
         for r in fused_triples(fr.pages).collect()}
    c = {(r["url"], r["subj"], r["pred"], r["obj"])
         for r in fr.triples.collect()}
    assert f == c and len(c) > 0


def test_html_with_angle_noise(spark):
    # text containing stray '<' and '>' (not matching the wrapper
    # markers) must survive extraction byte-identically
    t = "a < b value > c spark value spark more words here now " * 4
    fr = build(_pages(spark, [t]))
    assert fr.pages.select("text").first()["text"] == t


def test_predict_document_matches_pipeline(spark):
    """The serving function must equal the distributed result for the
    same text (one shared code path)."""
    from ehr_relation_extraction_spark.oracle.fixtures import make_pages
    from ehr_relation_extraction_spark.predict import predict_document

    page = [p for p in make_pages(n_pages=30) if len(p["text"]) > 300][0]
    local = predict_document(page["text"])
    fr = build(_pages(spark, [page["text"]]))
    spark_triples = {(r["subj"], r["pred"], r["obj"])
                     for r in fr.triples.collect()}
    local_triples = {(t["subj"], t["pred"], t["obj"])
                     for t in local["triples"]}
    assert local_triples == spark_triples and len(local_triples) > 0
    spark_mentions = {(r["ent_type"], r["start"], r["end"])
                      for r in fr.mentions.collect()}
    local_mentions = {(m["ent_type"], m["start"], m["end"])
                      for m in local["entities"]}
    assert local_mentions == spark_mentions
    # graph adjacency covers every triple subject
    assert set(local["graph"]) == {t["subj"] for t in local["triples"]}


def test_new_operators_on_degenerate_docs(spark):
    """Every corpus-level operator added in the round-1 continuation
    must handle an empty corpus and single/empty-text docs without
    crashing (zero or well-formed rows)."""
    from ehr_relation_extraction_spark.functions.textstats import (
        bigram_lm, cooccurrence_pmi, corpus_curation, train_dev_test_split)
    from ehr_relation_extraction_spark.operators.linking import (
        fuzzy_alias_candidates)

    empty = spark.createDataFrame([], "doc_id long, text string")
    weird = spark.createDataFrame(
        [(1, ""), (2, "x"), (3, "the the the")], "doc_id long, text string")
    for docs in (empty, weird):
        assert bigram_lm(docs, min_count=1).count() >= 0
        assert cooccurrence_pmi(docs, min_docs_ab=1).count() >= 0
        assert corpus_curation(docs).count() == docs.count()
        assert train_dev_test_split(docs).count() == docs.count()

    toks_empty = spark.createDataFrame([], "token string")
    assert fuzzy_alias_candidates(toks_empty).count() == 0


def test_asof_empty_and_single_type(spark):
    from ehr_relation_extraction_spark.operators.events import (
        asof_attribution)

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string")
    assert asof_attribution(empty).count() == 0
    only_clicks = spark.createDataFrame(
        [(1, "2024-01-01 00:00:01", 7, "click")],
        "event_id long, ts string, user_id long, event_type string"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id",
                 "event_type")
    assert asof_attribution(only_clicks).count() == 0
