"""Fused single-pass path must emit EXACTLY the composed relational
path's rows (same semantics, different physical plan)."""

from __future__ import annotations

from ehr_relation_extraction_spark.oracle.fixtures import pages_df
from ehr_relation_extraction_spark.plans.fused import fused_relations, fused_triples
from ehr_relation_extraction_spark.plans.pipeline import build


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_fused_equals_composed(spark):
    pages = pages_df(spark, n_pages=60)
    composed = build(pages)
    fused = fused_relations(composed.pages)
    cols = ["url", "shard_id", "rel_id", "rel_type", "hub_id", "hub_text",
            "hub_start", "hub_end", "attr_id", "attr_type", "attr_text",
            "attr_start", "attr_end", "gap"]
    assert _rows(fused, cols) == _rows(composed.relations.select(cols), cols)


def test_fused_triples_equal(spark):
    pages = pages_df(spark, n_pages=60)
    composed = build(pages)
    cols = ["url", "subj_id", "subj", "pred", "obj"]
    assert (_rows(fused_triples(composed.pages), cols)
            == _rows(composed.triples.select(cols), cols))
