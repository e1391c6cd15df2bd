"""STAGED round-5 oracles vs their Spark operators — cross-engine
parity for the round-4 pytest-only ops, verified NOW so registering
them next round (registry frozen this round per the snapshot-sync
protocol) is a two-line diff with zero correctness risk.  Uses the
same compare as the driver replica."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_substring_spans_oracle(spark, con):
    from ehr_relation_extraction_spark.functions.textstats import (
        with_synth_quote)
    from ehr_relation_extraction_spark.operators.substrings import (
        substring_dups)
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    got = substring_dups(with_synth_quote(_docs(spark)),
                         min_len=20).select(
        "doc_id", "span_start", "span_end", "n_windows")
    ok, msg = compare(got, con.sql(ORACLE["substring_spans"]).df())
    assert ok, msg


def test_cut_substrings_oracle(spark, con):
    from ehr_relation_extraction_spark.functions.textstats import (
        with_synth_quote)
    from ehr_relation_extraction_spark.operators.substrings import (
        cut_substring_dups)
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    got = cut_substring_dups(with_synth_quote(_docs(spark)),
                             min_len=20).select(
        "doc_id", "text_clean", "n_cut_tokens")
    ok, msg = compare(got, con.sql(ORACLE["cut_substrings"]).df())
    assert ok, msg


def test_maximal_repeats_oracle(spark, con):
    """The suffix-array path vs pure SQL: space-joined suffix strings
    sort identically to token-sequence order on this corpus (separator
    0x20 below every token byte), so the SA-adjacent pair set and the
    integer LCPs must match row-for-row."""
    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark.operators.substrings import (
        maximal_repeats)
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    got = maximal_repeats(_docs(spark), min_len=20).select(
        "doc_a", F.col("idx_a").cast("int").alias("idx_a"),
        "doc_b", F.col("idx_b").cast("int").alias("idx_b"), "lcp")
    ok, msg = compare(got, con.sql(ORACLE["maximal_repeats"]).df())
    assert ok, msg


def test_lpa_communities_oracle(spark, con):
    from ehr_relation_extraction_spark.config import GAZETTEER  # noqa: F401
    from ehr_relation_extraction_spark.operators import linking as lk
    from ehr_relation_extraction_spark.operators.graph_algos import (
        label_propagation)
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE
    from ehr_relation_extraction_spark.plans.pipeline import (
        build_from_documents)
    from pyspark.sql import functions as F

    fr = build_from_documents(spark, SF)
    linked = lk.link_mentions(fr.mentions, lk.gazetteer_df(spark))
    edges = lk.overlap_edges(linked)
    nodes = linked.select(
        F.col("canonical_id").alias("node")).dropDuplicates()
    got = label_propagation(edges, nodes, n_rounds=5)
    ok, msg = compare(got, con.sql(ORACLE["lpa_communities"]).df())
    assert ok, msg
