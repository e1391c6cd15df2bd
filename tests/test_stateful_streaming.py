"""applyInPandasWithState cross-batch dedup: duplicated pages across
micro-batches must yield each triple exactly once."""

from __future__ import annotations

from ehr_relation_extraction_spark.oracle.fixtures import pages_df
from ehr_relation_extraction_spark.plans.fused import fused_triples
from ehr_relation_extraction_spark.sources.pages import extract_text
from ehr_relation_extraction_spark.streaming.stateful import (
    incremental_unique_triples)


def test_stateful_dedup_across_batches(spark, tmp_path):
    pages = pages_df(spark, n_pages=30)
    src = str(tmp_path / "pages_src")
    # the same pages written TWICE as separate files -> duplicates
    # arrive in different micro-batches (maxFilesPerTrigger=2)
    pages.repartition(4).write.mode("append").parquet(src)
    pages.repartition(4).write.mode("append").parquet(src)

    out = str(tmp_path / "uniq")
    q = incremental_unique_triples(spark, src, out, str(tmp_path / "ck"))
    q.awaitTermination(300)

    got = [(r["url"], r["subj"], r["pred"], r["obj"])
           for r in spark.read.parquet(out).collect()]
    want = {(r["url"], r["subj"], r["pred"], r["obj"])
            for r in fused_triples(extract_text(pages)).collect()}
    assert len(got) == len(set(got)), "stateful dedup emitted duplicates"
    assert set(got) == want and len(want) > 0
