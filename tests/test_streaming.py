"""Batch/stream parity: the foreachBatch pipeline over a file-source
stream must emit exactly the batch pipeline's triples."""

from __future__ import annotations

from ehr_relation_extraction_spark.oracle.fixtures import pages_df
from ehr_relation_extraction_spark.plans.pipeline import build
from ehr_relation_extraction_spark.streaming.stream import (
    incremental_triples, windowed_event_counts)


def test_stream_matches_batch(spark, tmp_path):
    pages = pages_df(spark, n_pages=40)
    src = str(tmp_path / "pages_src")
    # write in several files so the stream sees multiple micro-batches
    pages.repartition(8).write.parquet(src)

    out = str(tmp_path / "triples_out")
    q = incremental_triples(spark, src, out, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    got = {(r["url"], r["subj"], r["pred"], r["obj"])
           for r in spark.read.parquet(out).collect()}
    want = {(r["url"], r["subj"], r["pred"], r["obj"])
            for r in build(pages).triples.collect()}
    assert got == want and len(want) > 0


def test_windowed_event_counts(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_src")
    events.repartition(4).write.parquet(src)

    out = str(tmp_path / "ev_out")
    q = windowed_event_counts(spark, src, out, str(tmp_path / "ev_ckpt"))
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    # batch oracle: same grouping over the static table
    from ehr_relation_extraction_spark.operators.events import hourly_rollup

    want = hourly_rollup(events).select("window_start", "event_type",
                                        "n", "sum_value_x100")
    g = {tuple(r) for r in got.select(*want.columns).collect()}
    w = {tuple(r) for r in want.collect()}
    # append mode emits only windows older than the watermark; all
    # emitted rows must match the batch oracle exactly
    assert g <= w and len(g) > 0
