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


def test_incremental_hll_sketch(spark, tmp_path):
    """Streaming sketch == batch sketch after each incremental feed:
    first over the initial crawl files, then — restarting on the same
    checkpoint — over the union once late files land.  State is the
    register table itself (bounded at 256 rows)."""
    from ehr_relation_extraction_spark.functions.sketches import (
        hll_shingle_sketch)
    from ehr_relation_extraction_spark.streaming.stream import (
        incremental_hll_sketch)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "hll_ckpt")
    a.repartition(4).write.mode("append").parquet(src)

    q = incremental_hll_sketch(spark, src, ckpt, query_name="hll_t1")
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.sql(
        "SELECT register, max_rho FROM hll_t1").collect()))
    assert got == sorted(map(tuple, hll_shingle_sketch(a).collect()))

    # a later crawl batch lands; restart on the same checkpoint —
    # the register state resumes and absorbs only the new files
    b.repartition(3).write.mode("append").parquet(src)
    q2 = incremental_hll_sketch(spark, src, ckpt, query_name="hll_t2")
    q2.awaitTermination(300)
    got2 = sorted(map(tuple, spark.sql(
        "SELECT register, max_rho FROM hll_t2").collect()))
    assert got2 == sorted(map(tuple, hll_shingle_sketch(docs).collect()))


def test_incremental_cm_sketch(spark, tmp_path):
    """Streaming count-min sketch == batch sketch after each
    incremental feed: counts are additive, so the checkpoint-resumed
    stream over crawl files a then a+b equals the batch sketch over
    the union.  State is the counter table itself (<= 1024 rows)."""
    from ehr_relation_extraction_spark.functions.sketches import (
        cm_token_sketch)
    from ehr_relation_extraction_spark.streaming.stream import (
        incremental_cm_sketch)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "cm_ckpt")
    a.repartition(4).write.mode("append").parquet(src)

    q = incremental_cm_sketch(spark, src, ckpt, query_name="cm_t1")
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.sql(
        "SELECT cm_row, cm_col, cnt FROM cm_t1").collect()))
    assert got == sorted(map(tuple, cm_token_sketch(a).collect()))

    b.repartition(3).write.mode("append").parquet(src)
    q2 = incremental_cm_sketch(spark, src, ckpt, query_name="cm_t2")
    q2.awaitTermination(300)
    got2 = sorted(map(tuple, spark.sql(
        "SELECT cm_row, cm_col, cnt FROM cm_t2").collect()))
    assert got2 == sorted(map(tuple, cm_token_sketch(docs).collect()))


def test_incremental_bloom_filter(spark, tmp_path):
    """Streaming Bloom filter == batch eval-set filter after each
    incremental feed: bit_or is idempotent/associative, so the
    checkpoint-resumed stream over eval files a then a+b equals the
    batch filter over the union.  State is the word table itself
    (<= 2^20/32 rows)."""
    from ehr_relation_extraction_spark.functions.sketches import (
        bloom_eval_sketch)
    from ehr_relation_extraction_spark.streaming.stream import (
        incremental_bloom_filter)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "bloom_ckpt")
    a.repartition(4).write.mode("append").parquet(src)

    q = incremental_bloom_filter(spark, src, ckpt, query_name="bloom_t1")
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.sql(
        "SELECT word, bits FROM bloom_t1").collect()))
    assert got == sorted(map(tuple, bloom_eval_sketch(a).collect()))

    b.repartition(3).write.mode("append").parquet(src)
    q2 = incremental_bloom_filter(spark, src, ckpt, query_name="bloom_t2")
    q2.awaitTermination(300)
    got2 = sorted(map(tuple, spark.sql(
        "SELECT word, bits FROM bloom_t2").collect()))
    assert got2 == sorted(map(tuple, bloom_eval_sketch(docs).collect()))


def test_incremental_doclen_hist(spark, tmp_path):
    """Streaming histogram == batch histogram after each incremental
    feed (counts additive; checkpoint-resumed).  State is the
    (source, bucket) table itself."""
    from ehr_relation_extraction_spark.functions.sketches import (
        doclen_hist)
    from ehr_relation_extraction_spark.streaming.stream import (
        incremental_doclen_hist)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "hist_ckpt")
    a.repartition(4).write.mode("append").parquet(src)

    q = incremental_doclen_hist(spark, src, ckpt, query_name="hist_t1")
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.sql(
        "SELECT source, bucket, cnt FROM hist_t1").collect()))
    assert got == sorted(map(tuple, doclen_hist(a).collect()))

    b.repartition(3).write.mode("append").parquet(src)
    q2 = incremental_doclen_hist(spark, src, ckpt, query_name="hist_t2")
    q2.awaitTermination(300)
    got2 = sorted(map(tuple, spark.sql(
        "SELECT source, bucket, cnt FROM hist_t2").collect()))
    assert got2 == sorted(map(tuple, doclen_hist(docs).collect()))


def test_incremental_trending(spark, tmp_path):
    """Streaming trending counts == batch counts after each
    incremental feed (the full NER+link pipeline runs in-stream;
    counts additive; checkpoint-resumed), and trending_from_counts
    over the stream state equals the batch trending_entities report."""
    from ehr_relation_extraction_spark.operators.linking import (
        gazetteer_df, link_mentions, trending_entities,
        trending_from_counts)
    from ehr_relation_extraction_spark.operators import ner
    from ehr_relation_extraction_spark.sources.pages import (
        extract_text, pages_from_documents)
    from ehr_relation_extraction_spark.streaming.stream import (
        incremental_trending)

    raw = pages_from_documents(spark, "/root/testdata/sf0.001")
    a = raw.where("doc_id % 2 = 0")
    b = raw.where("doc_id % 2 = 1")
    src = str(tmp_path / "pages_src")
    ckpt = str(tmp_path / "trend_ckpt")
    a.repartition(4).write.mode("append").parquet(src)

    def batch_trending(pages_raw):
        linked = link_mentions(
            ner.detect_mentions_df(extract_text(pages_raw)),
            gazetteer_df(spark))
        return trending_entities(linked)

    q = incremental_trending(spark, src, ckpt, query_name="trend_t1")
    q.awaitTermination(300)
    got = sorted(map(tuple, trending_from_counts(
        spark.sql("SELECT * FROM trend_t1").localCheckpoint()).collect()))
    assert got == sorted(map(tuple, batch_trending(a).collect()))
    assert got

    b.repartition(3).write.mode("append").parquet(src)
    q2 = incremental_trending(spark, src, ckpt, query_name="trend_t2")
    q2.awaitTermination(300)
    got2 = sorted(map(tuple, trending_from_counts(
        spark.sql("SELECT * FROM trend_t2").localCheckpoint()).collect()))
    assert got2 == sorted(map(tuple, batch_trending(raw).collect()))
    assert got2


def test_incremental_sessions(spark, tmp_path):
    """Streaming session windows: append mode emits exactly the
    WATERMARK-CLOSED sessions (session_end <= max(ts) - watermark);
    advancing the watermark with a later event on the SAME checkpoint
    flushes the remainder, and the union equals the batch
    session_window aggregate — the closure semantics, tested rather
    than assumed."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark.streaming.stream import (
        incremental_sessions)

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_src")
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "sess_ckpt")
    events.repartition(4).write.mode("append").parquet(src)

    def batch_sessions(ev):
        return (ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.floor(F.sum("value") * 100).cast("long")
                 .alias("sum_value_x100"))
            .select("user_id",
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"),
                    F.date_format("w.end", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_end"),
                    "n_events", "sum_value_x100"))

    q = incremental_sessions(spark, src, out, ckpt)
    q.awaitTermination(300)

    max_ts = events.agg(F.max("ts")).first()[0]
    wm = max_ts - dt.timedelta(hours=2)
    all_sessions = batch_sessions(events).collect()
    closed = sorted(tuple(r) for r in all_sessions
                    if dt.datetime.strptime(
                        r.session_end, "%Y-%m-%d %H:%M:%S") <= wm)
    got1 = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got1 == closed and got1

    # a later sentinel event advances the watermark past every
    # original session; resume on the same checkpoint flushes them
    sentinel = spark.createDataFrame(
        [(10**9, max_ts + dt.timedelta(days=2), 10**6, "sentinel",
          0.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string")
    sentinel.write.mode("append").parquet(src)
    q2 = incremental_sessions(spark, src, out, ckpt)
    q2.awaitTermination(300)
    got2 = sorted(t for t in map(tuple,
                                 spark.read.parquet(out).collect())
                  if t[0] != 10**6)
    assert got2 == sorted(map(tuple, all_sessions))
