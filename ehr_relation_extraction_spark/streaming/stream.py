"""Incremental KG construction with Structured Streaming.

The reference serves one document per request (fast_api.py:29-56); the
streaming analogue is a continuous feed of crawled pages.  Two modes:

- ``incremental_triples``: file-source stream of pages ->
  ``foreachBatch`` running the SAME batch pipeline per micro-batch,
  appending to a triples sink.  Checkpointing gives exactly-once per
  batch; because every operator is a pure function of the page row,
  re-processing a batch yields identical rows (idempotent by
  construction — the batch/stream parity test asserts it).
- ``windowed_event_counts``: classic watermarked tumbling-window
  aggregate over the events stream (late data tolerated up to the
  watermark).

``mapInPandas`` stages run unchanged inside foreachBatch — one code
path for batch and stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PAGES_DDL = ("doc_id long, url string, warc_ts timestamp, "
             "html binary, lang string")


def incremental_triples(spark: SparkSession, pages_dir: str,
                        out_dir: str, checkpoint_dir: str):
    """Start an availableNow stream: pages parquet dir -> triples sink.

    Returns the StreamingQuery (caller awaits termination).
    """
    from ..plans.pipeline import build

    stream = (spark.readStream.schema(PAGES_DDL)
              .option("maxFilesPerTrigger", 4)
              .parquet(pages_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        frames = build(batch_df)
        (frames.triples
         .withColumn("batch_id", F.lit(batch_id).cast("long"))
         .write.mode("append").parquet(out_dir))

    return (stream.writeStream
            .foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def windowed_event_counts(spark: SparkSession, events_dir: str,
                          out_dir: str, checkpoint_dir: str,
                          window: str = "1 hour",
                          watermark: str = "2 hours"):
    """Watermarked tumbling-window rollup of the events stream."""
    events = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .parquet(events_dir))
    agg = (events.withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"), "event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.floor(F.sum("value") * 100).cast("long").alias("sum_value_x100"))
           .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                   "event_type", "n", "sum_value_x100"))
    return (agg.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .format("parquet").option("path", out_dir)
            .start())


DOCS_DDL = ("doc_id long, text string, lang string, source string, "
            "n_chars long")


def incremental_hll_sketch(spark: SparkSession, docs_dir: str,
                           checkpoint_dir: str,
                           query_name: str = "hll_sketch"):
    """Streaming distinct-shingle cardinality sketch: the SAME
    register/rank decomposition as ``functions.sketches``
    (md5-hex-nibble, cross-engine exact) as a streaming groupBy-max.

    This is why HLL is THE streaming cardinality structure: state is
    one row per register — <= 256 rows TOTAL however long the stream
    runs (a streaming COUNT(DISTINCT) or dropDuplicates would pin one
    state row per distinct item, unbounded on a crawl).  The shingle
    stream deliberately skips the per-doc dedup (``distinct=False``)
    — max is idempotent, so duplicates cost nothing and no extra
    state is kept.  Complete-mode memory sink named ``query_name``;
    restarting on the same checkpoint resumes the register state, so
    the sketch keeps absorbing new crawl files incrementally.

    Returns the StreamingQuery (caller awaits termination)."""
    from ..functions.sketches import hll_registers
    from ..operators.dedup import shingles

    stream = spark.readStream.schema(DOCS_DDL).parquet(docs_dir)
    sk = hll_registers(
        shingles(stream, distinct=False).select("shingle"), "shingle")
    return (sk.writeStream.outputMode("complete")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def incremental_bloom_filter(spark: SparkSession, docs_dir: str,
                             checkpoint_dir: str,
                             query_name: str = "bloom_filter"):
    """Streaming eval-set Bloom filter: the SAME salted-md5 bit
    decomposition as ``functions.sketches.bloom_words`` as a
    streaming groupBy-bit_or over the held-out split's shingles.

    The membership-side twin of the HLL/count-min streams: state is
    one row per 32-bit word — <= 2^20/32 rows TOTAL however long the
    eval corpus grows.  bit_or is idempotent, so the per-doc shingle
    dedup is skipped (``distinct=False``) and duplicate shingles cost
    nothing; restarting on the same checkpoint resumes the word state
    and absorbs only new eval files, equal to the batch filter over
    the union exactly.  At 100 TB this keeps the decontamination
    filter CURRENT as eval sets grow — recrawl a benchmark dump, the
    filter updates in place, training-side lookups keep broadcasting
    the same tiny table.  Complete-mode memory sink named
    ``query_name``.

    Returns the StreamingQuery (caller awaits termination)."""
    from ..functions.sketches import bloom_words
    from ..operators.dedup import shingles

    stream = (spark.readStream.schema(DOCS_DDL).parquet(docs_dir)
              .where(F.col("doc_id") % 17 == 0))
    sk = bloom_words(
        shingles(stream, distinct=False).select("shingle"), "shingle")
    return (sk.writeStream.outputMode("complete")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def incremental_doclen_hist(spark: SparkSession, docs_dir: str,
                            checkpoint_dir: str,
                            query_name: str = "doclen_hist"):
    """Streaming per-source doc-length histogram: the SAME exact
    integer-DIV bucket decomposition as ``functions.sketches.
    doclen_hist`` as a streaming groupBy-count — the distribution-axis
    twin of the HLL/count-min/Bloom streams.  Counts are additive, so
    the checkpoint-resumed complete-mode stream equals the batch
    histogram over the union; state is one row per (source, bucket) —
    bounded by max(n_chars)/width per source however long the crawl
    runs.  Complete-mode memory sink named ``query_name``.

    Returns the StreamingQuery (caller awaits termination)."""
    from ..functions.sketches import HIST_WIDTH

    stream = spark.readStream.schema(DOCS_DDL).parquet(docs_dir)
    sk = (stream.where(F.col("n_chars").isNotNull())
          .select("source",
                  F.expr(f"CAST(CAST(n_chars AS BIGINT) DIV {HIST_WIDTH}"
                         " AS BIGINT)").alias("bucket"))
          .groupBy("source", "bucket")
          .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    return (sk.writeStream.outputMode("complete")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def incremental_cm_sketch(spark: SparkSession, docs_dir: str,
                          checkpoint_dir: str,
                          query_name: str = "cm_sketch"):
    """Streaming token-frequency count-min sketch: the SAME salted
    md5 counter decomposition as ``functions.sketches.cm_registers``
    as a streaming groupBy-count.

    The frequency-side twin of :func:`incremental_hll_sketch`: state
    is one row per (hash row, column) — <= 1024 rows TOTAL however
    long the crawl runs, where a streaming per-token groupBy would
    pin one state row per distinct token.  Counts are additive, so
    restarting on the same checkpoint resumes the counter state and
    absorbs only new crawl files; the resumed sketch equals the batch
    sketch over the union exactly.  Complete-mode memory sink named
    ``query_name``.

    Returns the StreamingQuery (caller awaits termination)."""
    from ..functions.sketches import cm_registers

    stream = spark.readStream.schema(DOCS_DDL).parquet(docs_dir)
    toks = stream.select(F.explode(
        F.filter(F.split(F.col("text"), "[\n \t]"),
                 lambda t: t != "")).alias("tok"))
    sk = cm_registers(toks, "tok")
    return (sk.writeStream.outputMode("complete")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def incremental_trending(spark: SparkSession, pages_dir: str,
                         checkpoint_dir: str, batch_docs: int = 50,
                         query_name: str = "trending"):
    """Streaming trending-entity counts: the full mention pipeline
    (text extraction -> Arrow NER kernel -> broadcast gazetteer link)
    runs INSIDE the stream — every stage is a pure per-page function,
    so the plan is streaming-legal without foreachBatch — and the
    state is the additive (batch, canonical_id, n_mentions) count
    table, bounded by (crawl batches x entity vocabulary) however
    long the crawl runs.

    The ranking/lift half lives in ``operators.linking.
    trending_from_counts``: a pure batch post-process over the memory
    sink (read the sink with ``spark.sql(...).localCheckpoint()`` —
    the memory-sink relation shares expression ids across the
    self-joins inside the ranking step, and the checkpoint gives the
    post-process a fresh lineage), so the checkpoint-resumed stream's
    report equals the batch
    :func:`~..operators.linking.trending_entities` over the union
    exactly (counts are additive; the stream==batch test asserts it).
    Complete-mode memory sink named ``query_name``."""
    from ..operators import ner
    from ..operators.linking import gazetteer_df, link_mentions
    from ..sources.pages import extract_text

    stream = spark.readStream.schema(PAGES_DDL).parquet(pages_dir)
    pages = extract_text(stream)
    mentions = ner.detect_mentions_df(pages, with_ids=False)
    linked = link_mentions(mentions, gazetteer_df(spark))
    cnt = (linked
           .select(F.expr(f"CAST(doc_id DIV {batch_docs} AS INT)")
                   .alias("batch"), "canonical_id")
           .groupBy("batch", "canonical_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_mentions")))
    return (cnt.writeStream.outputMode("complete")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def incremental_sessions(spark: SparkSession, events_dir: str,
                         out_dir: str, checkpoint_dir: str,
                         gap: str = "30 minutes",
                         watermark: str = "2 hours"):
    """Watermarked SESSION-window aggregation of the events stream —
    the dynamic-gap counterpart of :func:`windowed_event_counts`'s
    tumbling windows: a session extends while events keep arriving
    within ``gap`` of each other and closes once the watermark passes
    the gap, so per-user state is bounded by the user's OPEN sessions
    only (Spark merges overlapping session windows in the state
    store; this is exactly the engine feature a custom
    applyInPandasWithState sessionizer would re-implement).

    Append-mode parquet sink: only WATERMARK-CLOSED sessions are
    emitted, which makes re-runs idempotent — the batch/stream parity
    test replays the same fixture and compares against the batch
    session_window aggregate (identical function, identical gap).
    Output: (user_id, session_start, session_end, n_events,
    sum_value_x100)."""
    events = (spark.readStream.schema(EVENTS_DDL).parquet(events_dir))
    agg = (events.withWatermark("ts", watermark)
           .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                F.floor(F.sum("value") * 100).cast("long")
                .alias("sum_value_x100"))
           .select("user_id",
                   F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                   .alias("session_start"),
                   F.date_format("w.end", "yyyy-MM-dd HH:mm:ss")
                   .alias("session_end"),
                   "n_events", "sum_value_x100"))
    return (agg.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .format("parquet").option("path", out_dir)
            .start())


def incremental_entity_hll(spark: SparkSession, pages_dir: str,
                           checkpoint_dir: str,
                           query_name: str = "entity_hll"):
    """Streaming per-day entity HLL sketches — the streaming twin of
    functions/sketches.rolling_hll_estimates: the full mention
    pipeline (extract -> Arrow NER kernel -> broadcast link) runs
    inside the stream, and the state is the (day, register, max rho)
    table — <= 16 rows per crawl day FOREVER, the smallest possible
    distinct-count state, and a MAX aggregate so replays are
    idempotent by algebra, not bookkeeping.

    The window estimates are a pure batch post-process
    (:func:`~..functions.sketches.rolling_from_registers`) over the
    memory sink, shared verbatim with the batch path, so the
    checkpoint-resumed stream's dashboard equals the batch
    rolling_hll_estimates over the union exactly (the stream==batch
    test asserts it).  Complete-mode memory sink ``query_name``."""
    from ..functions.sketches import hll_day_registers
    from ..operators import ner
    from ..operators.linking import gazetteer_df, link_mentions
    from ..sources.pages import extract_text

    stream = spark.readStream.schema(PAGES_DDL).parquet(pages_dir)
    pages = extract_text(stream)
    mentions = ner.detect_mentions_df(pages, with_ids=False)
    linked = link_mentions(mentions, gazetteer_df(spark))
    items = linked.select(
        ((F.lit(1704067200) + F.col("doc_id")) / 86400)
        .cast("int").alias("day_idx"), "canonical_id")
    daily = hll_day_registers(items, "day_idx", "canonical_id")
    return (daily.writeStream.outputMode("complete")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def incremental_fairness(spark: SparkSession, docs_dir: str,
                         checkpoint_dir: str,
                         query_name: str = "fairness"):
    """Streaming shard-fairness monitor: the SAME three sharding
    keys as ``functions.textstats.jain_fairness`` (host / lang /
    md5-nibble bucket) maintained as additive per-key counts — the
    skew alarm a long-running ingest keeps live, instead of
    recomputing the corpus roll-up per cycle.

    State is one row per (grouping, key) — bounded by hosts + langs
    + 16 however long the crawl runs.  Counts are additive, so the
    checkpoint-resumed complete-mode stream equals the batch counts
    over the union exactly; :func:`fairness_from_counts` folds the
    state to the same output schema as the batch operator.
    Complete-mode memory sink named ``query_name``.

    Returns the StreamingQuery (caller awaits termination)."""
    stream = spark.readStream.schema(DOCS_DDL).parquet(docs_dir)
    nib = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                              32, 1), 16, 10).cast("int")
           .cast("string"))
    keyed = (stream.select(F.lit("host").alias("grouping"),
                           F.col("source").alias("key"))
             .unionByName(stream.select(
                 F.lit("lang").alias("grouping"),
                 F.col("lang").alias("key")))
             .unionByName(stream.select(
                 F.lit("md5_bucket").alias("grouping"),
                 nib.alias("key"))))
    counts = keyed.groupBy("grouping", "key").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"))
    return (counts.writeStream.outputMode("complete")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def fairness_from_counts(counts: DataFrame) -> DataFrame:
    """Fold the streaming (grouping, key, cnt) state to
    jain_fairness's exact output schema — same integer arithmetic."""
    return (counts.groupBy("grouping").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("cnt").cast("long").alias("n_docs"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long")
        .alias("sum_sq"))
        .withColumn(
            "jain_micro6",
            F.expr("(1000000 * n_docs * n_docs)"
                   " div (n_groups * sum_sq)").cast("long")))
