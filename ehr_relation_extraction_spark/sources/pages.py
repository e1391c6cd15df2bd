"""The ``pages`` input table (url, warc_ts, html, text, lang).

This is the engine's authoritative input shape (BASELINE.json
input_hint).  Two constructors:

- ``read_pages(spark, path)`` — read a parquet/Iceberg pages table as-is.
- ``pages_from_documents(spark, sf_dir)`` — adapt the driver's synthetic
  ``documents`` table (doc_id, text, lang, source, n_chars) into pages,
  per FIXTURES.md §1: ``url = https://{source}.example.com/{doc_id}``,
  deterministic ``warc_ts``, and ``html`` generated as a byte-exact
  invertible wrapper around ``text`` so the extraction invariant
  (byte-identical text per url) is checkable end-to-end.

``extract_text`` is the first pipeline stage (reference analogue: the
raw-text entry of fast_api.py:29-56): a pure function of the ``html``
bytes, computed entirely JVM-side (decode + substring) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

HTML_PREFIX = "<html><head><meta charset=\"utf-8\"></head><body>"
HTML_SUFFIX = "</body></html>"


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's documents.parquet into the pages shape.

    Column pruning note: downstream stages select only what they need;
    keeping this a lazy projection lets Catalyst prune at the scan.

    Partitioning note: the synthetic corpus ships as ONE parquet file,
    which would pin every downstream Arrow stage to a single Python
    worker.  When the scan has fewer splits than the cluster has slots,
    hash-repartition on url (salted_repartition) so map work spreads —
    the small-file analogue of the host-skew defeat (SURVEY §4.2.1).
    At real scale the input has thousands of splits and this is a no-op.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    slots = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < slots:
        from ..operators.skew import salted_repartition

        # one map task per slot (not 2x): every Python-boundary task
        # pays a fixed worker-dispatch cost that is serialized through
        # the daemon (~5-7 ms/task measured), so at equal balance fewer,
        # larger Arrow tasks win; at real scale this branch is a no-op
        # (the input has more splits than slots).
        docs = salted_repartition(docs, "doc_id", num_partitions=slots)
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/"), F.col("doc_id").cast("string"))
    warc_ts = F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id"))
    html = F.encode(
        F.concat(F.lit(HTML_PREFIX), F.col("text"), F.lit(HTML_SUFFIX)),
        "utf-8",
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.col("text").alias("gold_text"),  # kept only for fidelity tests
        F.col("lang").alias("lang"),
    )


def extract_text(pages: DataFrame, keep_gold: bool = False) -> DataFrame:
    """Byte-identical text extraction from ``html`` (north-rule invariant).

    Deterministic pure function of the html bytes: utf-8 decode, then
    take the content between the first ``<body>`` and the last
    ``</body>``.  JVM-side string ops only (whole-stage codegen), no UDF.
    """
    decoded = F.decode(F.col("html"), "utf-8")
    body = F.substring_index(
        F.substring_index(decoded, HTML_SUFFIX, 1), HTML_PREFIX, -1
    )
    cols = [c for c in pages.columns if c not in ("html", "gold_text")]
    out = pages.select(*cols, body.alias("text"),
                       *(["gold_text"] if keep_gold and "gold_text" in pages.columns else []))
    return out
