"""spark-submit maintenance job for the production triple store:
build the composite days(warc_ts) x bucket(url) layout from pipeline
triples, apply re-crawl deltas as a partition-scoped MERGE, and
compact small files — the parquet stand-in for an Iceberg table's
write + RewriteFiles lifecycle (SURVEY §7.0).

Usage:
    make package
    spark-submit --py-files dist/ehr_relation_extraction_spark.zip \
        scripts/maintain_store.py \
        --from-documents /root/testdata/sf0.001 --store /tmp/kg_store \
        [--n-buckets 8] [--demo-deltas]

Steps (each emits a lineage line in the summary):
1. build    fused triples -> with_day_idx + with_url_bucket ->
            write_composite_partitioned (skipped if the store exists).
2. merge    apply deltas via merge_composite — only the touched
            (day, bucket) cells are rewritten.  --demo-deltas
            synthesizes a deterministic delta batch (retract one
            existing triple per bucket, add one new) so the smoke run
            exercises the path without a crawl.
3. compact  compact_partitions bounds files per cell (partition scheme preserved).
4. audit    read back through the pruned point-lookup path
            (read_url_days) for one url and report the row count.

``--manifest`` runs the same lifecycle on the MANIFEST store
(generation directories + atomic pointer swap, plans/partitioned.py
store_* — untouched cells hardlinked, commits have no crash window).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-documents", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--n-buckets", type=int, default=8)
    ap.add_argument("--demo-deltas", action="store_true")
    ap.add_argument("--manifest", action="store_true",
                    help="use the atomic manifest store (generation "
                         "dirs + pointer swap) instead of in-place")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark.session import get_spark
    from ehr_relation_extraction_spark.plans.fused import fused_triples
    from ehr_relation_extraction_spark.plans.partitioned import (
        compact_partitions, merge_composite, read_url_days, store_compact,
        store_init, store_merge, store_read, store_resolve, with_day_idx,
        with_url_bucket, write_composite_partitioned)
    from ehr_relation_extraction_spark.sources.pages import (
        extract_text, pages_from_documents)

    spark = get_spark(app_name="maintain-store")
    summary: dict = {"store": args.store, "events": [],
                     "mode": "manifest" if args.manifest else "in-place"}

    if args.manifest:
        store_exists = os.path.exists(
            os.path.join(args.store, "_MANIFEST.json"))
    else:
        store_exists = os.path.exists(
            os.path.join(args.store, "_SUCCESS")) or (
            os.path.isdir(args.store) and any(
                e.startswith("day_idx=") for e in os.listdir(args.store)))
    if not store_exists:
        pages = extract_text(pages_from_documents(spark, args.from_documents))
        triples = fused_triples(pages).join(
            pages.select("url", "warc_ts"), "url")
        # the store's row identity IS the merge key — dedupe at build
        # (triples are distinct per subj_id, which the store drops)
        composite = with_url_bucket(with_day_idx(triples), args.n_buckets) \
            .select("url", "subj", "pred", "obj", "day_idx", "url_bucket") \
            .dropDuplicates(["url", "subj", "pred", "obj", "day_idx"])
        if args.manifest:
            store_init(composite, args.store, args.n_buckets)
        else:
            write_composite_partitioned(composite, args.store,
                                        args.n_buckets)
        summary["events"].append({"stage": "build", "action": "ran",
                                  "rows": composite.count()})
    else:
        summary["events"].append({"stage": "build", "action": "skipped"})

    if args.demo_deltas:
        from pyspark.sql import Window

        cur = (store_read(spark, args.store) if args.manifest
               else spark.read.parquet(args.store))
        # retract the first triple of every bucket + add one new row
        victims = (cur.withColumn(
            "_rn", F.row_number().over(
                Window.partitionBy("url_bucket")
                .orderBy("url", "subj", "pred", "obj")))
            .where(F.col("_rn") == 1)
            .select("url", "subj", "pred", "obj", "day_idx")
            .withColumn("op", F.lit("-"))
            .withColumn("crawl_seq", F.lit(2)))
        deltas = victims.select("url", "subj", "pred", "obj", "op",
                                "crawl_seq", "day_idx").unionByName(
            spark.createDataFrame(
                [("https://new.ex/0", "NEW", "pred", "VAL", "+", 2,
                  int(cur.agg(F.min("day_idx")).first()[0]))],
                "url string, subj string, pred string, obj string, "
                "op string, crawl_seq int, day_idx int"))
        touched = (store_merge(spark, args.store, deltas, args.n_buckets)
                   if args.manifest else
                   merge_composite(spark, args.store, deltas,
                                   args.n_buckets))
        summary["events"].append({"stage": "merge", "action": "ran",
                                  "touched_cells": len(touched)})

    if args.manifest:
        store_compact(spark, args.store, target_files_per_cell=2)
    else:
        compact_partitions(spark, args.store, target_files_per_cell=2)
    summary["events"].append({"stage": "compact", "action": "ran"})

    data_dir = store_resolve(args.store) if args.manifest else args.store
    probe = spark.read.parquet(data_dir).select("url").first()["url"]
    days = [r["day_idx"] for r in spark.read.parquet(data_dir)
            .select("day_idx").distinct().collect()]
    hit = read_url_days(spark, data_dir, probe, min(days), max(days),
                        n_buckets=args.n_buckets)
    summary["events"].append({"stage": "audit", "action": "ran",
                              "probe_url_rows": hit.count()})
    summary["total_rows"] = spark.read.parquet(data_dir).count()
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
