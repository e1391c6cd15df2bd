"""spark-submit entry point for the LEARNED model stage: distributed
multi-channel perceptron training -> saved weight artifact -> cascade
inference -> held-out eval vs the rule pipeline.

This packages the learned cascade for cluster use (the north star's
spark-submit --py-files contract): until now it lived only in tests.

Usage (cluster):
    make package
    spark-submit --py-files dist/ehr_relation_extraction_spark.zip \
        scripts/train_cascade.py \
        --documents /root/testdata/sf0.001 --out /tmp/cascade_run \
        [--train-frac-pct 75] [--epochs 5] [--rounds 3]

Stages (each emits a lineage line in the summary):
1. train    train_distributed (iterative parameter mixing; the driver
            sees only sparse weight rows) on the train split of the
            page fixture built from the documents table.
2. save     save_multichannel -> <out>/model.npz (sparse emissions +
            transitions; the artifact an inference job ships).
3. infer    load_multichannel -> build_cascade(chunk_fn) on the
            HELD-OUT split -> <out>/triples.parquet.
4. eval     prf_triples vs the rule pipeline's triples on the same
            held-out docs (the reference-parity metric; the rule
            pipeline IS the reference-semantics oracle).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True,
                    help="testdata dir holding documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--train-frac-pct", type=int, default=75)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark.config import GAZETTEER
    from ehr_relation_extraction_spark.functions.perceptron import (
        load_multichannel, save_multichannel, train_distributed)
    from ehr_relation_extraction_spark.operators.evaluate import prf_triples
    from ehr_relation_extraction_spark.plans.pipeline import (
        build, build_cascade)
    from ehr_relation_extraction_spark.session import get_spark
    from ehr_relation_extraction_spark.sources.pages import (
        extract_text, pages_from_documents)

    spark = get_spark(app_name="train-cascade")
    os.makedirs(args.out, exist_ok=True)
    summary: dict = {"out": args.out, "events": []}

    pages_raw = pages_from_documents(spark, args.documents)
    n_docs = pages_raw.count()
    # Hash split, not a doc_id range: deterministic AND independent of
    # the id distribution (a range split on sparse/offset ids can
    # silently yield a 0% or 100% train fraction).
    in_train = F.pmod(F.xxhash64(F.col("doc_id").cast("string")),
                      F.lit(100)) < args.train_frac_pct
    train_pages = extract_text(pages_raw.where(in_train))
    held_out_raw = pages_raw.where(~in_train)
    n_train = train_pages.count()

    types = tuple(sorted({g[1] for g in GAZETTEER}))
    model = train_distributed(train_pages, epochs=args.epochs,
                              rounds=args.rounds, channels=types)
    summary["events"].append({"stage": "train", "action": "ran",
                              "train_docs": n_train,
                              "channels": len(types),
                              "rounds": args.rounds})

    model_path = os.path.join(args.out, "model.npz")
    save_multichannel(model, model_path)
    summary["events"].append({"stage": "save", "action": "ran",
                              "bytes": os.path.getsize(model_path)})

    loaded = load_multichannel(model_path)
    frames = build_cascade(held_out_raw, chunk_fn=loaded.chunk_fn())
    frames.triples.write.mode("overwrite").parquet(
        os.path.join(args.out, "triples.parquet"))
    n_triples = spark.read.parquet(
        os.path.join(args.out, "triples.parquet")).count()
    summary["events"].append({"stage": "infer", "action": "ran",
                              "held_out_docs": n_docs - n_train,
                              "triples": n_triples})

    gold = build(held_out_raw).triples
    row = prf_triples(gold, spark.read.parquet(
        os.path.join(args.out, "triples.parquet"))).first()
    summary["events"].append({
        "stage": "eval", "action": "ran",
        "p_micro6": row["p_micro6"], "r_micro6": row["r_micro6"],
        "f1_micro6": row["f1_micro6"]})
    summary["f1_micro6"] = row["f1_micro6"]

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
