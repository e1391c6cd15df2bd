"""Extra benchmarks for optimization work (guide §1.4 noop isolation).

NOT part of the frozen driver contract — bench.py is the measured
artifact; this file exists to isolate per-query cost, capture
explain("formatted") plans, and time sub-stages, so OPTIMIZATION_r06.md
claims are reproducible.

Usage:
  python bench_extra.py --plans DIR SUFFIX   # write <query>_<SUFFIX>.txt plans
  python bench_extra.py --isolate            # per-query count+noop timings
  python bench_extra.py --stages             # sub-stage breakdown of the pipeline
"""

from __future__ import annotations

import json
import os
import sys
import time


HEADLINE = [
    "extract_text", "tokenize", "shards", "mentions",
    "candidates", "relations", "triples", "triples_fused", "wide_table",
]


def _spark():
    from ehr_relation_extraction_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    return get_spark(app_name="bench-extra", master=f"local[{cpus}]",
                     shuffle_partitions=cpus)


def write_plans(out_dir: str, suffix: str) -> None:
    """Write both the INITIAL formatted plan (pre-execution; with a
    cached-but-unmaterialized input its partitioning is unknown, so
    EnsureRequirements inserts conservative exchanges) and the FINAL
    executed plan (AQE re-plans per query stage once the cache is
    materialized and elides exchanges the cache's partitioning already
    satisfies) — the executed plan is the honest evidence for
    partitioning-reuse claims."""
    from ehr_relation_extraction_spark import driver_queries as dq

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    os.makedirs(out_dir, exist_ok=True)
    for name in HEADLINE:
        df = dq.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        df.count()  # first run: materializes any cached inputs
        # capture from a SECOND execution — with the cache materialized
        # AQE sees its real partitioning and can elide exchanges; the
        # first run plans conservatively while the cache builds.
        df2 = dq.QUERIES[name](spark, sf_dir)
        df2.count()
        final = df2._jdf.queryExecution().executedPlan().toString()
        with open(os.path.join(out_dir,
                               f"{name}_{suffix}_executed.txt"), "w") as f:
            f.write(final)
        print(f"wrote {name}_{suffix}(.txt|_executed.txt)")
    spark.stop()


def isolate() -> None:
    """Per-query cost, bench methodology (count) plus noop sink, on a
    fresh session with a warmed JVM — reported as best-of-K."""
    from ehr_relation_extraction_spark import driver_queries as dq

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    spark = _spark()
    dq.QUERIES["extract_text"](spark, sf_dir).count()  # warm
    out: dict[str, dict[str, float]] = {}
    for _ in range(trials):
        for name in HEADLINE:
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            t0 = time.time()
            n = dq.QUERIES[name](spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            d = out.setdefault(name, {"count_sec": dt, "rows": n})
            d["count_sec"] = min(d["count_sec"], dt)
            t0 = time.time()
            (dq.QUERIES[name](spark, sf_dir)
             .write.format("noop").mode("overwrite").save())
            dt = round(time.time() - t0, 3)
            d["noop_sec"] = min(d.get("noop_sec", 1e9), dt)
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"metric": "isolate", "sf_dir": sf_dir,
                      "queries": out}))


def stages() -> None:
    """Sub-stage breakdown: scan, pages build, each Arrow hop, joins."""
    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.sources.pages import (
        extract_text, pages_from_documents)
    from ehr_relation_extraction_spark.operators import ner

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    spark = _spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm

    probes = {
        "scan_only": lambda: docs,
        "pages_raw": lambda: pages_from_documents(spark, sf_dir),
        "pages_text": lambda: extract_text(pages_from_documents(spark, sf_dir)),
        "tokenize_hop": lambda: ner.tokenize_df(
            extract_text(pages_from_documents(spark, sf_dir))),
        "mentions_noid": lambda: ner.detect_mentions_df(
            extract_text(pages_from_documents(spark, sf_dir)), with_ids=False),
        "mentions_ids": lambda: ner.detect_mentions_df(
            extract_text(pages_from_documents(spark, sf_dir))),
        "shards_hop": lambda: ner.build_shards(
            extract_text(pages_from_documents(spark, sf_dir))),
    }
    out: dict[str, dict[str, float]] = {}
    for _ in range(trials):
        for name, fn in probes.items():
            spark.sparkContext.setJobDescription(f"stage:{name}")
            t0 = time.time()
            n = fn().count()
            dt = round(time.time() - t0, 3)
            d = out.setdefault(name, {"count_sec": dt, "rows": n})
            d["count_sec"] = min(d["count_sec"], dt)
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            d["noop_sec"] = min(d.get("noop_sec", 1e9), dt)
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"metric": "stages", "sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--plans" in sys.argv:
        i = sys.argv.index("--plans")
        write_plans(sys.argv[i + 1], sys.argv[i + 2])
    elif "--isolate" in sys.argv:
        isolate()
    elif "--stages" in sys.argv:
        stages()
