"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>,
   "triples": <count>, "triples_per_sec": <rate>}

Scaling-efficiency mode (the north rule's two-cluster-size proxy):
  python bench.py --scaling
runs the flagship triples job at local[8] and local[32] on the same
input and reports throughput at both plus eff = thr32 / (4 * thr8).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1).rstrip(".")) if m else -1.0


HEADLINE = [
    "extract_text", "tokenize", "shards", "mentions",
    "candidates", "relations", "triples", "wide_table",
]


def run_suite(sf_dir: str, master: str, shuffle: int) -> dict:
    from ehr_relation_extraction_spark.session import get_spark
    from ehr_relation_extraction_spark import driver_queries as dq

    spark = get_spark(app_name=f"bench-{master}", master=master,
                      shuffle_partitions=shuffle)
    # warm the JVM + python workers once (excluded from timings)
    dq.QUERIES["extract_text"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name in HEADLINE:
        t0 = time.time()
        counts[name] = dq.QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()
    return {"timings": timings, "counts": counts}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    master = f"local[{cpus}]"

    if "--scaling" in sys.argv:
        out = {}
        for n in (max(2, cpus // 4), cpus):
            r = run_suite(sf_dir, f"local[{n}]", n)
            total = sum(r["timings"].values())
            out[n] = {"sec": round(total, 2),
                      "rows_per_sec": round(sum(r["counts"].values()) / total, 1)}
        lo, hi = sorted(out)
        eff = out[hi]["rows_per_sec"] / ((hi / lo) * out[lo]["rows_per_sec"])
        print(json.dumps({"metric": "scaling_efficiency", "value": round(eff, 3),
                          "unit": "ratio", "levels": {str(k): v for k, v in out.items()},
                          "sf": sf_of(sf_dir)}))
        return

    r = run_suite(sf_dir, master, cpus)
    total = round(sum(r["timings"].values()), 3)
    trip_sec = r["timings"].get("triples") or 1e-9
    print(json.dumps({
        "metric": "kg_pipeline_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": r["timings"],
        "sf": sf_of(sf_dir),
        "triples": r["counts"].get("triples", 0),
        "triples_per_sec": round(r["counts"].get("triples", 0) / trip_sec, 1),
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
