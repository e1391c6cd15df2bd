"""KG quality-report job: run the analytics layer over a corpus and
materialize the report tables (the operational form of the
continuation operators — what a data-quality dashboard reads).

Usage:
  spark-submit --py-files dist/ehr_relation_extraction_spark.zip \
      scripts/analyze_kg.py --sf-dir /root/testdata/sf0.001 \
      --out /tmp/kg_report

Writes one parquet table per report under --out and prints ONE JSON
line with per-table row counts + wall timings:

  schema        pred_cardinality + pred_ifp (functional / key profile)
  schema_graph  typed quotient of the KG edge table
  types         majority-vote node typing with purity
  resolved      belief-argmax conflict-resolved KG (truth finding)
  source_trust  fused host trust scores
  host_errors   per-host share of attestations losing the argmax
  yield         per-host extraction yield
  completeness  per-subject predicate coverage
  communities   LPA community conductance report
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from ehr_relation_extraction_spark import driver_queries as dq
    from ehr_relation_extraction_spark.session import get_spark

    spark = get_spark(app_name="analyze-kg")
    reports = {
        "schema": "pred_cardinality",
        "schema_keys": "pred_ifp",
        "schema_graph": "schema_graph",
        "types": "entity_types",
        "resolved": "kg_resolved",
        "source_trust": "source_trust",
        "host_errors": "host_error_rate",
        "yield": "extraction_yield",
        "completeness": "kg_completeness",
        "communities": "community_stats",
    }
    summary: dict[str, dict] = {}
    for table, key in reports.items():
        t0 = time.time()
        df = dq.QUERIES[key](spark, args.sf_dir)
        path = os.path.join(args.out, table)
        df.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        summary[table] = {"rows": n,
                          "wall_ms": int((time.time() - t0) * 1000)}
    print(json.dumps({"out": args.out, "reports": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
