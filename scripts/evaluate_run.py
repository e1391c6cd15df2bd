"""Evaluation job: score a system triples table against a gold triples
table (the operational form of the E1-E6 operators — what the reference
does with Track2-evaluate-ver4.py on .ann folders).

Usage:
  spark-submit --py-files dist/ehr_relation_extraction_spark.zip \
      scripts/evaluate_run.py --gold /path/gold_triples --pred /path/triples

Both inputs are parquet with columns (url, subj, pred, obj)
(extra columns ignored).  Prints one JSON line with tp/fp/fn and
micro P/R/F1.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gold", required=True)
    ap.add_argument("--pred", required=True)
    args = ap.parse_args()

    from ehr_relation_extraction_spark.operators.evaluate import prf_triples
    from ehr_relation_extraction_spark.session import get_spark

    spark = get_spark(app_name="evaluate-run")
    gold = spark.read.parquet(args.gold)
    pred = spark.read.parquet(args.pred)
    row = prf_triples(gold, pred).first().asDict()
    row["p"] = row.pop("p_micro6") / 1e6
    row["r"] = row.pop("r_micro6") / 1e6
    row["f1"] = row.pop("f1_micro6") / 1e6
    print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
