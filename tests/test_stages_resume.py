"""Checkpoint/resume + lineage tests (north rule: resumability)."""

from __future__ import annotations

import shutil

from ehr_relation_extraction_spark.oracle.fixtures import pages_df
from ehr_relation_extraction_spark.plans.stages import run_pipeline


def _triples_set(frames):
    return {(r["url"], r["subj"], r["pred"], r["obj"])
            for r in frames["triples"].collect()}


def test_full_run_then_resume(spark, tmp_path):
    out = str(tmp_path / "kg")
    pages = pages_df(spark, n_pages=40)

    f1 = run_pipeline(spark, pages, out, run_id="r1")
    t1 = _triples_set(f1)
    assert all(e["action"] == "ran" for e in f1["_runner"].events)
    assert len(t1) > 0

    # full resume: everything skipped, identical results
    f2 = run_pipeline(spark, pages, out, run_id="r2")
    assert all(e["action"] == "skipped" for e in f2["_runner"].events)
    assert _triples_set(f2) == t1

    # kill mid-pipeline: drop triples + downstream, resume recomputes
    # only those stages
    for stage in ("triples", "linked", "components", "nodes", "edges"):
        shutil.rmtree(f"{out}/{stage}")
    f3 = run_pipeline(spark, pages, out, run_id="r3")
    actions = {e["stage"]: e["action"] for e in f3["_runner"].events}
    assert actions["pages"] == "skipped"
    assert actions["candidates"] == "skipped"
    assert actions["triples"] == "ran"
    assert actions["edges"] == "ran"
    assert _triples_set(f3) == t1


def test_lineage_rows(spark, tmp_path):
    out = str(tmp_path / "kg2")
    frames = run_pipeline(spark, pages_df(spark, n_pages=30), out, run_id="rL")
    lin = frames["_runner"].lineage().collect()
    stages = {r["stage"] for r in lin}
    assert {"pages", "mentions", "triples", "edges"} <= stages
    # row counts in lineage sum to the stage table counts
    by_stage = {}
    for r in lin:
        by_stage[r["stage"]] = by_stage.get(r["stage"], 0) + r["n_rows"]
    assert by_stage["triples"] == frames["triples"].count()
    assert all(r["wall_ms"] >= 0 for r in lin)
    assert all(r["run_id"] == "rL" for r in lin)
