"""Skyline (Pareto-frontier) queries — multi-criteria "best" entities
where no single score exists: a point survives iff NO other point is
>= on every dimension and > on at least one (Borzsonyi et al.
ICDE'01).

Distributed shape: the skyline operator is idempotent and
merge-closed — skyline(union of partial skylines) == skyline(all) —
so the scale path is the classic two phase: a partition-local
skyline (one Arrow pass, shrinks each partition to its frontier,
typically orders of magnitude) followed by a final pass over the
concatenated locals.  No joins, no shuffle of dominated points.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _pd_skyline(pdf: pd.DataFrame, dims: list[str]) -> pd.DataFrame:
    """Serial skyline of one pandas block, deterministic.  Sort by
    dim-sum descending — a dominator's sum is STRICTLY greater (>=
    everywhere, > somewhere), so every point's dominators precede
    it — then a single scan testing only the kept frontier."""
    if pdf.empty:
        return pdf
    pdf = pdf.assign(_s=pdf[dims].sum(axis=1)).sort_values(
        "_s", ascending=False, kind="mergesort").drop(columns="_s")
    kept: list[int] = []
    vals = pdf[dims].to_numpy()
    for i in range(len(pdf)):
        v = vals[i]
        dominated = False
        for j in kept:
            w = vals[j]
            if (w >= v).all() and (w > v).any():
                dominated = True
                break
        if not dominated:
            kept.append(i)
    return pdf.iloc[kept]


def skyline(points: DataFrame, dims: list[str]) -> DataFrame:
    """Exact distributed skyline over ``dims`` (all maximized).

    Phase 1 shrinks every Arrow batch to its local frontier
    (mapInPandas, no shuffle); phase 2 merges the locals on one
    partition — bounded by construction because a frontier over k
    discrete dimensions is small (and never larger than phase 1's
    output), the same bounded-final-pass device as the top-k
    operators.  Output = input schema filtered to frontier rows;
    duplicate-coordinate points all survive (dominance is strict on
    at least one dim)."""
    schema = points.schema

    def local(it):
        for pdf in it:
            yield _pd_skyline(pdf, dims)

    def final(it):
        yield _pd_skyline(pd.concat(list(it), ignore_index=True),
                          dims)

    reduced = points.mapInPandas(local, schema)
    return reduced.repartition(1).mapInPandas(final, schema)


def entity_skyline_3d(triples: DataFrame) -> DataFrame:
    """The KG curation frontier: subjects that are Pareto-optimal on
    (n_docs, n_hosts, n_preds) — corroboration breadth, source
    diversity, and relational richness.  One aggregate feeds the
    two-phase skyline; output (subj, n_docs, n_hosts, n_preds)."""
    host = F.regexp_extract("url", r"^https?://([^/]*)", 1)
    stats = (triples
             .select("subj", "doc_id", host.alias("host"), "pred")
             .groupBy("subj")
             .agg(F.countDistinct("doc_id").cast("long")
                  .alias("n_docs"),
                  F.countDistinct("host").cast("long")
                  .alias("n_hosts"),
                  F.countDistinct("pred").cast("long")
                  .alias("n_preds")))
    return skyline(stats, ["n_docs", "n_hosts", "n_preds"])
