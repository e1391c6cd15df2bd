"""Day-partitioned triple store writes + partition pruning.

SURVEY §7.0's production layout partitions the triple tables by
``days(warc_ts)`` (Iceberg transform).  The Spark-native parquet form
is a materialized ``day_idx`` column + ``partitionBy("day_idx")``:
a time-ranged query then prunes to the matching directories at scan
planning time — the scan's ``PartitionFilters`` carries the predicate
and untouched days are never opened (asserted in tests/test_plans.py).
At 100 TB with ~daily crawls this is the difference between scanning
one day and scanning three years.

Compaction: a long-running incremental writer accretes small files;
``compact_partitions`` rewrites a day's files to a bounded count —
the parquet stand-in for Iceberg's rewrite_data_files maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: epoch seconds of the synthetic crawl's day-0 (fixtures derive
#: warc_ts as 2024-01-01 + doc_id seconds)
CRAWL_EPOCH = 1704067200


def with_day_idx(df: DataFrame, ts_col: str = "warc_ts") -> DataFrame:
    """Materialize the integer crawl-day partition key."""
    return df.withColumn(
        "day_idx",
        F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
        .cast("int"))


def write_day_partitioned(df: DataFrame, path: str) -> None:
    """Write a day_idx-partitioned parquet table (one directory per
    crawl day — the pruning unit)."""
    df.write.mode("overwrite").partitionBy("day_idx").parquet(path)


def with_url_bucket(df: DataFrame, n_buckets: int = 16,
                    url_col: str = "url") -> DataFrame:
    """Materialize the ``bucket(N, url)`` partition key (parquet form
    of the Iceberg bucket transform, SURVEY §7.0).  Deterministic
    xxhash64 mod N, so the same url lands in the same bucket across
    writes — point lookups and url-keyed incremental merges touch
    1/N of each day."""
    return df.withColumn(
        "url_bucket",
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)).cast("int"))


def write_composite_partitioned(df: DataFrame, path: str,
                                n_buckets: int = 16) -> None:
    """Write the production composite layout ``days(warc_ts) x
    bucket(N, url)``: directory tree ``day_idx=D/url_bucket=B/``.

    Two independent pruning axes at scan-planning time:

    - time-ranged queries prune to the matching day directories;
    - url-targeted queries (lookups, re-crawl merges) additionally
      prune to ONE bucket directory per day — at 10^12 docs the
      difference between reading a whole day (~TBs) and 1/N of it.

    The bucket count is a layout constant: pick N so a single
    (day, bucket) cell stays in the 100 MB–1 GB parquet sweet spot at
    the target scale, same sizing rule as Iceberg's bucket transform.
    """
    out = df if "url_bucket" in df.columns else with_url_bucket(df, n_buckets)
    (out.write.mode("overwrite")
     .partitionBy("day_idx", "url_bucket").parquet(path))


def read_url_days(spark: SparkSession, path: str, url: str,
                  day_lo: int, day_hi: int,
                  n_buckets: int = 16) -> DataFrame:
    """Point-lookup over a composite table: all rows for ``url``
    within [day_lo, day_hi].  The day range AND the url's bucket both
    become PartitionFilters (directory pruning); the url equality is
    additionally pushed down into the parquet row-group scan."""
    df = spark.read.parquet(path)
    bucket = (df.sparkSession.range(1)
              .select(F.pmod(F.xxhash64(F.lit(url)), F.lit(n_buckets))
                      .cast("int").alias("b")).first()["b"])
    return df.where((F.col("day_idx") >= day_lo)
                    & (F.col("day_idx") <= day_hi)
                    & (F.col("url_bucket") == bucket)
                    & (F.col("url") == url))


def read_day(spark: SparkSession, path: str, day_idx: int) -> DataFrame:
    """Read one crawl day; the filter becomes a PartitionFilter, so
    only that day's directory is listed/scanned."""
    return spark.read.parquet(path).where(F.col("day_idx") == day_idx)


def merge_composite(spark: SparkSession, path: str, deltas: DataFrame,
                    n_buckets: int = 16) -> list[tuple[int, int]]:
    """Partition-scoped MERGE of re-crawl triple deltas into a
    composite ``day_idx x url_bucket`` store: rewrite ONLY the cells
    the deltas touch, never the whole table — at 10^12 docs a daily
    re-crawl touches a handful of (day, bucket) cells and this is the
    difference between rewriting gigabytes and rewriting the table.

    ``deltas``: (url, subj, pred, obj, op '+'/'-', crawl_seq,
    day_idx) — day_idx names the store partition the row lands in /
    is retracted from (recrawl_diff's per-url state knows it).  Per
    (day_idx, key) the LAST op by crawl_seq wins, same semantics as
    streaming/stateful.apply_triple_deltas.

    Mechanics: the touched-cell list is collected (bounded: one row
    per touched partition, NOT per delta); the store scan is pruned to
    those cells; the rewrite uses dynamic partition overwrite so
    untouched directories' files are never opened or replaced.  Cells
    whose rows are ALL retracted produce no output rows — dynamic
    overwrite skips them, so their directories are removed explicitly.
    Iceberg does this swap transactionally (RewriteFiles); the parquet
    stand-in documents the non-atomic window instead of hiding it.

    Returns the touched (day_idx, url_bucket) list (lineage row).
    """
    import shutil

    key = ["url", "subj", "pred", "obj"]
    d = deltas if "url_bucket" in deltas.columns \
        else with_url_bucket(deltas, n_buckets)
    cells = sorted({(r["day_idx"], r["url_bucket"])
                    for r in d.select("day_idx", "url_bucket")
                    .distinct().collect()})
    if not cells:
        return []
    cond = None
    for day, bucket in cells:
        c = (F.col("day_idx") == day) & (F.col("url_bucket") == bucket)
        cond = c if cond is None else cond | c
    affected = spark.read.parquet(path).where(cond)

    from pyspark.sql import Window

    w = (Window.partitionBy("day_idx", *key)
         .orderBy(F.col("crawl_seq").desc()))
    last = (d.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1))
    adds = last.where(F.col("op") == "+") \
        .select("day_idx", "url_bucket", *key)
    dels = last.where(F.col("op") == "-") \
        .select("day_idx", *key)
    kept = (affected.select("day_idx", "url_bucket", *key)
            .join(dels, ["day_idx", *key], "left_anti"))
    merged = kept.unionByName(adds) \
        .dropDuplicates(["day_idx", *key]).localCheckpoint()

    (merged.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("day_idx", "url_bucket").parquet(path))

    nonempty = {(r["day_idx"], r["url_bucket"]) for r in
                merged.select("day_idx", "url_bucket").distinct().collect()}
    for day, bucket in cells:
        if (day, bucket) not in nonempty:
            shutil.rmtree(f"{path}/day_idx={day}/url_bucket={bucket}",
                          ignore_errors=True)
    return cells


# ---------------------------------------------------------------------------
# Manifest store: generation directories + atomic pointer swap
# ---------------------------------------------------------------------------
#
# The in-place merge/compact above document a non-atomic window (the
# shutil.move swap).  The manifest store closes it the way Iceberg
# does — data files are immutable, committed state is a POINTER:
#
#   <root>/_MANIFEST.json     {"generation": N, "dir": "gen-%06d", ...}
#   <root>/gen-000001/day_idx=D/url_bucket=B/part-*.parquet
#   <root>/gen-000002/...
#
# Writers build the NEXT generation directory (hardlinking every
# untouched file — an O(files) metadata op, no data copied; Iceberg's
# "new snapshot references old files" reduced to the local-FS form),
# then promote with os.replace of the manifest — atomic on POSIX.  A
# crash mid-build leaves an orphan gen directory that no reader ever
# resolves; promote GCs all non-current generations.  Readers resolve
# through the manifest, so they see exactly one committed generation.

MANIFEST = "_MANIFEST.json"


def _manifest(root: str) -> dict:
    import json

    with open(f"{root}/{MANIFEST}") as f:
        return json.load(f)


def store_resolve(root: str) -> str:
    """Current committed generation's data directory."""
    return f"{root}/{_manifest(root)['dir']}"


def store_read(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(store_resolve(root))


def _promote(root: str, gen: int, lineage: dict) -> None:
    """Atomically commit generation ``gen`` (os.replace of the
    manifest), then GC stale generation directories — EXCEPT the
    immediately-previous generation, which is retained for one grace
    window: a reader that resolved the old generation via
    :func:`store_resolve` just before this commit can still finish its
    scan; the old dir is GC'd by the promote after next.  (Iceberg
    solves the same race with snapshot expiry retention; a single
    grace generation is the parquet-manifest equivalent.)"""
    import json
    import os
    import shutil

    tmp = f"{root}/{MANIFEST}.tmp"
    cur = f"gen-{gen:06d}"
    with open(tmp, "w") as f:
        json.dump({"generation": gen, "dir": cur, "lineage": lineage}, f)
    os.replace(tmp, f"{root}/{MANIFEST}")  # the atomic commit point
    keep = {cur, f"gen-{gen - 1:06d}"}
    for d in os.listdir(root):
        if d.startswith("gen-") and d not in keep:
            shutil.rmtree(f"{root}/{d}", ignore_errors=True)


def store_init(df: DataFrame, root: str, n_buckets: int = 16) -> None:
    """Create a manifest store from a triples frame (composite
    day_idx x url_bucket layout inside generation 1)."""
    import os

    os.makedirs(root, exist_ok=True)
    write_composite_partitioned(df, f"{root}/gen-000001", n_buckets)
    _promote(root, 1, {"op": "init"})


def _link_tree(src: str, dst: str, skip_cells: set) -> None:
    """Hardlink src's partition tree into dst, skipping the touched
    (day_idx, url_bucket) cell directories.  Metadata-only: no bytes
    are copied, and the linked files stay immutable (parquet files are
    never appended in place)."""
    import os

    for day_d in os.listdir(src):
        if not day_d.startswith("day_idx="):
            continue
        day = int(day_d.split("=")[1])
        for buck_d in os.listdir(f"{src}/{day_d}"):
            if not buck_d.startswith("url_bucket="):
                continue
            if (day, int(buck_d.split("=")[1])) in skip_cells:
                continue
            os.makedirs(f"{dst}/{day_d}/{buck_d}", exist_ok=True)
            for fn in os.listdir(f"{src}/{day_d}/{buck_d}"):
                os.link(f"{src}/{day_d}/{buck_d}/{fn}",
                        f"{dst}/{day_d}/{buck_d}/{fn}")


def store_merge(spark: SparkSession, root: str, deltas: DataFrame,
                n_buckets: int = 16) -> list[tuple[int, int]]:
    """Partition-scoped MERGE with an ATOMIC commit: same delta
    semantics as :func:`merge_composite` (per (day, key) last op by
    crawl_seq wins), but the result lands as a new generation —
    untouched cells hardlinked (no rewrite, no copy), touched cells
    rewritten — and becomes visible only at the manifest os.replace.
    A reader concurrent with the merge sees entirely-old or
    entirely-new state, never a mix: the previous generation directory
    is retained for one grace promote (see :func:`_promote`), so a
    reader that resolved it just before the commit finishes its scan
    against intact files — the guarantee holds as long as a scan does
    not span TWO subsequent maintenance promotes.  A crash leaves the
    old generation committed.  Returns the touched-cell lineage
    list."""
    import os

    from pyspark.sql import Window

    man = _manifest(root)
    cur_dir = f"{root}/{man['dir']}"
    gen = man["generation"] + 1
    new_dir = f"{root}/gen-{gen:06d}"

    key = ["url", "subj", "pred", "obj"]
    d = deltas if "url_bucket" in deltas.columns \
        else with_url_bucket(deltas, n_buckets)
    cells = sorted({(r["day_idx"], r["url_bucket"])
                    for r in d.select("day_idx", "url_bucket")
                    .distinct().collect()})
    if not cells:
        return []
    cond = None
    for day, bucket in cells:
        c = (F.col("day_idx") == day) & (F.col("url_bucket") == bucket)
        cond = c if cond is None else cond | c
    affected = spark.read.parquet(cur_dir).where(cond)

    w = (Window.partitionBy("day_idx", *key)
         .orderBy(F.col("crawl_seq").desc()))
    last = (d.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1))
    adds = last.where(F.col("op") == "+") \
        .select("day_idx", "url_bucket", *key)
    dels = last.where(F.col("op") == "-") \
        .select("day_idx", *key)
    kept = (affected.select("day_idx", "url_bucket", *key)
            .join(dels, ["day_idx", *key], "left_anti"))
    merged = kept.unionByName(adds) \
        .dropDuplicates(["day_idx", *key]).localCheckpoint()

    os.makedirs(new_dir, exist_ok=True)
    _link_tree(cur_dir, new_dir, skip_cells=set(cells))
    # touched cells only; fully-retracted cells simply write no rows
    # (their directory never appears in the new generation)
    (merged.write.mode("append")
     .partitionBy("day_idx", "url_bucket").parquet(new_dir))
    _promote(root, gen, {"op": "merge", "cells": [list(c) for c in cells]})
    return cells


def store_compact(spark: SparkSession, root: str,
                  target_files_per_cell: int = 1) -> None:
    """Small-files compaction as a new generation + atomic promote —
    the manifest-store counterpart of :func:`compact_partitions`,
    preserving the composite partition scheme and leaving no crash
    window (the old generation stays committed until the manifest
    swap)."""
    man = _manifest(root)
    gen = man["generation"] + 1
    df = spark.read.parquet(f"{root}/{man['dir']}")
    part_cols = [c for c in ("day_idx", "url_bucket") if c in df.columns]
    data_cols = [c for c in df.columns if c not in part_cols]
    spread = F.pmod(F.xxhash64(*data_cols), F.lit(target_files_per_cell))
    n_cells = max(df.select(*part_cols).distinct().count(), 1)
    (df.repartition(n_cells * target_files_per_cell, *part_cols, spread)
     .write.mode("overwrite").partitionBy(*part_cols)
     .parquet(f"{root}/gen-{gen:06d}"))
    _promote(root, gen, {"op": "compact"})


def compact_partitions(spark: SparkSession, path: str,
                       target_files_per_cell: int = 1) -> None:
    """Rewrite each partition down to a bounded file count (the
    small-files maintenance job).  Data is bit-identical afterwards;
    only the file layout changes.

    The rewrite PRESERVES the store's existing partition scheme: a
    composite ``day_idx x url_bucket`` store stays composite (the
    partition columns are detected from the schema).  Compacting a
    composite store down to day-level directories would demote
    url_bucket to a data column — a later ``merge_composite`` (which
    writes ``day_idx=D/url_bucket=B/`` with dynamic overwrite) could
    then never replace the old day-level files, resurrecting retracted
    triples and leaving a mixed-depth tree that breaks partition
    discovery.  ``scripts/maintain_store.py`` chains merge -> compact
    -> merge on one store, so this is load-bearing, not cosmetic
    (tests/test_plans.py::test_merge_compact_merge_roundtrip).

    Repartitioning hashes on (partition cols, spread) where spread
    distributes each cell's rows over ``target_files_per_cell``
    deterministic hash buckets — hashing on the partition columns
    alone would land every cell in ONE task and silently ignore
    targets > 1.  The swap parks the old tree aside before promoting
    the compacted one, so a crash between the two steps leaves a
    recoverable copy (``._old``) instead of no table; object stores
    would use a manifest/catalog swap instead — Iceberg does this
    natively."""
    df = spark.read.parquet(path)
    part_cols = [c for c in ("day_idx", "url_bucket") if c in df.columns]
    data_cols = [c for c in df.columns if c not in part_cols]
    spread = F.pmod(F.xxhash64(*data_cols), F.lit(target_files_per_cell))
    n_cells = max(df.select(*part_cols).distinct().count(), 1)
    (df.repartition(n_cells * target_files_per_cell, *part_cols, spread)
     .write.mode("overwrite").partitionBy(*part_cols)
     .parquet(path + "._compacted"))
    import shutil

    shutil.move(path, path + "._old")          # park, don't destroy
    shutil.move(path + "._compacted", path)    # promote
    shutil.rmtree(path + "._old")              # cleanup last
