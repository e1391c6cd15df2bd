"""Physical-plan assertions: the optimizations the design depends on
must actually appear in the plan (SURVEY §4 / task brief: check
pushdown, pruning, broadcast)."""

from __future__ import annotations

import pytest


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def test_scan_prunes_columns(spark):
    """extract_text over documents must read only the columns it needs
    (doc_id, text, source) — not lang/n_chars."""
    from ehr_relation_extraction_spark.sources.pages import (
        extract_text, pages_from_documents)

    df = extract_text(pages_from_documents(spark, "/root/testdata/sf0.001")) \
        .select("doc_id", "url", "text")
    plan = formatted(df)
    assert "ReadSchema" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" in read_schema and "doc_id" in read_schema
    assert "n_chars" not in read_schema and "lang" not in read_schema


def test_gazetteer_link_is_broadcast(spark):
    """The alias dictionary must come in as a broadcast hash join."""
    from ehr_relation_extraction_spark.operators.linking import (
        gazetteer_df, link_mentions)
    from ehr_relation_extraction_spark.operators.ner import detect_mentions_df
    from ehr_relation_extraction_spark.oracle.fixtures import pages_df
    from ehr_relation_extraction_spark.sources.pages import extract_text

    pages = extract_text(pages_df(spark, n_pages=10))
    linked = link_mentions(detect_mentions_df(pages), gazetteer_df(spark))
    assert "BroadcastHashJoin" in plan_of(linked)


def test_lsh_candidates_no_cartesian(spark):
    """LSH candidate generation must be an equi-join on (band, sig) —
    never a cartesian/BNLJ over documents."""
    from ehr_relation_extraction_spark.operators import dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dd.lsh_candidate_pairs(dd.lsh_bands(dd.minhash_signatures(
        dd.shingles(docs))))
    plan = plan_of(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_bucket_join_is_equi(spark):
    from ehr_relation_extraction_spark.operators.similarity import ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = plan_of(ann_topk(emb))
    assert "CartesianProduct" not in plan


def test_filter_pushdown_to_scan(spark):
    """A lang filter must reach the parquet scan as a pushed filter."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = docs.where(F.col("lang") == "en").select("doc_id")
    plan = formatted(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "lang" in pushed[0]


def test_fused_path_single_python_stage(spark):
    """The fused triple path must contain exactly ONE mapInPandas
    (the whole point: one Arrow hop, then only the dedup exchange)."""
    from ehr_relation_extraction_spark.plans.fused import fused_triples
    from ehr_relation_extraction_spark.oracle.fixtures import pages_df
    from ehr_relation_extraction_spark.sources.pages import extract_text

    pages = extract_text(pages_df(spark, n_pages=10))
    plan = plan_of(fused_triples(pages))
    # r06: the hop is a columnar mapInArrow kernel (MapInArrow node);
    # the invariant is unchanged — exactly one Python boundary.
    n_python = plan.count("MapInArrow") + plan.count("MapInPandas")
    assert n_python == 1


def test_fuzzy_alias_join_is_broadcast(spark):
    """The gazetteer trigram posting list must arrive as a broadcast
    hash join; the vocab side must never cartesian against it."""
    from ehr_relation_extraction_spark.operators.linking import (
        fuzzy_alias_candidates)
    from ehr_relation_extraction_spark.operators.ner import tokenize_df
    from ehr_relation_extraction_spark.oracle.fixtures import pages_df
    from ehr_relation_extraction_spark.sources.pages import extract_text

    toks = tokenize_df(extract_text(pages_df(spark, n_pages=10)))
    plan = plan_of(fuzzy_alias_candidates(toks))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_is_window_not_range_join(spark):
    """The as-of join must compile to ONE exchange on user_id + a sort
    + a window — never a join (range joins explode at scale)."""
    from ehr_relation_extraction_spark.operators.events import (
        asof_attribution)

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = plan_of(asof_attribution(ev))
    assert "Window" in plan
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                "BroadcastNestedLoopJoin", "ShuffledHashJoin"):
        assert bad not in plan, f"as-of join compiled to {bad}"
    # exactly one shuffle: the user_id partitioning for the window
    assert plan.count("Exchange hashpartitioning") == 1


def test_corpus_split_no_shuffle(spark):
    """Hash-split is embarrassingly parallel: zero exchanges."""
    from ehr_relation_extraction_spark.functions.textstats import (
        train_dev_test_split)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert "Exchange" not in plan_of(train_dev_test_split(docs))


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """bucketBy(N, key) + sortBy persists the hash partitioning in the
    table layout: a join of two same-bucketed tables is a SortMergeJoin
    over co-located buckets — ZERO Exchange (the scale property that
    lets url-keyed stages join repeatedly without re-shuffling)."""
    from ehr_relation_extraction_spark.plans.bucketed import (
        colocated_join, write_bucketed)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.selectExpr("doc_id", "source", "n_chars")
    b = docs.selectExpr("doc_id", "lang")
    write_bucketed(a, "bk_a", ["doc_id"], str(tmp_path), n_buckets=4)
    write_bucketed(b, "bk_b", ["doc_id"], str(tmp_path), n_buckets=4)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, "bk_a", "bk_b", ["doc_id"])
        plan = plan_of(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and it computes the same rows as a plain join
        plain = a.join(b, "doc_id")
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_day_partitioned_scan_prunes(spark, tmp_path):
    """A day_idx = N filter over a day-partitioned table must appear
    as a PartitionFilter (pruned at planning time), and compaction
    must bound the file count without changing a single row."""
    import glob

    from ehr_relation_extraction_spark.oracle.fixtures import pages_df
    from ehr_relation_extraction_spark.plans.partitioned import (
        compact_partitions, read_day, with_day_idx, write_day_partitioned)
    from ehr_relation_extraction_spark.sources.pages import extract_text

    pages = with_day_idx(extract_text(pages_df(spark, n_pages=40)))
    days = sorted(r["day_idx"] for r in
                  pages.select("day_idx").distinct().collect())
    path = str(tmp_path / "pages_daily")
    write_day_partitioned(pages.repartition(4), path)

    one = read_day(spark, path, days[0])
    plan = formatted(one)
    assert "PartitionFilters" in plan and "day_idx" in plan.split(
        "PartitionFilters")[1].split("]")[0], plan
    want = {r["url"] for r in pages.where(
        pages["day_idx"] == days[0]).collect()}
    assert {r["url"] for r in one.collect()} == want

    before = {tuple(r) for r in spark.read.parquet(path).collect()}
    compact_partitions(spark, path, target_files_per_cell=1)
    after_files = glob.glob(f"{path}/day_idx=*/*.parquet")
    per_day = {}
    for f in after_files:
        d = f.split("day_idx=")[1].split("/")[0]
        per_day[d] = per_day.get(d, 0) + 1
    assert per_day and all(n == 1 for n in per_day.values()), per_day
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before


def test_decontaminate_plan_is_two_joins_three_scans(spark):
    """The split is a hash of doc_id attached as a column — NOT a
    join — and totals+hits fuse into one aggregation, so the whole
    query is: shingle join (train x test) + one train-docs left join,
    over at most 3 scans of the documents table."""
    from ehr_relation_extraction_spark.functions.textstats import (
        decontaminate)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(decontaminate(docs))
    n_joins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin")
    assert n_joins == 2, plan
    assert plan.count("Scan parquet") <= 3, plan
    assert "CartesianProduct" not in plan


def test_compaction_honors_target_above_one(spark, tmp_path):
    """Regression: repartition(N, day_idx) alone hashes only on the
    day, so every day landed in ONE task and target_files_per_cell > 1
    silently produced 1 file; the (day_idx, hash-bucket) key must
    actually spread each day over up to N files."""
    import glob

    from ehr_relation_extraction_spark.oracle.fixtures import pages_df
    from ehr_relation_extraction_spark.plans.partitioned import (
        compact_partitions, with_day_idx, write_day_partitioned)
    from ehr_relation_extraction_spark.sources.pages import extract_text

    pages = with_day_idx(extract_text(pages_df(spark, n_pages=200)))
    path = str(tmp_path / "pages_daily3")
    write_day_partitioned(pages.repartition(8), path)
    before = {tuple(r) for r in spark.read.parquet(path).collect()}

    compact_partitions(spark, path, target_files_per_cell=3)
    per_day = {}
    for f in glob.glob(f"{path}/day_idx=*/*.parquet"):
        d = f.split("day_idx=")[1].split("/")[0]
        per_day[d] = per_day.get(d, 0) + 1
    assert per_day and all(1 <= n <= 3 for n in per_day.values()), per_day
    # with 3 buckets over ~86k-row days, at least one day actually splits
    assert any(n > 1 for n in per_day.values()), per_day
    assert {tuple(r) for r in spark.read.parquet(path).collect()} == before


def test_composite_bucket_day_scan_prunes_both_axes(spark, tmp_path):
    """The days(warc_ts) x bucket(N, url) composite layout (SURVEY
    §7.0 production spec; parquet form of the Iceberg transforms) must
    prune BOTH axes at planning time: a url + day-range lookup shows
    day_idx AND url_bucket in PartitionFilters, url in PushedFilters,
    and returns exactly the rows a full-scan filter would."""
    from ehr_relation_extraction_spark.oracle.fixtures import pages_df
    from ehr_relation_extraction_spark.plans.partitioned import (
        read_url_days, with_day_idx, with_url_bucket,
        write_composite_partitioned)
    from ehr_relation_extraction_spark.sources.pages import extract_text

    n_buckets = 4
    pages = with_url_bucket(
        with_day_idx(extract_text(pages_df(spark, n_pages=60))), n_buckets)
    days = sorted(r["day_idx"] for r in
                  pages.select("day_idx").distinct().collect())
    path = str(tmp_path / "pages_composite")
    write_composite_partitioned(pages.repartition(4), path, n_buckets)

    target = pages.where(pages["day_idx"] == days[0]).select("url").first()["url"]
    got = read_url_days(spark, path, target, days[0], days[0],
                        n_buckets=n_buckets)
    plan = formatted(got)
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "day_idx" in pf and "url_bucket" in pf, plan
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "url" in pushed, plan

    want = {tuple(r) for r in pages.where(
        (pages["url"] == target) & (pages["day_idx"] == days[0]))
        .drop("day_idx", "url_bucket").collect()}
    assert {tuple(r) for r in got.drop("day_idx", "url_bucket").collect()} == want
    assert len(want) >= 1


def test_merge_composite_rewrites_only_touched_cells(spark, tmp_path):
    """Partition-scoped MERGE: result rows equal a full-table merge,
    untouched cell files are byte-identical (never rewritten), and a
    fully-retracted cell's directory disappears."""
    import glob
    import os

    from ehr_relation_extraction_spark.plans.partitioned import (
        merge_composite, with_url_bucket)

    n_buckets = 2
    rows = [(f"https://h{i % 4}.ex/{i}", f"S{i}", "pred", f"O{i}",
             1000 + i % 3) for i in range(40)]
    store = with_url_bucket(spark.createDataFrame(
        rows, "url string, subj string, pred string, obj string, day_idx int"),
        n_buckets)
    path = str(tmp_path / "composite_store")
    store.write.partitionBy("day_idx", "url_bucket").parquet(path)

    before = {f: (os.path.getmtime(f), os.path.getsize(f))
              for f in glob.glob(f"{path}/day_idx=*/url_bucket=*/*.parquet")}
    full_before = {tuple(r) for r in spark.read.parquet(path)
                   .select("url", "subj", "pred", "obj", "day_idx").collect()}

    # retract one existing triple, add one new, and retract EVERY row
    # of one specific cell
    sample = store.collect()
    victim = sample[0]
    cell_day, cell_bucket = 1002, 1
    cell_rows = [r for r in sample
                 if r["day_idx"] == cell_day and r["url_bucket"] == cell_bucket]
    assert cell_rows, "fixture must populate the victim cell"
    deltas = [(victim["url"], victim["subj"], "pred", victim["obj"], "-",
               5, victim["day_idx"])]
    deltas += [(r["url"], r["subj"], "pred", r["obj"], "-", 5, cell_day)
               for r in cell_rows]
    deltas += [("https://h9.ex/new", "SN", "pred", "ON", "+", 5, 1000)]
    ddf = spark.createDataFrame(
        deltas, "url string, subj string, pred string, obj string, "
                "op string, crawl_seq int, day_idx int")

    touched = merge_composite(spark, path, ddf, n_buckets)
    assert (cell_day, cell_bucket) in touched

    got = {tuple(r) for r in spark.read.parquet(path)
           .select("url", "subj", "pred", "obj", "day_idx").collect()}
    dropped = {(victim["url"], victim["subj"], "pred", victim["obj"],
                victim["day_idx"])}
    dropped |= {(r["url"], r["subj"], "pred", r["obj"], cell_day)
                for r in cell_rows}
    want = (full_before - dropped) | {("https://h9.ex/new", "SN", "pred",
                                       "ON", 1000)}
    assert got == want

    # untouched cells: same files, same mtime+size
    touched_dirs = {f"day_idx={d}/url_bucket={b}" for d, b in touched}
    for f, sig in before.items():
        rel = "/".join(f.split("/")[-3:-1])
        if rel not in touched_dirs:
            assert os.path.exists(f) and (
                os.path.getmtime(f), os.path.getsize(f)) == sig, f
    # fully-retracted cell directory is gone
    assert not os.path.exists(f"{path}/day_idx={cell_day}/url_bucket={cell_bucket}")


def test_boilerplate_strip_plan_broadcasts_boiler_set(spark):
    """The boilerplate set join must be a broadcast (the set is
    bounded by lines shared across >= frac% of a host), and the whole
    query must stay free of cartesian products."""
    from ehr_relation_extraction_spark.functions.textstats import (
        boilerplate_strip, with_synth_lines)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(boilerplate_strip(with_synth_lines(docs)))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_passage_dups_plan_no_cartesian_one_wide_join(spark):
    """Windows come from the per-doc token array (no join to build
    them); the only join is the hash-keyed count-back."""
    from ehr_relation_extraction_spark.functions.textstats import (
        passage_dups, with_synth_quote)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(passage_dups(with_synth_quote(docs)))
    assert "CartesianProduct" not in plan
    n_joins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin")
    assert n_joins == 1, plan


def test_merge_composite_scan_is_partition_pruned(spark, tmp_path):
    """The store scan inside merge_composite must carry the touched
    cells as PartitionFilters — at 10^12 docs this is what keeps a
    delta MERGE from reading the whole table."""
    from ehr_relation_extraction_spark.plans.partitioned import (
        with_url_bucket)

    n_buckets = 2
    rows = [(f"https://h{i % 4}.ex/{i}", f"S{i}", "pred", f"O{i}",
             1000 + i % 3) for i in range(24)]
    store = with_url_bucket(spark.createDataFrame(
        rows, "url string, subj string, pred string, obj string, day_idx int"),
        n_buckets)
    path = str(tmp_path / "composite_prune")
    store.write.partitionBy("day_idx", "url_bucket").parquet(path)

    from pyspark.sql import functions as F

    cond = (F.col("day_idx") == 1000) & (F.col("url_bucket") == 1)
    affected = spark.read.parquet(path).where(cond)
    plan = formatted(affected)
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "day_idx" in pf and "url_bucket" in pf, plan
    # and only ONE cell directory's files are read
    files = [ln for ln in plan.splitlines() if "Location" in ln]
    assert files, plan


def test_merge_compact_merge_roundtrip(spark, tmp_path):
    """Regression for the round-2 advisory HIGH: compaction of a
    composite store must PRESERVE the day_idx x url_bucket partition
    scheme.  A day-only compaction demotes url_bucket to a data
    column; the next merge_composite (dynamic overwrite at
    day_idx=D/url_bucket=B/) then cannot replace the old day-level
    files — retracted triples resurrect as duplicates and the
    mixed-depth tree breaks partition discovery.  Chain
    build -> merge -> compact -> merge (the maintain_store.py order,
    re-runnable) and assert exact row sets at every step."""
    import glob

    from ehr_relation_extraction_spark.plans.partitioned import (
        compact_partitions, merge_composite, with_url_bucket)

    n_buckets = 2
    rows = [(f"https://h{i % 4}.ex/{i}", f"S{i}", "pred", f"O{i}",
             1000 + i % 3) for i in range(30)]
    store = with_url_bucket(spark.createDataFrame(
        rows, "url string, subj string, pred string, obj string, day_idx int"),
        n_buckets)
    path = str(tmp_path / "roundtrip_store")
    store.write.partitionBy("day_idx", "url_bucket").parquet(path)

    def snapshot():
        return {tuple(r) for r in spark.read.parquet(path)
                .select("url", "subj", "pred", "obj", "day_idx").collect()}

    def deltas(victim, seq):
        return spark.createDataFrame(
            [(victim[0], victim[1], victim[2], victim[3], "-", seq,
              victim[4]),
             (f"https://new.ex/{seq}", f"NEW{seq}", "pred", "VAL", "+",
              seq, 1000)],
            "url string, subj string, pred string, obj string, "
            "op string, crawl_seq int, day_idx int")

    base = snapshot()
    v1 = sorted(base)[0]
    merge_composite(spark, path, deltas(v1, 2), n_buckets)
    want = (base - {v1}) | {("https://new.ex/2", "NEW2", "pred", "VAL", 1000)}
    assert snapshot() == want

    compact_partitions(spark, path, target_files_per_cell=1)
    assert snapshot() == want
    # partition scheme preserved: every file still two directories deep
    files = glob.glob(f"{path}/**/*.parquet", recursive=True)
    assert files and all("/day_idx=" in f and "/url_bucket=" in f
                         for f in files), files

    # the second merge must still retract cleanly post-compaction
    v2 = sorted(want)[0]
    merge_composite(spark, path, deltas(v2, 3), n_buckets)
    want2 = (want - {v2}) | {("https://new.ex/3", "NEW3", "pred", "VAL", 1000)}
    assert snapshot() == want2


def test_manifest_store_atomic_merge_compact(spark, tmp_path):
    """Manifest store (round-3: closes the local-FS swap caveat):
    build -> merge -> compact -> merge with exact row sets at every
    step; untouched cells are HARDLINKED into the new generation
    (same inode — no data copied); commit is an atomic manifest
    os.replace, so an orphan generation from a simulated crash is
    never resolved and is GC'd by the next promote; scans through the
    resolved directory still carry both partition axes as
    PartitionFilters."""
    import json
    import os

    from ehr_relation_extraction_spark.plans.partitioned import (
        store_compact, store_init, store_merge, store_read,
        store_resolve, with_url_bucket)

    n_buckets = 2
    rows = [(f"https://h{i % 4}.ex/{i}", f"S{i}", "pred", f"O{i}",
             1000 + i % 3) for i in range(30)]
    store = with_url_bucket(spark.createDataFrame(
        rows, "url string, subj string, pred string, obj string, day_idx int"),
        n_buckets)
    root = str(tmp_path / "manifest_store")
    store_init(store, root, n_buckets)

    def snapshot():
        return {tuple(r) for r in store_read(spark, root)
                .select("url", "subj", "pred", "obj", "day_idx").collect()}

    def deltas(victim, seq):
        return spark.createDataFrame(
            [(victim[0], victim[1], victim[2], victim[3], "-", seq,
              victim[4]),
             (f"https://new.ex/{seq}", f"NEW{seq}", "pred", "VAL", "+",
              seq, 1000)],
            "url string, subj string, pred string, obj string, "
            "op string, crawl_seq int, day_idx int")

    base = snapshot()
    assert base == {tuple(r) for r in
                    store.select("url", "subj", "pred", "obj",
                                 "day_idx").collect()}

    # inodes of gen-1 files, keyed by relative path
    g1 = store_resolve(root)
    inodes = {}
    for day_d in os.listdir(g1):
        if day_d.startswith("day_idx="):
            for b_d in os.listdir(f"{g1}/{day_d}"):
                for fn in os.listdir(f"{g1}/{day_d}/{b_d}"):
                    rel = f"{day_d}/{b_d}/{fn}"
                    inodes[rel] = os.stat(f"{g1}/{day_d}/{b_d}/{fn}").st_ino

    v1 = sorted(base)[0]
    cells = store_merge(spark, root, deltas(v1, 2), n_buckets)
    want = (base - {v1}) | {("https://new.ex/2", "NEW2", "pred", "VAL", 1000)}
    assert snapshot() == want
    # grace window: the immediately-previous generation survives this
    # promote — a reader that resolved g1 just before the commit can
    # finish an entirely-old scan — and is GC'd by the promote after
    # next.  Untouched files in the new generation are hardlinks
    # (same inode).
    assert os.path.exists(g1)
    old_scan = {tuple(r) for r in spark.read.parquet(g1)
                .select("url", "subj", "pred", "obj", "day_idx").collect()}
    assert old_scan == base
    g2 = store_resolve(root)
    touched_dirs = {f"day_idx={d}/url_bucket={b}" for d, b in cells}
    n_linked = 0
    for rel, ino in inodes.items():
        if "/".join(rel.split("/")[:2]) not in touched_dirs:
            assert os.stat(f"{g2}/{rel}").st_ino == ino, rel
            n_linked += 1
    assert n_linked > 0

    # simulated crash: an orphan generation directory is never resolved
    os.makedirs(f"{root}/gen-000999/day_idx=1/url_bucket=0", exist_ok=True)
    assert snapshot() == want
    store_compact(spark, root, target_files_per_cell=1)
    assert snapshot() == want
    assert not os.path.exists(f"{root}/gen-000999")  # GC'd at promote
    assert not os.path.exists(g1)  # grace window expired (2 promotes)
    assert os.path.exists(g2)      # new previous generation retained
    man = json.load(open(f"{root}/_MANIFEST.json"))
    assert man["lineage"]["op"] == "compact"

    v2 = sorted(want)[0]
    store_merge(spark, root, deltas(v2, 3), n_buckets)
    want2 = (want - {v2}) | {("https://new.ex/3", "NEW3", "pred", "VAL", 1000)}
    assert snapshot() == want2

    # pruning still intact through the resolved path
    from pyspark.sql import functions as F
    plan = (store_read(spark, root)
            .where((F.col("day_idx") == 1000) & (F.col("url_bucket") == 0))
            ._jdf.queryExecution().executedPlan().toString())
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "day_idx" in pf and "url_bucket" in pf, plan
