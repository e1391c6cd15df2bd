"""applyInPandasWithState cross-batch dedup: duplicated pages across
micro-batches must yield each triple exactly once."""

from __future__ import annotations

from ehr_relation_extraction_spark.oracle.fixtures import pages_df
from ehr_relation_extraction_spark.plans.fused import fused_triples
from ehr_relation_extraction_spark.sources.pages import extract_text
from ehr_relation_extraction_spark.streaming.stateful import (
    incremental_unique_triples)


def test_stateful_dedup_across_batches(spark, tmp_path):
    pages = pages_df(spark, n_pages=30)
    src = str(tmp_path / "pages_src")
    # the same pages written TWICE as separate files -> duplicates
    # arrive in different micro-batches (maxFilesPerTrigger=2)
    pages.repartition(4).write.mode("append").parquet(src)
    pages.repartition(4).write.mode("append").parquet(src)

    out = str(tmp_path / "uniq")
    q = incremental_unique_triples(spark, src, out, str(tmp_path / "ck"))
    q.awaitTermination(300)

    got = [(r["url"], r["subj"], r["pred"], r["obj"])
           for r in spark.read.parquet(out).collect()]
    want = {(r["url"], r["subj"], r["pred"], r["obj"])
            for r in fused_triples(extract_text(pages)).collect()}
    assert len(got) == len(set(got)), "stateful dedup emitted duplicates"
    assert set(got) == want and len(want) > 0


def test_pair_negative_cache_skips_reclassification():
    """Roadmap item 5: the recrawl path caches NEGATIVE pair
    classifications per url, so a re-crawled page re-classifies only
    pairs it has not already rejected — with zero effect on the
    emitted triple set."""
    from ehr_relation_extraction_spark.plans.fused import (
        candidate_pairs_for_doc)
    from ehr_relation_extraction_spark.streaming.stateful import (
        _page_triples, _triple_keys)

    # multi-shard text: a Topic hub, one near Money attr (positive,
    # gap <= 60) and one far Money attr (negative, gap > 60) inside
    # the same pairing window; fillers are out-of-gazetteer
    f1 = " ".join(f"zz{i:02d}xx" for i in range(9))
    f2 = " ".join(f"qq{i:02d}xx" for i in range(31))
    text = f"pad spark value {f1} key {f2} tail"
    pairs = candidate_pairs_for_doc(text)
    gaps = [g for _, _, _, g in pairs]
    assert any(g <= 60 for g in gaps) and any(g > 60 for g in gaps), gaps

    neg: set[str] = set()
    t1, n1 = _page_triples(text, neg)
    assert n1 == len(pairs)            # cold cache: everything classified
    n_neg = len(neg)
    assert n_neg == sum(g > 60 for g in gaps) > 0

    t2, n2 = _page_triples(text, neg)  # re-crawl of an edited page that
    assert t2 == t1                    # re-derives the same pairs
    assert n2 == n1 - n_neg            # cached negatives skipped
    assert len(neg) == n_neg           # no duplicate cache growth

    # cache-free reference: identical triples
    assert _triple_keys(text) == t1


def _triple_sets(pages):
    from collections import defaultdict

    d = defaultdict(set)
    for r in fused_triples(extract_text(pages)).collect():
        d[r["url"]].add((r["subj"], r["pred"], r["obj"]))
    return d


def test_recrawl_diff_emits_retractions_and_additions(spark, tmp_path):
    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark.sources.pages import (HTML_PREFIX,
                                                              HTML_SUFFIX)
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_recrawl_diff)

    v1 = pages_df(spark, n_pages=24)
    changed = F.col("doc_id") % 3 == 0
    # re-crawled version: body truncated to half (tail triples must be
    # RETRACTED) plus a new phrase (new triples must be ADDED)
    body = F.substring_index(
        F.substring_index(F.decode("html", "utf-8"), HTML_SUFFIX, 1),
        HTML_PREFIX, -1)
    new_body = F.concat(
        F.substring(body, 1, (F.length(body) / 2).cast("int")),
        F.lit(" spark value"))
    new_html = F.when(changed, F.encode(F.concat(
        F.lit(HTML_PREFIX), new_body, F.lit(HTML_SUFFIX)), "utf-8")
    ).otherwise(F.col("html"))
    v2 = v1.select(
        "doc_id", "url",
        F.expr("warc_ts + INTERVAL 1 DAY").alias("warc_ts"),
        new_html.alias("html"), "lang")

    src = str(tmp_path / "crawl")
    v1.repartition(4).write.mode("append").parquet(src)
    v2.repartition(4).write.mode("append").parquet(src)

    out, ck = str(tmp_path / "deltas"), str(tmp_path / "ck")
    incremental_recrawl_diff(spark, src, out, ck).awaitTermination(300)

    t1, t2 = _triple_sets(v1), _triple_sets(v2)
    deltas = spark.read.parquet(out).collect()
    by_url = {}
    for r in deltas:
        by_url.setdefault(r["url"], []).append(r)

    changed_urls = {r["url"] for r in v1.where(changed).collect()}
    for url in set(t1) | set(t2) | set(by_url):
        rows = by_url.get(url, [])
        plus1 = {(r["subj"], r["pred"], r["obj"])
                 for r in rows if r["crawl_seq"] == 1 and r["op"] == "+"}
        assert plus1 == t1.get(url, set()), f"{url}: first crawl adds"
        assert not [r for r in rows
                    if r["crawl_seq"] == 1 and r["op"] == "-"]
        seq2 = [r for r in rows if r["crawl_seq"] == 2]
        if url not in changed_urls:
            assert not seq2, f"{url}: unchanged page must emit nothing"
            continue
        minus2 = {(r["subj"], r["pred"], r["obj"])
                  for r in seq2 if r["op"] == "-"}
        plus2 = {(r["subj"], r["pred"], r["obj"])
                 for r in seq2 if r["op"] == "+"}
        assert minus2 == t1.get(url, set()) - t2.get(url, set())
        assert plus2 == t2.get(url, set()) - t1.get(url, set())
        # replaying deltas over v1 reconstructs v2 exactly
        assert (t1.get(url, set()) - minus2) | plus2 == t2.get(url, set())

    # at least one url must have real retraction work, or the test is vacuous
    assert any(r["op"] == "-" for r in deltas)

    # restart on the same checkpoint + unchanged source: no new deltas
    n_before = len(deltas)
    incremental_recrawl_diff(spark, src, out, ck).awaitTermination(300)
    assert spark.read.parquet(out).count() == n_before

    # MERGE closes the loop: applying ALL deltas to an empty store must
    # reconstruct exactly the v2 triple store (last op per key wins)
    from ehr_relation_extraction_spark.streaming.stateful import (
        apply_triple_deltas)

    empty = spark.createDataFrame(
        [], "url string, subj string, pred string, obj string")
    merged = {(r["url"], r["subj"], r["pred"], r["obj"])
              for r in apply_triple_deltas(
                  empty, spark.read.parquet(out)).collect()}
    want = {(u, s, p, o) for u, ts in t2.items() for (s, p, o) in ts}
    assert merged == want


def test_incremental_corpus_gate(spark, tmp_path):
    """Streaming corpus export gate: first-seen sha dedup across
    micro-batches + batch-identical quality rules + stream-static
    decontamination join; idempotent under checkpoint restart."""
    from pyspark.sql import functions as F

    from ehr_relation_extraction_spark.sources.pages import (HTML_PREFIX,
                                                              HTML_SUFFIX)
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_corpus_gate)

    def page(doc_id, text):
        html = (HTML_PREFIX + text + HTML_SUFFIX).encode()
        return (doc_id, f"https://h.example.com/{doc_id}",
                None, html, "en")

    good = ("the quick brown fox jumps over a lazy dog and then "
            "the small grey cat walks under a tall green tree today")
    contaminated = ("we observe that the model of the corpus and the "
                    "gate of a pipeline are in the table of a report "
                    "with the value of a key in the line of a row")
    pages1 = [page(100, good), page(101, "tiny doc"),
              page(102, contaminated)]
    pages2 = [page(200, good)]  # exact dup of 100, later batch
    schema = ("doc_id long, url string, warc_ts timestamp, "
              "html binary, lang string")
    src = str(tmp_path / "gate_src")
    spark.createDataFrame(pages1, schema).write.mode("append").parquet(src)
    spark.createDataFrame(pages2, schema).write.mode("append").parquet(src)

    # contamination reference: doc_id=3 hashes into the TEST split and
    # carries the contaminated text, so its 8-grams are the eval set
    ref = spark.createDataFrame(
        [(3, contaminated, "en", "src0", 0)],
        "doc_id long, text string, lang string, source string, n_chars long")

    out, ck = str(tmp_path / "gate_out"), str(tmp_path / "gate_ck")
    incremental_corpus_gate(spark, src, ref, out, ck).awaitTermination(300)

    got = {r["doc_id"]: (r["keep"], r["reason"])
           for r in spark.read.parquet(out).collect()}
    assert got[100] == (1, "ok")
    assert got[101] == (0, "too_short")
    assert got[102] == (0, "contaminated")
    assert got[200] == (0, "duplicate")   # cross-batch first-seen gate

    # restart on the same checkpoint: no re-emission
    n = spark.read.parquet(out).count()
    incremental_corpus_gate(spark, src, ref, out, ck).awaitTermination(300)
    assert spark.read.parquet(out).count() == n


def test_recrawl_diff_same_second_version_not_dropped():
    """Regression: two re-crawls inside the same SECOND must both be
    processed (whole-second truncation used to drop the newer one and
    its deltas forever).  Exercised at the group-kernel level with a
    fake GroupState."""
    import pandas as pd

    from ehr_relation_extraction_spark.streaming import stateful as st

    class FakeState:
        exists = False

        def update(self, v):
            self.exists, self._v = True, v

        @property
        def get(self):
            return self._v

    from ehr_relation_extraction_spark.oracle.fixtures import make_pages

    pages = make_pages(42, 4)   # docs 2 and 3 emit triples
    t1, t2 = pages[2]["text"], pages[3]["text"]
    base = pd.Timestamp("2024-01-03 10:00:00.250")
    later = pd.Timestamp("2024-01-03 10:00:00.750")  # same whole second
    state = FakeState()
    out1 = list(st._diff_group(
        ("u",), iter([pd.DataFrame({"url": ["u"], "warc_ts": [base],
                                    "text": [t1]})]), state))
    assert out1 and (out1[0]["op"] == "+").any()
    out2 = list(st._diff_group(
        ("u",), iter([pd.DataFrame({"url": ["u"], "warc_ts": [later],
                                    "text": [t2]})]), state))
    ops = pd.concat(out2) if out2 else pd.DataFrame(columns=["op"])
    # the changed same-second version must emit +/- deltas
    assert len(ops) > 0, "same-second re-crawl was silently dropped"
    assert set(ops["op"]) <= {"+", "-"} and (ops["crawl_seq"] == 2).all()


def test_corpus_gate_with_frozen_model_weights(spark, tmp_path):
    """Train-in-batch / score-in-stream: the gate's learned verdict
    columns are bit-identical to batch score_quality on the same
    text."""
    from ehr_relation_extraction_spark.functions.quality_model import (
        quality_training_frame, score_quality, train_quality_classifier,
        with_features)
    from ehr_relation_extraction_spark.functions.textstats import (
        quality_features)
    from ehr_relation_extraction_spark.sources.pages import (HTML_PREFIX,
                                                              HTML_SUFFIX)
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_corpus_gate)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = train_quality_classifier(quality_training_frame(docs), epochs=10)

    good = ("the quick brown fox jumps over a lazy dog and then "
            "the small grey cat walks under a tall green tree today")
    texts = {300: good, 301: "tiny doc"}
    pages = [(d, f"https://h.example.com/{d}", None,
              (HTML_PREFIX + t + HTML_SUFFIX).encode(), "en")
             for d, t in texts.items()]
    src = str(tmp_path / "mgate_src")
    spark.createDataFrame(
        pages, "doc_id long, url string, warc_ts timestamp, "
               "html binary, lang string").write.parquet(src)
    ref = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, "
            "n_chars long")
    out, ck = str(tmp_path / "mgate_out"), str(tmp_path / "mgate_ck")
    incremental_corpus_gate(spark, src, ref, out, ck,
                            model_weights=w).awaitTermination(300)

    got = {r["doc_id"]: (r["model_pred_keep"], r["model_margin_micro6"])
           for r in spark.read.parquet(out).collect()}
    batch = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string")
    want = {r["doc_id"]: (r["pred_keep"], r["margin_micro6"])
            for r in score_quality(
                with_features(quality_features(batch)), w).collect()}
    assert got == want
    assert got[301][0] == 0  # the learned gate also rejects tiny docs


def test_incremental_passage_dedup(spark, tmp_path):
    """A passage syndicated in a LATER micro-batch is flagged
    duplicate; unique passages stay canonical; restart on the same
    checkpoint re-emits nothing."""
    from ehr_relation_extraction_spark.sources.pages import (HTML_PREFIX,
                                                              HTML_SUFFIX)
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_passage_dedup)

    shared = " ".join(f"w{i}" for i in range(20))
    uniq_a = " ".join(f"a{i}" for i in range(20))
    uniq_b = " ".join(f"b{i}" for i in range(20))

    def page(doc_id, text):
        html = (HTML_PREFIX + text + HTML_SUFFIX).encode()
        return (doc_id, f"https://h.example.com/{doc_id}", None, html, "en")

    schema = ("doc_id long, url string, warc_ts timestamp, "
              "html binary, lang string")
    src = str(tmp_path / "pd_src")
    spark.createDataFrame([page(0, shared + " " + uniq_a)],
                          schema).write.mode("append").parquet(src)
    spark.createDataFrame([page(1, shared + " " + uniq_b)],
                          schema).write.mode("append").parquet(src)

    out, ck = str(tmp_path / "pd_out"), str(tmp_path / "pd_ck")
    incremental_passage_dedup(spark, src, out, ck).awaitTermination(300)

    got = {(r["doc_id"], r["win_start"]): r["is_first"]
           for r in spark.read.parquet(out).collect()}
    firsts = {k for k, v in got.items() if v == 1}
    dups = {k for k, v in got.items() if v == 0}
    # exactly one of the two window-0 (shared passage) rows is first
    assert ({(0, 0), (1, 0)} & firsts) and ({(0, 0), (1, 0)} & dups)
    # the doc-unique windows are all canonical
    assert got[(0, 20)] == 1 and got[(1, 20)] == 1

    n = spark.read.parquet(out).count()
    incremental_passage_dedup(spark, src, out, ck).awaitTermination(300)
    assert spark.read.parquet(out).count() == n


def test_incremental_substring_cut(spark, tmp_path):
    """The streaming stride-1 exact cut (round-4 verdict item 6): an
    L-token block syndicated in a LATER run (fresh process, state
    restored from checkpoint) is cut from the late arrival while the
    first holder stays intact; verdicts equal the batch operator's;
    restart with no new files re-emits nothing."""
    from ehr_relation_extraction_spark.operators.substrings import (
        cut_substring_dups)
    from ehr_relation_extraction_spark.sources.pages import (HTML_PREFIX,
                                                              HTML_SUFFIX)
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_substring_cut)

    block = " ".join(f"q{i}" for i in range(25))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    text0 = block + " " + uniq_a
    text1 = uniq_b + " " + block

    def page(doc_id, text):
        html = (HTML_PREFIX + text + HTML_SUFFIX).encode()
        return (doc_id, f"https://h.example.com/{doc_id}", None, html, "en")

    schema = ("doc_id long, url string, warc_ts timestamp, "
              "html binary, lang string")
    src = str(tmp_path / "sc_src")
    out, ck = str(tmp_path / "sc_out"), str(tmp_path / "sc_ck")

    # run 1: only the original holder exists
    spark.createDataFrame([page(0, text0)], schema) \
        .write.mode("append").parquet(src)
    incremental_substring_cut(spark, src, out, ck).awaitTermination(300)
    got = {r["doc_id"]: (r["text_clean"], r["n_cut_tokens"])
           for r in spark.read.parquet(out).collect()}
    assert got == {0: (text0, 0)}

    # run 2 (the "days later" recrawl): doc 1 syndicates the block —
    # cut via state restored from the checkpoint, doc 0 not re-emitted
    spark.createDataFrame([page(1, text1)], schema) \
        .write.mode("append").parquet(src)
    incremental_substring_cut(spark, src, out, ck).awaitTermination(300)
    got = {r["doc_id"]: (r["text_clean"], r["n_cut_tokens"])
           for r in spark.read.parquet(out).collect()}
    assert got[1] == (uniq_b, 25)

    # stream == batch: same verdicts as the batch exact cut over the
    # union corpus (keeper = min doc_id = arrival order here)
    batch = spark.createDataFrame(
        [(0, text0), (1, text1)], "doc_id long, text string")
    want = {r["doc_id"]: (r["text_clean"], r["n_cut_tokens"])
            for r in cut_substring_dups(batch, min_len=20).collect()}
    assert got == want

    # idempotent restart: no new files -> no new rows
    n = spark.read.parquet(out).count()
    incremental_substring_cut(spark, src, out, ck).awaitTermination(300)
    assert spark.read.parquet(out).count() == n


def test_substring_cut_ttl_evicts_idle_hashes(spark, tmp_path):
    """Processing-time TTL on the streaming substring cut: window-hash
    state idle past the TTL is evicted by the running query's timers,
    so a block syndicated AFTER a long quiet period is re-admitted
    uncut (the documented bounded-staleness contract — state is the
    active-hash set, not hashes-ever-seen)."""
    import glob
    import time

    from pyspark.errors.exceptions.captured import AnalysisException
    from ehr_relation_extraction_spark.sources.pages import (HTML_PREFIX,
                                                              HTML_SUFFIX)
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_substring_cut)

    block = " ".join(f"t{i}" for i in range(25))
    text0 = block + " " + " ".join(f"a{i}" for i in range(10))
    text1 = " ".join(f"b{i}" for i in range(10)) + " " + block

    def page(doc_id, text):
        html = (HTML_PREFIX + text + HTML_SUFFIX).encode()
        return (doc_id, f"https://h.example.com/{doc_id}", None, html, "en")

    schema = ("doc_id long, url string, warc_ts timestamp, "
              "html binary, lang string")
    src = str(tmp_path / "scttl_src")
    out = str(tmp_path / "scttl_out")

    def rows(expect, deadline=120):
        t0 = time.time()
        while time.time() - t0 < deadline:
            if glob.glob(f"{out}/*.parquet"):
                try:
                    got = {r["doc_id"]: (r["text_clean"],
                                         r["n_cut_tokens"])
                           for r in spark.read.parquet(out).collect()}
                except AnalysisException:
                    got = {}
                if len(got) >= expect:
                    return got
            time.sleep(1)
        raise AssertionError(f"timed out waiting for {expect} docs")

    spark.createDataFrame([page(0, text0)], schema) \
        .write.mode("append").parquet(src)
    q = incremental_substring_cut(spark, src, out,
                                  str(tmp_path / "scttl_ck"),
                                  ttl_ms=100)
    try:
        assert rows(1)[0] == (text0, 0)
        time.sleep(3)  # idle >> TTL: the window hashes evict
        spark.createDataFrame([page(1, text1)], schema) \
            .write.mode("append").parquet(src)
        got = rows(2)
        # evicted hashes re-admit the repeat: doc 1 arrives UNCUT
        assert got[1] == (text1, 0)
    finally:
        q.stop()


def test_incremental_winnow_dedup(spark, tmp_path):
    """A token run syndicated in a later micro-batch shares a
    winnow fingerprint flagged is_first=0; the per-doc streaming
    fingerprint SET equals the batch operator's; restart on the
    same checkpoint re-emits nothing."""
    from ehr_relation_extraction_spark.sources.pages import (
        HTML_PREFIX, HTML_SUFFIX)
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_winnow_dedup)

    shared = "alpha beta gamma delta epsilon zeta"
    t0 = "one two three " + shared + " four five six seven"
    t1 = "red green blue " + shared + " cyan magenta yellow pink"

    def page(doc_id, text):
        html = (HTML_PREFIX + text + HTML_SUFFIX).encode()
        return (doc_id, f"https://h.example.com/{doc_id}", None,
                html, "en")

    schema = ("doc_id long, url string, warc_ts timestamp, "
              "html binary, lang string")
    src = str(tmp_path / "wn_src")
    spark.createDataFrame([page(0, t0)], schema) \
        .write.mode("append").parquet(src)
    spark.createDataFrame([page(1, t1)], schema) \
        .write.mode("append").parquet(src)

    out, ck = str(tmp_path / "wn_out"), str(tmp_path / "wn_ck")
    incremental_winnow_dedup(spark, src, out, ck).awaitTermination(300)

    rows = spark.read.parquet(out).collect()
    # streaming fingerprint set == batch operator's per doc
    from ehr_relation_extraction_spark.operators.dedup import (
        winnow_dups)
    docs = spark.createDataFrame(
        [(0, t0, "en", "s", 1), (1, t1, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    pair = winnow_dups(docs).collect()[0]
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert len(per_doc[0]) == pair.n_a
    assert len(per_doc[1]) == pair.n_b
    shared_fps = per_doc[0] & per_doc[1]
    assert len(shared_fps) == pair.n_shared >= 1
    # each shared fingerprint: exactly one first, one dup
    verdicts = {}
    for r in rows:
        verdicts.setdefault(r["fp"], []).append(r["is_first"])
    for fp in shared_fps:
        assert sorted(verdicts[fp]) == [0, 1]
    # doc-unique fingerprints are all canonical
    for fp in (per_doc[0] ^ per_doc[1]):
        assert verdicts[fp] == [1]

    n = spark.read.parquet(out).count()
    incremental_winnow_dedup(spark, src, out, ck).awaitTermination(300)
    assert spark.read.parquet(out).count() == n
