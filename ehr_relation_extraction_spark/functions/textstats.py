"""Text analysis columns: token counts, quality features, language-id,
document fingerprints.  All built-in JVM expressions (codegen) —
integer outputs for cross-engine stability.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from ..config import STOPWORDS


def _toks():
    return F.filter(F.split(F.col("text"), "[\n \t]"), lambda t: t != "")


def quality_features(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, n_distinct_tokens, n_stopwords,
    avg_token_len_x100): the classic length/stopword/diversity quality
    signals as integers."""
    toks = _toks()
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(toks)
    sum_len = F.aggregate(F.transform(toks, lambda t: F.length(t)),
                          F.lit(0), lambda a, b: a + b)
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
            .cast("long").alias("n_stopwords"),
        F.when(n > 0, F.floor(F.lit(100) * sum_len / n)).otherwise(F.lit(0))
            .cast("long").alias("avg_token_len_x100"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language id: predict 'en' when stopword density is
    high (n-gram/stopword-profile heuristic in its simplest integer
    form): 20 * n_stopwords >= n_tokens -> 'en' else 'unk'.
    Output: (doc_id, lang, pred_lang, is_match)."""
    q = quality_features(docs).select("doc_id", "n_tokens", "n_stopwords")
    out = docs.select("doc_id", "lang").join(q, "doc_id")
    pred = F.when(F.lit(20) * F.col("n_stopwords") >= F.col("n_tokens"),
                  F.lit("en")).otherwise(F.lit("unk"))
    return (out.withColumn("pred_lang", pred)
            .withColumn("is_match", (F.col("pred_lang") == F.col("lang")).cast("int"))
            .select("doc_id", "lang", "pred_lang", "is_match"))


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_ish): whitespace tokens vs a
    BPE-ish sub-token count (alnum runs + single non-alnum marks) —
    the standard cheap token estimator.  Expressed via
    ``regexp_extract_all`` run-counting (portable: RE2 oracles have no
    lookaround)."""
    toks = _toks()
    runs = F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9A-Za-z]+"), 0))
    marks = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^0-9A-Za-z \n\t]"), 0))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_ws_tokens"),
        (runs + marks).cast("long").alias("n_bpe_ish"),
    )


def top_terms_tfidf(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-doc top-k terms by tf-idf:
    (doc_id, rank, term, tf, df, tfidf_micro6).

    tf = in-doc count, df = docs containing the term, idf = ln(N/df).
    Two aggregates + a broadcast-sized term-df join; ranking uses the
    floor-scaled score with the term as tie-break so ordering is
    deterministic cross-engine."""
    toks = docs.select("doc_id", F.explode(_toks()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"))
    df_ = (toks.dropDuplicates(["doc_id", "term"])
           .groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df")))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n")).first()["n"]
    scored = tf.join(df_, "term").withColumn(
        "tfidf_micro6",
        F.floor(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
                * 1000000).cast("long"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_micro6").desc(), F.col("term"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("doc_id", "rank", "term", "tf", "df", "tfidf_micro6"))


def cooccurrence_pmi(docs: DataFrame, min_len: int = 3,
                     min_docs_ab: int = 5) -> DataFrame:
    """Document-level token co-occurrence with integer PMI-ratio
    scoring: (tok_a, tok_b, n_docs_a, n_docs_b, n_docs_ab,
    pmi_ratio_micro6) where pmi_ratio = P(a,b) / (P(a) P(b)) =
    n_docs_ab * N / (n_docs_a * n_docs_b), floor-scaled by 1e6 with
    exact integer division (``div``) — a monotonic transform of PMI,
    so rankings match, with zero float drift cross-engine.

    Scale shape: distinct-token explode (map-side), one self-join on
    doc_id producing a<b pairs (bounded by per-doc distinct-token
    count, like the reference's per-shard pair product), two joins
    against the token document-frequency table, and the
    ``min_docs_ab`` support filter pruning the long tail before any
    wide output materializes.
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.filter(
            F.transform(_toks(), lambda t: F.lower(t)),
            lambda t: F.length(t) >= min_len))).alias("tok"))
    df_tok = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_tok"))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n")).first()["n"]
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                    & (F.col("a.tok") < F.col("b.tok")))
             .groupBy(F.col("a.tok").alias("tok_a"),
                      F.col("b.tok").alias("tok_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_docs_ab"))
             .where(F.col("n_docs_ab") >= min_docs_ab))
    out = (pairs
           .join(df_tok.select(F.col("tok").alias("tok_a"),
                               F.col("n_docs_tok").alias("n_docs_a")), "tok_a")
           .join(df_tok.select(F.col("tok").alias("tok_b"),
                               F.col("n_docs_tok").alias("n_docs_b")), "tok_b"))
    return out.select(
        "tok_a", "tok_b", "n_docs_a", "n_docs_b", "n_docs_ab",
        F.expr(f"(n_docs_ab * {n_docs} * 1000000) div (n_docs_a * n_docs_b)")
         .cast("long").alias("pmi_ratio_micro6"))


def split_expr(train_pct: int = 80, dev_pct: int = 10):
    """The split as a pure COLUMN EXPRESSION of doc_id — attach it
    anywhere without a join or an extra scan (it's a deterministic
    hash, not a lookup)."""
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 31, 2),
        16, 10).cast("int")
    tr = int(256 * train_pct / 100)
    dv = int(256 * (train_pct + dev_pct) / 100)
    split = (F.when(bucket < tr, F.lit("train"))
             .when(bucket < dv, F.lit("dev"))
             .otherwise(F.lit("test")))
    return bucket, split


def train_dev_test_split(docs: DataFrame, train_pct: int = 80,
                         dev_pct: int = 10) -> DataFrame:
    """Deterministic corpus split (SURVEY §2.7: the reference's
    order-dependent fractional slice, generate_data.py:204-206, made
    partition-stable): md5 bucket of doc_id -> train/dev/test.  Never
    ``randomSplit`` (non-reproducible across partitionings).
    Output: (doc_id, bucket, split)."""
    bucket, split = split_expr(train_pct, dev_pct)
    return docs.select("doc_id", bucket.alias("bucket"),
                       split.alias("split"))


def _bigram_pairs(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) adjacent lowercased token pairs, one row per
    occurrence (one shuffle on doc_id for the lead window)."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.transform(_toks(), lambda t: F.lower(t)))
        .alias("tok_idx", "w1"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("tok_idx")
    return (toks.withColumn("w2", F.lead("w1").over(w))
            .where(F.col("w2").isNotNull()))


def bigram_lm(docs: DataFrame, min_count: int = 5) -> DataFrame:
    """Bigram language-model counts over the corpus:
    (w1, w2, c_bigram, c_w1, p_micro6) with p(w2|w1) =
    c(w1,w2) / c(w1 as predecessor), exact integer division.

    Shape: per-doc adjacent pairs via a lead window on token position
    (one shuffle on doc_id — at scale the tokens already arrive
    partitioned by doc from the tokenize stage), then a global count
    shuffle on the bigram key; ``min_count`` prunes the tail before
    the output materializes."""
    pairs = _bigram_pairs(docs)
    big = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_bigram"))
    uni = pairs.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("c_w1"))
    return (big.where(F.col("c_bigram") >= min_count)
            .join(uni, "w1")
            .select("w1", "w2", "c_bigram", "c_w1",
                    F.expr("(c_bigram * 1000000) div c_w1")
                     .cast("long").alias("p_micro6")))


def source_stats(docs: DataFrame) -> DataFrame:
    """Per-source corpus statistics with EXACT discrete percentiles:
    doc count, total tokens, p50/p90 token counts.  The percentile is
    the value at sorted index floor((n-1)*q) — selected by window rank,
    never a float `percentile()` (not cross-engine stable) and never a
    per-source collect (a 100 TB source has billions of docs; the
    window sort is a shuffle, not a driver materialization).
    Output: (source, n_docs, total_tokens, p50_tokens, p90_tokens)."""
    from pyspark.sql import Window

    d = docs.select("source", F.size(_toks()).cast("long").alias("n_tok"))
    w = Window.partitionBy("source").orderBy("n_tok")
    wa = Window.partitionBy("source")
    r = (d.withColumn("rn", F.row_number().over(w) - 1)
         .withColumn("cnt", F.count(F.lit(1)).over(wa))
         .withColumn("tot", F.sum("n_tok").over(wa)))
    return (r.groupBy("source")
            .agg(F.max("cnt").cast("long").alias("n_docs"),
                 F.max("tot").cast("long").alias("total_tokens"),
                 F.max(F.when(F.col("rn") == F.expr("((cnt - 1) * 50) div 100"),
                              F.col("n_tok"))).cast("long").alias("p50_tokens"),
                 F.max(F.when(F.col("rn") == F.expr("((cnt - 1) * 90) div 100"),
                              F.col("n_tok"))).cast("long").alias("p90_tokens")))


def lm_quality(docs: DataFrame, min_count: int = 5) -> DataFrame:
    """LM-based quality scoring (the CCNet-style filter, float-free):
    score each document by the MEAN corpus-bigram-LM probability of
    its adjacent token pairs — fluent in-distribution text scores
    high, gibberish and OOV-heavy text scores low.  Bigrams pruned
    from the LM (count < min_count) contribute 0.  Exact integers
    throughout (mean of p_micro6 by integer division) so both engines
    agree bit-for-bit — a deliberate alternative to log-perplexity,
    whose libm ln() is not cross-engine stable.

    Shape: the pruned LM is vocabulary-sized — broadcast side of the
    join; pairs aggregate per doc immediately.
    Output: (doc_id, n_pairs, n_oov, lm_score_micro6)."""
    lm = bigram_lm(docs, min_count).select("w1", "w2", "p_micro6")
    pairs = _bigram_pairs(docs)
    scored = pairs.join(F.broadcast(lm), ["w1", "w2"], "left")
    agg = (scored.groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.count(F.when(F.col("p_micro6").isNull(), 1))
                .cast("long").alias("n_oov"),
                F.sum(F.coalesce("p_micro6", F.lit(0)))
                .cast("long").alias("_sum")))
    return (docs.select("doc_id").join(agg, "doc_id", "left")
            .fillna(0, ["n_pairs", "n_oov", "_sum"])
            .withColumn("lm_score_micro6",
                        F.when(F.col("n_pairs") > 0,
                               F.expr("_sum div n_pairs"))
                        .otherwise(F.lit(0)).cast("long"))
            .drop("_sum"))


def corpus_curation(docs: DataFrame) -> DataFrame:
    """Training-data curation gate: compose the dedup canonical flag
    with the quality/language heuristics into one keep/drop verdict
    per document — the filter a 100 TB pre-training pipeline runs
    before tokenization.  Rule precedence (first failure wins):
    duplicate > too_short > low_diversity > not_english.

    Output: (doc_id, n_tokens, keep, reason)."""
    from ..operators.dedup import exact_dedup

    q = quality_features(docs).select(
        "doc_id", "n_tokens", "n_distinct_tokens", "n_stopwords")
    canon = exact_dedup(docs).select("doc_id", "is_canonical")
    j = q.join(canon, "doc_id")
    reason = (F.when(F.col("is_canonical") == 0, F.lit("duplicate"))
              .when(F.col("n_tokens") < 20, F.lit("too_short"))
              .when(F.col("n_distinct_tokens") * 100
                    < F.col("n_tokens") * 35, F.lit("low_diversity"))
              .when(F.lit(20) * F.col("n_stopwords") < F.col("n_tokens"),
                    F.lit("not_english"))
              .otherwise(F.lit("ok")))
    return j.select(
        "doc_id", "n_tokens",
        (reason == "ok").cast("int").alias("keep"),
        reason.alias("reason"))


def repetition_features(docs: DataFrame, k: int = 3) -> DataFrame:
    """Repetition quality signal (the Gopher-style duplicate-n-gram
    filter): per doc, total vs distinct token k-grams and the
    duplicate fraction as a scaled integer.  Highly repetitive pages
    (boilerplate, keyword stuffing, generation loops) score high and
    get dropped by curation.

    All JVM-side (split + transform + one groupBy on doc_id — at scale
    this is a map-side-combinable aggregation, no wide shuffle).
    Output: (doc_id, n_grams, n_distinct_grams, dup_frac_micro6)."""
    toks = _toks()
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    g = docs.select("doc_id", F.explode(grams).alias("gram"))
    agg = g.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.countDistinct("gram").cast("long").alias("n_distinct_grams"))
    return (docs.select("doc_id").join(agg, "doc_id", "left")
            .fillna(0, ["n_grams", "n_distinct_grams"])
            .withColumn(
                "dup_frac_micro6",
                F.when(F.col("n_grams") > 0,
                       F.expr("((n_grams - n_distinct_grams) * 1000000)"
                              " div n_grams"))
                .otherwise(F.lit(0)).cast("long")))


def decontaminate(docs: DataFrame, k: int = 8,
                  train_pct: int = 80, dev_pct: int = 10) -> DataFrame:
    """Train/test n-gram decontamination — the eval-leakage filter a
    pre-training pipeline runs before export (GPT-3 appendix C style:
    a train document is contaminated if it shares any k-token n-gram
    with an eval/test document).

    Shape at scale: both sides reduce to DISTINCT (doc, shingle) rows,
    then ONE left hash join on the shingle key with totals and hits
    fused into a single per-train-doc aggregation.  The split is a
    pure hash of doc_id (``split_expr``), attached as a column — no
    split join, no extra scan.  The test split is the small side
    (~10%) — Spark/AQE broadcasts it when it fits, else it's a plain
    shuffle join keyed by shingle; no doc x doc pair set ever
    materializes.

    Output per TRAIN doc: (doc_id, n_ngrams, n_contaminated,
    n_test_docs, contaminated)."""
    from ..operators.dedup import shingles

    _, split = split_expr(train_pct, dev_pct)
    sh = shingles(docs, k).withColumn("_split", split)
    train_sh = sh.where(F.col("_split") == "train").select(
        "doc_id", "shingle")
    test_sh = sh.where(F.col("_split") == "test").select(
        F.col("doc_id").alias("test_doc"), "shingle")
    agg = (train_sh.join(test_sh, "shingle", "left")
           .groupBy("doc_id")
           .agg(F.countDistinct("shingle").cast("long").alias("n_ngrams"),
                F.countDistinct(
                    F.when(F.col("test_doc").isNotNull(),
                           F.col("shingle"))).cast("long")
                .alias("n_contaminated"),
                F.countDistinct("test_doc").cast("long")
                .alias("n_test_docs")))
    train_docs = docs.select("doc_id").where(split == "train")
    return (train_docs
            .join(agg, "doc_id", "left")
            .fillna(0, ["n_ngrams", "n_contaminated", "n_test_docs"])
            .withColumn("contaminated",
                        (F.col("n_contaminated") > 0).cast("int")))


def mixture_sample(docs: DataFrame, rates: dict | None = None,
                   default_pct: int | None = None) -> DataFrame:
    """Training-mixture sampling: keep each source's documents at its
    configured mixture percentage (MIXTURE_RATES) via a stable md5
    bucket of (source, doc_id) — the deterministic form of the "30%
    web, 50% books" mixture weights a pre-training run pins.  Never
    ``rand()``: the sample is identical under repartition, retries and
    re-runs, and fully map-side (no shuffle at all).

    Output: every doc with its (bucket, rate_pct, kept) verdict so the
    realized mixture is auditable."""
    from ..config import MIXTURE_DEFAULT_PCT, MIXTURE_RATES

    rates = MIXTURE_RATES if rates is None else rates
    default_pct = MIXTURE_DEFAULT_PCT if default_pct is None else default_pct
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws(
            ":", F.col("source"), F.col("doc_id").cast("string"))), 31, 2),
        16, 10).cast("int")
    rate = F.lit(default_pct)
    for s, p in sorted(rates.items()):
        rate = F.when(F.col("source") == s, F.lit(p)).otherwise(rate)
    return docs.select(
        "doc_id", "source", bucket.alias("bucket"),
        rate.cast("int").alias("rate_pct"),
        (bucket < F.floor(rate * 256 / 100)).cast("int").alias("kept"))


def pack_sequences(docs: DataFrame, seq_len: int = 128,
                   shard_docs: int = 65536) -> DataFrame:
    """GPT-style sequence packing: concatenate each source's documents
    (ordered by doc_id) into one token stream and cut it into
    fixed-length training sequences, docs spanning cuts split across
    them.  Closed form — per-source cumulative token offsets map every
    doc onto the absolute stream, and the sequences a doc touches are
    floor(start/L)..floor((end-1)/L) — so packing is a window cumsum +
    an explode, never a sequential loop.

    Scale shape: TWO-LEVEL cumsum.  A single per-source window would
    sort-serialize the realistic case where one source dominates (a
    web crawl is one "source"), so the stream is cut into contiguous
    doc_id blocks of ``shard_docs`` (shard = doc_id // shard_docs —
    monotone in doc_id, so (shard, doc_id) order IS doc_id order and
    the output is bit-identical to the single-window form):

      level 1: cumsum within (source, shard) — parallel across shards;
      level 2: per-source running offset over the per-shard totals
               (#shards rows, tiny) joined back on (source, shard),
               the same keys level 1 shuffled on — no extra exchange.

    Everything else is per-row arithmetic in codegen.

    Output: one row per (doc, sequence) overlap with both coordinate
    systems — (source, seq_id, doc_id, doc_tok_start, doc_tok_end,
    seq_tok_start, seq_tok_end, n_tokens)."""
    from pyspark.sql import Window

    n = F.size(_toks())
    base = (docs.select("source", "doc_id", n.alias("n_doc"))
            .withColumn("shard",
                        F.floor(F.col("doc_id") / shard_docs).cast("long")))
    w_local = (Window.partitionBy("source", "shard").orderBy("doc_id")
               .rowsBetween(Window.unboundedPreceding, -1))
    w_shard = (Window.partitionBy("source").orderBy("shard")
               .rowsBetween(Window.unboundedPreceding, -1))
    shard_off = (base.groupBy("source", "shard")
                 .agg(F.sum("n_doc").cast("long").alias("shard_n"))
                 .withColumn("shard_off",
                             F.coalesce(F.sum("shard_n").over(w_shard),
                                        F.lit(0)).cast("long"))
                 .select("source", "shard", "shard_off"))
    d = (base
         .withColumn("local_start",
                     F.coalesce(F.sum("n_doc").over(w_local),
                                F.lit(0)).cast("long"))
         .join(shard_off, ["source", "shard"])
         .withColumn("start",
                     (F.col("shard_off") + F.col("local_start")).cast("long"))
         .withColumn("end", (F.col("start") + F.col("n_doc")).cast("long"))
         .where(F.col("n_doc") > 0))
    seqs = F.sequence((F.col("start") / seq_len).cast("long"),
                      ((F.col("end") - 1) / seq_len).cast("long"))
    e = d.select("source", "doc_id", "n_doc", "start", "end",
                 F.explode(seqs).alias("seq_id"))
    lo = F.greatest(F.col("start"), F.col("seq_id") * seq_len)
    hi = F.least(F.col("end"), (F.col("seq_id") + 1) * seq_len)
    return e.select(
        "source", F.col("seq_id").cast("long").alias("seq_id"), "doc_id",
        (lo - F.col("start")).cast("long").alias("doc_tok_start"),
        (hi - F.col("start")).cast("long").alias("doc_tok_end"),
        (lo - F.col("seq_id") * seq_len).cast("long").alias("seq_tok_start"),
        (hi - F.col("seq_id") * seq_len).cast("long").alias("seq_tok_end"),
        (hi - lo).cast("long").alias("n_tokens"))


def corpus_export(docs: DataFrame, k: int = 8) -> DataFrame:
    """The final export gate of the training-data pipeline: a
    TRAIN-split document ships iff it passes the curation rules
    (duplicate > too_short > low_diversity > not_english) AND shares
    no k-gram with the eval split.  Rule precedence: curation reason
    first, then 'contaminated', else 'ok' — one verdict row per train
    doc: (doc_id, n_tokens, keep, reason)."""
    cur = corpus_curation(docs)
    dec = decontaminate(docs, k).select("doc_id", "contaminated")
    j = cur.join(dec, "doc_id")  # inner: decontaminate is train-only
    reason = (F.when(F.col("reason") != "ok", F.col("reason"))
              .when(F.col("contaminated") == 1, F.lit("contaminated"))
              .otherwise(F.lit("ok")))
    return j.select("doc_id", "n_tokens",
                    (reason == "ok").cast("int").alias("keep"),
                    reason.alias("reason"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint, n_shingles): rolling-hash doc fingerprint =
    min md5 over token 3-gram shingles (minhash with one permutation),
    plus the distinct shingle count."""
    from ..operators.dedup import shingles

    sh = shingles(docs, 3)
    return (sh.groupBy("doc_id")
            .agg(F.min(F.md5("shingle")).alias("fingerprint"),
                 F.count(F.lit(1)).cast("long").alias("n_shingles")))


def with_synth_lines(docs: DataFrame) -> DataFrame:
    """Wrap each doc's text in deterministic host-level nav/footer
    lines (the fixture corpus has no newlines, so the driver query
    synthesizes the line structure — both engines identically, like
    url_canonical's messy urls)."""
    wrapped = F.concat(
        F.lit("HOME | "), F.col("source"), F.lit(" | NAV\n"),
        F.col("text"),
        F.lit("\nCopyright 2024 "), F.col("source"), F.lit(" footer"))
    return docs.withColumn("text", wrapped)


def boilerplate_strip(docs: DataFrame, min_docs: int = 3,
                      frac_pct: int = 50) -> DataFrame:
    """Host-level line dedup — the CCNet/RefinedWeb boilerplate
    remover: a line occurring in >= ``min_docs`` docs AND >=
    ``frac_pct``% of a host's docs (nav bars, footers, cookie
    banners) is stripped from every doc of that host.

    Output: (doc_id, n_lines, n_boiler_lines, text_clean) where
    text_clean rejoins the surviving lines in order.

    Scale: two hash-aggregates (per-host doc counts, per-(host, line)
    doc counts — both map-side combinable) + one anti-join of the
    exploded lines against the boilerplate set, which is small (it is
    capped by lines shared across >= frac_pct of a host) and
    broadcastable per host at 100 TB; the rebuild is one grouped
    sort_array, shuffled once on doc_id.
    """
    lines = docs.select(
        "doc_id", "source",
        F.posexplode(F.split("text", "\n")).alias("line_idx", "line"))
    host_docs = docs.groupBy("source").agg(
        F.countDistinct("doc_id").alias("_host_n"))
    line_counts = lines.groupBy("source", "line").agg(
        F.countDistinct("doc_id").alias("_line_n"))
    boiler = (line_counts.join(host_docs, "source")
              .where((F.col("_line_n") >= min_docs)
                     & (F.lit(100) * F.col("_line_n")
                        >= F.lit(frac_pct) * F.col("_host_n")))
              .select("source", "line"))
    flagged = lines.join(F.broadcast(boiler.withColumn("_is_boiler", F.lit(1))),
                         ["source", "line"], "left")
    return (flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.coalesce("_is_boiler", F.lit(0))).cast("long")
            .alias("n_boiler_lines"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.when(
                    F.col("_is_boiler").isNull(),
                    F.struct("line_idx", "line")))),
                lambda s: s["line"]),
            "\n").alias("text_clean")))


#: deterministic 22-token shared passage for the passage-dedup fixture
#: (the synthetic corpus has no naturally repeated 20-token windows)
SYNTH_QUOTE = ("in the beginning the web was small and pages were few "
               "but crawlers grew and the corpus swelled beyond measure "
               "every day")


def with_synth_quote(docs: DataFrame) -> DataFrame:
    """Prepend the shared quote to every 7th doc — the deterministic
    duplicated-passage fixture (both engines wrap identically)."""
    return docs.withColumn(
        "text",
        F.when(F.pmod(F.col("doc_id"), F.lit(7)) == 0,
               F.concat(F.lit(SYNTH_QUOTE + " "), F.col("text")))
        .otherwise(F.col("text")))


def passage_windows(docs: DataFrame, win: int = 20,
                    stride: int = 10) -> DataFrame:
    """(doc_id, win_start, passage_hash): md5 of every win-token
    window at stride offsets, built from the per-doc token array —
    no join, streaming-safe (pure column expressions)."""
    toks = _toks()
    n = F.size(toks)
    starts = F.when(n >= win,
                    F.sequence(F.lit(0), n - win, F.lit(stride))) \
        .otherwise(F.array().cast("array<int>"))
    wins = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("win_start"),
            F.md5(F.array_join(F.slice(toks, s + 1, win), " "))
            .alias("passage_hash")))
    return (docs.select("doc_id", F.explode(wins).alias("w"))
            .select("doc_id",
                    F.col("w.win_start").cast("int").alias("win_start"),
                    F.col("w.passage_hash").alias("passage_hash")))


def passage_dups(docs: DataFrame, win: int = 20,
                 stride: int = 10) -> DataFrame:
    """Passage-level exact dedup (the windowed form of Lee et al.'s
    substring deduplication): hash every ``win``-token window at
    ``stride`` offsets; windows whose hash occurs in >= 2 docs are
    duplicated passages — quotes, syndicated paragraphs, licenses —
    that document-level near-dup misses because the surrounding text
    differs.

    Output: one row per occurrence of a duplicated window
    (doc_id, win_start, passage_hash, n_docs_sharing).

    Scale: windows are built from the token array per doc (no join);
    the only shuffle is the hash-count aggregate + the count-back
    join, both keyed on the 32-byte hash.  Window count is
    n_tokens/stride per doc — linear in corpus size with a small
    constant, the standard trade against full suffix arrays.
    """
    wh = passage_windows(docs, win, stride)
    cnt = (wh.groupBy("passage_hash")
           .agg(F.countDistinct("doc_id").cast("long")
                .alias("n_docs_sharing"))
           .where(F.col("n_docs_sharing") >= 2))
    return wh.join(cnt, "passage_hash").select(
        "doc_id", "win_start", "passage_hash", "n_docs_sharing")


def _island_id(w, win: int):
    """Island id for window-merge: running count of breaks, where a
    break is a gap > ``win`` tokens to the previous duplicated window
    (i.e. the two windows neither overlap nor touch).  Within an
    island the covered positions are therefore CONTIGUOUS, so each
    island is exactly one maximal duplicated region; islands are
    strictly disjoint (a break at gap > win puts the next span's
    start past the previous span's end)."""
    from pyspark.sql import Window as _W

    prev = F.lag("win_start").over(w)
    brk = F.when(prev.isNull()
                 | (F.col("win_start") - prev > F.lit(win)), 1) \
        .otherwise(0)
    return F.sum(brk).over(
        w.rowsBetween(_W.unboundedPreceding, _W.currentRow))


def duplicated_spans(docs: DataFrame, win: int = 20,
                     stride: int = 10) -> DataFrame:
    """Maximal duplicated TOKEN SPANS per doc — the span-merge step of
    Lee et al.'s substring dedup on top of :func:`passage_dups`:
    adjacent/overlapping duplicated windows of one doc coalesce into
    one maximal [span_start, span_end) token range, which is the unit
    a training pipeline actually masks or cuts (window-granular holes
    would shred the text).

    Gaps-and-islands over (doc_id, win_start): an island BREAK happens
    when the gap to the previous duplicated window is > ``win`` (the
    windows neither overlap nor touch), computed as a lag + running
    sum of break flags — two window functions + one aggregate, all
    keyed on doc_id.  Each emitted span is thus exactly one MAXIMAL
    CONTIGUOUS region of positions covered by duplicated windows, for
    ANY win/stride ratio: overlapping and abutting windows merge
    (round-4 fix — the old constant-stride rule both emitted
    overlapping spans for win > 2*stride and split abutting regions),
    so spans are strictly disjoint and token counts derived from them
    never double-count.  The
    flagged windows are a small fraction of the corpus (only
    duplicated ones), so this is a cheap postpass on passage_dups'
    output.

    Output: (doc_id, span_start, span_end, n_windows) with span_end =
    last win_start + win (token-exclusive end).
    """
    from pyspark.sql import Window

    dup = passage_dups(docs, win, stride).select("doc_id", "win_start") \
        .dropDuplicates()
    w = Window.partitionBy("doc_id").orderBy("win_start")
    return (dup.withColumn("_island", _island_id(w, win))
            .groupBy("doc_id", "_island")
            .agg(F.min("win_start").cast("int").alias("span_start"),
                 (F.max("win_start") + F.lit(win)).cast("int")
                 .alias("span_end"),
                 F.count(F.lit(1)).cast("long").alias("n_windows"))
            .select("doc_id", "span_start", "span_end", "n_windows"))


def merge_cut_windows(cut_wins: DataFrame, win: int) -> DataFrame:
    """(doc_id, win_start) cut windows -> (doc_id, _cuts) with _cuts a
    sorted array<struct<s,e>> of disjoint maximal token ranges — the
    gaps-and-islands merge of :func:`duplicated_spans`, packaged so
    the batch cut and its streaming twin share one span algebra."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("win_start")
    return (cut_wins
            .withColumn("_island", _island_id(w, win))
            .groupBy("doc_id", "_island")
            .agg(F.min("win_start").alias("s"),
                 (F.max("win_start") + F.lit(win)).alias("e"))
            .groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.struct("s", "e")))
                 .alias("_cuts")))


def apply_cut_spans(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """Rebuild (doc_id, text) with the token ranges in ``spans``
    (doc_id, _cuts from :func:`merge_cut_windows`) removed: a single
    higher-order ``filter`` over the token array against the per-doc
    ranges literal (one left join — no per-row Python).  Docs with no
    spans pass through with n_cut_tokens = 0."""
    toks = _toks()
    with_cuts = docs.join(spans, "doc_id", "left")
    kept = F.filter(
        F.zip_with(toks,
                   F.sequence(F.lit(0), F.size(toks) - 1),
                   lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda p: ~F.exists(F.col("_cuts"),
                            lambda c: (p["i"] >= c["s"])
                            & (p["i"] < c["e"])))
    return (with_cuts.withColumn(
        "_cuts", F.coalesce(F.col("_cuts"),
                            F.array().cast(
                                "array<struct<s:int,e:int>>")))
        .select("doc_id",
                F.array_join(F.transform(kept, lambda p: p["t"]), " ")
                .alias("text_clean"),
                F.aggregate(F.col("_cuts"), F.lit(0),
                            lambda acc, c: acc + (c["e"] - c["s"]))
                .cast("long").alias("n_cut_tokens")))


def cut_duplicated_spans(docs: DataFrame, win: int = 20,
                         stride: int = 10) -> DataFrame:
    """The CUT step of Lee-et-al substring dedup: rebuild each doc's
    text with its duplicated passages REMOVED, keeping each passage's
    globally-first occurrence (min doc_id per passage_hash) intact —
    dropping whole documents over one shared paragraph wastes data;
    cutting only the repeated span keeps the unique remainder.

    Mechanics (all JVM-side): per duplicated window, the min-doc_id
    holder is the keeper (one aggregate on passage_hash); non-keeper
    occurrences merge into maximal token spans per doc
    (gaps-and-islands via :func:`merge_cut_windows`); the rebuild is
    :func:`apply_cut_spans`.

    Output: (doc_id, text_clean, n_cut_tokens); docs with nothing cut
    pass through with n_cut_tokens = 0.
    """
    wh = passage_windows(docs, win, stride)
    keeper = wh.groupBy("passage_hash").agg(
        F.min("doc_id").alias("_keep_doc"),
        F.countDistinct("doc_id").alias("_n_docs"))
    cut_wins = (wh.join(keeper, "passage_hash")
                .where((F.col("_n_docs") >= 2)
                       & (F.col("doc_id") != F.col("_keep_doc")))
                .select("doc_id", "win_start").dropDuplicates())
    return apply_cut_spans(docs, merge_cut_windows(cut_wins, win))


def textrank_keywords(docs: DataFrame, window: int = 2,
                      n_iter: int = 5,
                      damping_pct: int = 85) -> DataFrame:
    """TextRank keyword scores (Mihalcea & Tarau, EMNLP'04): PageRank
    over the token co-occurrence graph — token nodes, an undirected
    edge per pair of tokens within ``window`` positions, edge weight =
    corpus-wide co-occurrence count.

    Composition, not a new engine: the co-occurrence edges come from
    ``lead()`` windows (one doc_id shuffle, NO token self-join), then
    :func:`..operators.graph_algos.pagerank_fixed` runs its integer
    fixed-point recurrence, so the score table is bit-exact
    cross-engine (the DuckDB oracle unrolls the same rounds) and
    partition-invariant.  Returns (token, rank_micro6) — corpus
    keywords are the top rank_micro6 rows; at 100 TB the graph is
    vocabulary-sized (edges bounded by distinct co-occurring pairs),
    tiny next to the corpus that produced it.
    """
    from pyspark.sql import Window

    from ..operators.graph_algos import pagerank_fixed

    w = Window.partitionBy("doc_id").orderBy("pos")
    toks = docs.select(
        "doc_id", F.posexplode(_toks()).alias("pos", "tok"))
    nbrs = toks.select("tok", F.array(
        *[F.lead("tok", k).over(w) for k in range(1, window + 1)]
    ).alias("_nbrs"))
    pair = (nbrs.select("tok", F.explode("_nbrs").alias("nbr"))
            .where(F.col("nbr").isNotNull()
                   & (F.col("nbr") != F.col("tok"))))
    und = (pair.select(F.least("tok", "nbr").alias("a"),
                       F.greatest("tok", "nbr").alias("b"))
           .groupBy("a", "b")
           .agg(F.count(F.lit(1)).cast("long").alias("weight")))
    sym = (und.select(F.col("a").alias("src"), F.col("b").alias("dst"),
                      "weight")
           .union(und.select(F.col("b").alias("src"),
                             F.col("a").alias("dst"), "weight")))
    return (pagerank_fixed(sym, damping_pct=damping_pct, n_iter=n_iter)
            .select(F.col("node").alias("token"), "rank_micro6"))


def bm25_entity_retrieval(docs: DataFrame, terms: DataFrame,
                          k: int = 10) -> DataFrame:
    """BM25 (Robertson et al., TREC-3) document ranking for a bounded
    probe-term set — entity retrieval: "which documents best attest
    this KG surface form?"  (term, rank, doc_id, tf, dl,
    score_micro6), top-``k`` docs per term.

    k1 = 1.2 and b = 0.75 are kept as EXACT rationals (6/5, 3/4), so
    the tf saturation term needs no floats: with T = total corpus
    tokens and N = n_docs,

        tf_part = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
                = 44*T*tf / (20*T*tf + 6*T + 18*dl*N)      (avgdl = T/N)

    and score_micro6 = idf_micro6 * 44*T*tf DIV (20*T*tf + 6*T +
    18*dl*N) — one exact integer division.  The only float op is the
    idf log, idf_micro6 = floor(ln((2N+2)/(2df+1)) * 1e6), the same
    single-ln device as top_terms_tfidf (BM25+ style floor at the
    +0.5-smoothed Robertson idf).  Terms and tokens are matched
    case-folded.

    Magnitude bound: idf_micro6 * 44 * T * tf stays inside int64 up
    to T*tf ~ 2e10 (e.g. 10^10 corpus tokens at tf <= 10^3 per doc);
    past that, run per-shard and merge, or swap the exact form for
    the avgdl-normalized DECIMAL form — the fixture/oracle contract
    here is the exact-rational one.

    Plan: ONE pass over the token stream — dl and tf are the only
    aggregates that see it (the probe set joins broadcast, bounded by
    construction), and df derives from the materialized tf table
    (df = docs with tf > 0), so no second scan; T and N are one
    bounded 1-row aggregate collected on the driver (the
    top_terms_tfidf pattern); ranking is one window per term.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    toks = docs.select("doc_id",
                       F.explode(_toks()).alias("_raw")).select(
        "doc_id", F.lower(F.col("_raw")).alias("term"))
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl"))
    probe = broadcast(terms.select(
        F.lower(F.col(terms.columns[0])).alias("term")).dropDuplicates())
    tf = (toks.join(probe, "term")
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf"))
          .localCheckpoint())
    # df derives FROM the tf aggregate (df = docs where tf > 0) — the
    # token stream is scanned once, not twice; localCheckpoint stops
    # Catalyst re-running the scan into both consumers
    df_ = (tf.groupBy("term")
           .agg(F.count(F.lit(1)).cast("long").alias("df")))
    tot = dl.agg(F.sum("dl").alias("t"),
                 F.count(F.lit(1)).alias("n")).first()
    T, N = int(tot["t"]), int(tot["n"])
    idf = df_.withColumn(
        "idf_micro6",
        F.floor(F.log(F.lit(float(2 * N + 2)) / (2 * F.col("df") + 1))
                * 1000000).cast("long"))
    scored = (tf.join(broadcast(idf), "term").join(dl, "doc_id")
              .withColumn(
        "score_micro6",
        F.expr(f"CAST(idf_micro6 * (44 * {T} * tf) DIV "
               f"(20 * {T} * tf + 6 * {T} + 18 * dl * {N}) AS BIGINT)")))
    w = Window.partitionBy("term").orderBy(
        F.col("score_micro6").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("term", "rank", "doc_id", "tf", "dl", "score_micro6"))


def shingle_novelty(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document content novelty — the share of a doc's distinct
    token k-gram shingles whose FIRST corpus occurrence (minimum
    doc_id, the synthetic crawl order) is this document.  The
    curation metric for crawl-batch value: a recrawl that adds
    near-zero novel shingles is not worth storing, and per-batch
    novelty roll-ups fall out of this table by one more aggregate.

    Plan: one shingle explode (JVM-side), one (shingle -> min doc_id)
    aggregate, one per-doc count, one equi-join on doc_id — the
    shingle table is corpus-sized but every shuffle is keyed, nothing
    pairwise.  Docs with fewer than k tokens have no shingles and no
    row (novelty undefined)."""
    from ..operators.dedup import shingles

    sh = shingles(docs, k)
    tot = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"))
    novel = (sh.groupBy("shingle")
             .agg(F.min("doc_id").alias("doc_id"))
             .groupBy("doc_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_novel")))
    return (tot.join(novel, "doc_id", "left")
            .select("doc_id", "n_shingles",
                    F.coalesce("n_novel", F.lit(0)).cast("long")
                    .alias("n_novel"))
            .withColumn("novelty_micro6",
                        F.expr("CAST(n_novel * 1000000 DIV n_shingles"
                               " AS BIGINT)")))


def doclen_percentiles(docs: DataFrame) -> DataFrame:
    """Exact per-source doc-length percentiles by rank selection —
    the ops dashboard companion to the mergeable histogram sketch
    (sketches.doclen_hist): p50/p90/p99 defined as the value at rank
    max(1, ceil(q * n)) within each source's ascending length order
    (the classic nearest-rank definition — pure integers, no
    interpolation, so the DuckDB oracle matches bit-exactly).

    Plan: one per-source window (row_number over n_chars, doc_id) —
    partitions are per-source, never a global single-partition sort —
    then a conditional aggregate picking the three ranks."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = (docs.select("source",
                          F.col("n_chars").cast("long").alias("n_chars"),
                          "doc_id")
              .withColumn("_rk", F.row_number().over(w)))
    n = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))

    def pick(q_num: int, q_den: int, alias: str):
        # rank = max(1, ceil(q*n)) with the POSITIVE-only ceil form
        # (q*n + d - 1) DIV d: Spark DIV truncates toward zero while
        # DuckDB // floors, so they diverge on negatives — never feed
        # this device a negative numerator.
        return F.max(F.when(
            F.col("_rk") == F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"({q_num} * n_docs + {q_den} - 1)"
                       f" DIV {q_den}")),
            F.col("n_chars"))).cast("long").alias(alias)

    return (ranked.join(n, "source")
            .groupBy("source")
            .agg(F.max("n_docs").cast("long").alias("n_docs"),
                 pick(1, 2, "p50"), pick(9, 10, "p90"),
                 pick(99, 100, "p99")))


def postings_lists(docs: DataFrame, min_df: int = 2) -> DataFrame:
    """Inverted-index materialization — the IR-index build step that
    turns the corpus into a postings table: per term, its document
    frequency, total term frequency, and the posting list itself as
    DELTA-encoded doc-id gaps (ascending doc order, first gap from 0),
    comma-joined — the textbook index compression layout (gaps are
    small ints; a varint writer consumes exactly this column).

    Deterministic and oracle-exact: the list order is the doc_id
    order, the encoding is pure integer subtraction, and the join to
    one string makes the row hashable cross-engine.  ``min_df`` prunes
    hapax terms (half the vocabulary, useless postings of length 1).

    Plan: one tokenize-explode, one (term, doc) count, one per-term
    sorted-list aggregate — the same two-shuffle shape as the BM25 tf
    build; per-term state is bounded by document frequency."""
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split(F.col("text"), "[\n \t]"),
                           lambda t: t != "")).alias("tok"))
    tf = (toks.select("doc_id", F.lower("tok").alias("term"))
          .groupBy("term", "doc_id")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    return (tf.groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("df"),
                 F.sum("tf").cast("long").alias("total_tf"),
                 F.array_sort(F.collect_list("doc_id")).alias("_ds"))
            .where(F.col("df") >= min_df)
            .select("term", "df", "total_tf",
                    F.array_join(F.expr(
                        "transform(_ds, (x, i) -> CAST("
                        "CASE WHEN i = 0 THEN x"
                        " ELSE x - _ds[i - 1] END AS STRING))"), ",")
                    .alias("postings_deltas")))


def boolean_search_stats(docs: DataFrame) -> DataFrame:
    """Boolean-retrieval read path over the inverted index: pick the
    corpus's two highest-df terms (ties by term), and report the doc
    counts a search engine's AND / OR / PHRASE operators would
    return — the index-correctness probe for the postings_lists
    materialization (same tokenization: lowercased, split on
    whitespace, empties dropped; phrase = the terms ADJACENT in the
    filtered token sequence).

    Output: one row (term_a, term_b, df_a, df_b, n_and, n_or,
    n_phrase).

    Scale: term selection is a 2-row distributed top-k; membership
    and adjacency are keyed equi-joins on doc_id against the 2-term
    broadcast; every count folds into ONE global aggregate via the
    labeled-union device — no cross join anywhere.
    """
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(F.filter(F.split(F.lower("text"), "[\n \t]"),
                              lambda t: t != ""))
        .alias("pos", "term"))
    sel = (toks.select("doc_id", "term").dropDuplicates()
           .groupBy("term")
           .agg(F.count(F.lit(1)).cast("long").alias("df"))
           .orderBy(F.desc("df"), F.asc("term")).limit(2)
           .withColumn("rk", F.row_number().over(
               Window.orderBy(F.desc("df"), F.asc("term")))))
    hit = toks.join(F.broadcast(sel), "term")
    per_doc = (hit.groupBy("doc_id")
               .agg(F.max(F.when(F.col("rk") == 1, 1).otherwise(0))
                    .alias("ha"),
                    F.max(F.when(F.col("rk") == 2, 1).otherwise(0))
                    .alias("hb")))
    pa = hit.where(F.col("rk") == 1).select("doc_id", "pos")
    pb = hit.where(F.col("rk") == 2).select(
        "doc_id", (F.col("pos") - 1).alias("pos"))
    phrase = (pa.join(pb, ["doc_id", "pos"], "semi")
              .select("doc_id").dropDuplicates())
    labeled = (sel.select(
        F.concat(F.lit("t"), F.col("rk")).alias("k"),
        F.col("df").alias("v"), F.col("term").alias("s"))
        .unionByName(per_doc.agg(
            F.sum(F.expr("ha * hb")).cast("long").alias("v"))
            .select(F.lit("and").alias("k"), "v",
                    F.lit(None).cast("string").alias("s")))
        .unionByName(per_doc.agg(
            F.count(F.lit(1)).cast("long").alias("v"))
            .select(F.lit("or").alias("k"), "v",
                    F.lit(None).cast("string").alias("s")))
        .unionByName(phrase.agg(
            F.count(F.lit(1)).cast("long").alias("v"))
            .select(F.lit("phrase").alias("k"), "v",
                    F.lit(None).cast("string").alias("s"))))
    return labeled.groupBy().agg(
        F.max(F.when(F.col("k") == "t1", F.col("s"))).alias("term_a"),
        F.max(F.when(F.col("k") == "t2", F.col("s"))).alias("term_b"),
        F.max(F.when(F.col("k") == "t1", F.col("v"))).cast("long")
        .alias("df_a"),
        F.max(F.when(F.col("k") == "t2", F.col("v"))).cast("long")
        .alias("df_b"),
        F.max(F.when(F.col("k") == "and", F.col("v"))).cast("long")
        .alias("n_and"),
        F.max(F.when(F.col("k") == "or", F.col("v"))).cast("long")
        .alias("n_or"),
        F.coalesce(F.max(F.when(F.col("k") == "phrase", F.col("v"))),
                   F.lit(0)).cast("long").alias("n_phrase"))


# ---------------------------------------------------------------------------
# Distinctive terms per group by Dunning log-likelihood
# (continuation batch 69)


def distinctive_terms(items: DataFrame, grp_col: str, term_col: str,
                      top_k: int = 5) -> DataFrame:
    """Dunning log-likelihood ratio (CL'93) keyword extraction per
    group: which terms are OVER-represented in this group vs the
    rest of the corpus — the distinctive-vocabulary profile of a
    source (vs tf-idf's per-document salience).

    G² = 2·Σ_cells obs·ln(obs·N / (rowsum·colsum)); each of the four
    cell logs is the repo's single-ln device (integer products, ONE
    double division, ONE ln, floored to micro6 BEFORE the obs·
    multiply), so the statistic is a sum of integers — bit-exact
    cross-engine, and magnitude-safe while N² fits BIGINT (N = corpus
    term occurrences; document the 3·10⁹ bound before 100 TB runs).

    Keeps the top_k POSITIVELY-associated terms per group (obs·N >
    rowsum·colsum), rank by (llr desc, term asc).  Plan: three hash
    aggregates + one lazily attached 1-row total, one per-group
    window on the (group, term) aggregate — nothing corpus-sized
    shuffles twice.

    Output: (grp, rank, term, n_grp, n_corpus, llr_micro6)."""
    from pyspark.sql import Window

    base = items.select(F.col(grp_col).alias("grp"),
                        F.col(term_col).alias("term"))
    a = base.groupBy("grp", "term").agg(
        F.count(F.lit(1)).cast("long").alias("a"))
    rg = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("rg"))
    ct = base.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("ct"))
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def _term(obs, num_den):
        num, den = num_den
        return F.when(obs > 0,
                      obs * F.floor(F.log(num.cast("double")
                                          / den.cast("double"))
                                    * F.lit(1000000)).cast("long")
                      ).otherwise(F.lit(0))

    j = a.join(rg, "grp").join(ct, "term").crossJoin(tot)
    A = F.col("a")
    B = F.col("rg") - A
    C = F.col("ct") - A
    D = F.col("n") - F.col("rg") - F.col("ct") + A
    N = F.col("n")
    llr = 2 * (_term(A, (A * N, F.col("rg") * F.col("ct")))
               + _term(B, (B * N, F.col("rg") * (N - F.col("ct"))))
               + _term(C, (C * N, (N - F.col("rg")) * F.col("ct")))
               + _term(D, (D * N,
                           (N - F.col("rg")) * (N - F.col("ct")))))
    pos = (j.where(A * N > F.col("rg") * F.col("ct"))
           .withColumn("llr_micro6", llr.cast("long")))
    w = Window.partitionBy("grp").orderBy(
        F.col("llr_micro6").desc(), F.col("term").asc())
    return (pos.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= top_k)
            .select("grp", "rank", "term",
                    F.col("a").alias("n_grp"),
                    F.col("ct").alias("n_corpus"), "llr_micro6"))


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation: NDCG@k of the BM25 ranking
# (continuation batch 70)

NDCG_K = 10
# position discounts floor(1e6 * ln2/ln(i+1)) — DATA-INDEPENDENT
# constants baked from the same Python expression on both engines, so
# no cross-engine float exposure at all
NDCG_DISCOUNTS_MICRO6 = tuple(
    math.floor(math.log(2) / math.log(i + 1) * 10**6)
    for i in range(1, NDCG_K + 1))


def retrieval_ndcg(docs: DataFrame, terms: DataFrame,
                   k: int = NDCG_K) -> DataFrame:
    """NDCG@k of the BM25 ranking per probe term, with graded
    relevance = raw term frequency: "does BM25's dl-penalized order
    recover the most-attesting documents?" — the retrieval-quality
    gate for the entity-attestation read path.

    DCG = Σ rel_i · disc(rank_i) over the BM25 top-k; IDCG = the same
    sum over the TRUE top-k by (tf desc, doc_id) from the full match
    table, so NDCG < 1 exactly where length normalization reorders
    attestation.  Discounts are pre-floored micro6 literals
    (:data:`NDCG_DISCOUNTS_MICRO6`); everything else is integer
    sums and one exact division — cross-engine bit-exact.

    Output: (term, n_matched, dcg_micro6, idcg_micro6, ndcg_micro6).

    Plan note: the ideal ranking recomputes the (term, doc, tf) match
    aggregate (a second token scan at fixture scale); production
    would reuse bm25's materialized tf table — the eval contract is
    what this table pins."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    disc = F.array(*[F.lit(d) for d in
                     NDCG_DISCOUNTS_MICRO6[:k]])
    ranked = bm25_entity_retrieval(docs, terms, k)
    dcg = (ranked
           .withColumn("_d", F.element_at(disc, F.col("rank")))
           .groupBy("term")
           .agg(F.sum(F.col("tf") * F.col("_d")).cast("long")
                .alias("dcg_micro6")))
    toks = docs.select("doc_id",
                       F.explode(_toks()).alias("_raw")).select(
        "doc_id", F.lower(F.col("_raw")).alias("term"))
    probe = broadcast(terms.select(
        F.lower(F.col(terms.columns[0])).alias("term"))
        .dropDuplicates())
    tf = (toks.join(probe, "term")
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    wi = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id"))
    ideal = (tf.withColumn("_rn", F.row_number().over(wi))
             .where(F.col("_rn") <= k)
             .withColumn("_d", F.element_at(disc, F.col("_rn")))
             .groupBy("term")
             .agg(F.sum(F.col("tf") * F.col("_d")).cast("long")
                  .alias("idcg_micro6")))
    n_m = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"))
    return (dcg.join(ideal, "term").join(n_m, "term")
            .select("term", "n_matched", "dcg_micro6", "idcg_micro6",
                    F.expr("CAST(dcg_micro6 * 1000000"
                           " DIV idcg_micro6 AS BIGINT)")
                    .alias("ndcg_micro6")))


# ---------------------------------------------------------------------------
# Term-proximity read path: minimal co-occurrence window
# (continuation batch 71)

def term_proximity(docs: DataFrame) -> DataFrame:
    """Per-document minimal window span containing BOTH of the
    corpus's two highest-df terms (ties by term asc) — the proximity
    signal a search engine's "terms near each other" ranker uses on
    top of the boolean AND set (:func:`boolean_search_stats` counts
    that set; this measures HOW tightly the terms co-occur inside it).

    min_span for a doc = min over all adjacent (a, b) occurrences of
    ``|pos_a - pos_b| + 1`` — computed LINEARLY with the classic
    running-last-position device: one window per doc over the merged
    position stream, each hit row looks up the running MAX position
    of the OTHER term at-or-before it, so the nearest-preceding
    partner is exact and no position cross-product is ever formed
    (tf(a) x tf(b) pairs never materialize).

    Output: (doc_id, n_a, n_b, min_span) for exactly the docs that
    contain both terms; integer token positions (0-based, same
    whitespace tokenization as postings_lists).

    Scale: term selection is a 2-row distributed top-k; the window is
    partitioned by doc_id (bounded by doc length); the per-doc fold is
    one hash aggregate.  No cross join, no global window."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(F.filter(F.split(F.lower("text"), "[\n \t]"),
                              lambda t: t != ""))
        .alias("pos", "term"))
    sel = (toks.select("doc_id", "term").dropDuplicates()
           .groupBy("term")
           .agg(F.count(F.lit(1)).cast("long").alias("df"))
           .orderBy(F.desc("df"), F.asc("term")).limit(2)
           .withColumn("rk", F.row_number().over(
               Window.orderBy(F.desc("df"), F.asc("term")))))
    hit = (toks.join(F.broadcast(sel.select("term", "rk")), "term")
           .select("doc_id", "pos", "rk"))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, 0))
    last_a = F.max(F.when(F.col("rk") == 1, F.col("pos"))).over(w)
    last_b = F.max(F.when(F.col("rk") == 2, F.col("pos"))).over(w)
    spans = hit.withColumn(
        "span",
        F.when(F.col("rk") == 2, F.col("pos") - last_a + 1)
        .otherwise(F.col("pos") - last_b + 1))
    return (spans.groupBy("doc_id")
            .agg(F.sum(F.when(F.col("rk") == 1, 1).otherwise(0))
                 .cast("long").alias("n_a"),
                 F.sum(F.when(F.col("rk") == 2, 1).otherwise(0))
                 .cast("long").alias("n_b"),
                 F.min("span").cast("long").alias("min_span"))
            .where(F.col("min_span").isNotNull())
            .select("doc_id", "n_a", "n_b", "min_span"))


# ---------------------------------------------------------------------------
# Query-biased snippet extraction (continuation batch 72)

SNIPPET_W = 8


def snippet_windows(docs: DataFrame, terms: DataFrame,
                    w: int = SNIPPET_W) -> DataFrame:
    """Best w-token evidence snippet per document: the window with the
    MOST probe-term hits (tie -> earliest start) — what a search/KG
    result page shows as "why this document attests these entities".

    Hits are lowercase whole-token matches against the probe list
    (single-token aliases, the gazetteer convention); the snippet
    itself preserves the ORIGINAL token casing.  Windows are scored
    with one running frame sum (ROWS CURRENT..w-1 FOLLOWING) over the
    consecutive post-filter positions, so scoring is linear per doc —
    no per-window re-scan.  End-of-doc windows truncate (both engines
    clamp the frame and the slice identically).

    Output: (doc_id, win_start, n_hits, snippet) for docs with >= 1
    hit; win_start is the 0-based token position.

    Scale: probe list is broadcast; one window frame sum + one top-1
    window, both partitioned by doc_id; the slice join back to pages
    is a keyed equi-join.  No cross join, no global window."""
    toks = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.posexplode(_toks()).alias("pos", "tok"))
    probe = F.broadcast(
        terms.select(F.lower(F.col(terms.columns[0])).alias("term"),
                     F.lit(1).alias("m")).dropDuplicates(["term"]))
    marked = (toks.withColumn("term", F.lower("tok"))
              .join(probe, "term", "left")
              .select("doc_id", "pos",
                      F.coalesce("m", F.lit(0)).alias("m")))
    wf = (Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.currentRow, w - 1))
    scored = marked.withColumn(
        "n_hits", F.sum("m").over(wf).cast("long"))
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("n_hits").desc(), F.col("pos").asc())
    best = (scored.withColumn("_rn", F.row_number().over(wr))
            .where((F.col("_rn") == 1) & (F.col("n_hits") > 0))
            .select("doc_id", F.col("pos").alias("win_start"), "n_hits"))
    ts_arr = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                         _toks().alias("ts"))
    return (best.join(ts_arr, "doc_id")
            .select("doc_id",
                    F.col("win_start").cast("long").alias("win_start"),
                    "n_hits",
                    F.array_join(
                        F.slice(F.col("ts"), F.col("win_start") + 1,
                                F.lit(w)), " ").alias("snippet")))


# ---------------------------------------------------------------------------
# Type-ahead completion index (continuation batch 78)

def completion_index(docs: DataFrame, plen: int = 3,
                     k: int = 3) -> DataFrame:
    """Materialized type-ahead index: for every plen-char lowercase
    token prefix, the top-k completions by corpus term frequency —
    the autocomplete read path a search box hits on every keystroke,
    precomputed as a table (the trie flattened to its fanout-k
    frontier).

    Output: (prefix, rank, term, tf, prefix_tf) where prefix_tf is
    the prefix's total frequency (the suggestion denominator); ties
    (tf desc, term asc) so ranking is deterministic.  Tokens shorter
    than plen are excluded.

    Scale: one term-frequency hash aggregate, then everything is
    keyed by prefix — one windowed sum and one windowed top-k, both
    partitioned by prefix; no global window, no join against the
    corpus."""
    tf = (docs.select(F.explode(_toks()).alias("t"))
          .select(F.lower("t").alias("term"))
          .where(F.length("term") >= plen)
          .groupBy("term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf"))
          .withColumn("prefix", F.substring("term", 1, plen)))
    wp = Window.partitionBy("prefix")
    wr = Window.partitionBy("prefix").orderBy(
        F.col("tf").desc(), F.col("term").asc())
    return (tf.withColumn("prefix_tf",
                          F.sum("tf").over(wp).cast("long"))
            .withColumn("rank", F.row_number().over(wr).cast("int"))
            .where(F.col("rank") <= k)
            .select("prefix", "rank", "term", "tf", "prefix_tf"))


# ---------------------------------------------------------------------------
# Shuffle-skew diagnostics (continuation batch 87)

def join_skew_profile(frames: "dict[str, DataFrame]") -> DataFrame:
    """Hot-key profile of the engine's heavy join families — the
    table a scale engineer reads BEFORE a 100x scale-up: for each
    join-key family, how concentrated is the shuffle?  ``sum_sq``
    (sum of per-key count squared) is the exact pairwise work a
    self-equi-join on that key performs, ``max_rows`` is the single
    straggler partition's share, and ``max_over_avg`` is the salting
    alarm (a key family with max/avg >> 1 needs salt or AQE skew
    handling before it needs more executors).

    Input: {family_name: DataFrame with one column ``key``}.
    Output: (family, n_keys, n_rows, max_rows, sum_sq,
    top1_share_micro6, max_over_avg_micro6) — one row per family,
    exact integers (sum_sq assumes per-key counts < ~3e9, true by
    construction for bucketed candidate joins).

    Scale: per family ONE hash aggregate + one 1-row roll-up — the
    profile itself never shuffles more than the key cardinality."""
    out = None
    for fam, df in frames.items():
        per = (df.selectExpr("key")
               .groupBy("key")
               .agg(F.count(F.lit(1)).cast("long").alias("c")))
        row = (per.agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("c").cast("long").alias("n_rows"),
            F.max("c").cast("long").alias("max_rows"),
            F.sum(F.col("c") * F.col("c")).cast("long")
            .alias("sum_sq"))
            .select(F.lit(fam).alias("family"), "n_keys", "n_rows",
                    "max_rows", "sum_sq"))
        out = row if out is None else out.unionByName(row)
    return out.select(
        "family", "n_keys", "n_rows", "max_rows", "sum_sq",
        F.expr("CAST(max_rows * 1000000 DIV n_rows AS BIGINT)")
        .alias("top1_share_micro6"),
        F.expr("CAST(max_rows * n_keys * 1000000 DIV n_rows"
               " AS BIGINT)").alias("max_over_avg_micro6"))


def quality_calibration(docs: DataFrame,
                        n_buckets: int = 10) -> DataFrame:
    """Reliability table for the LM quality score: decile-bucket the
    corpus by ``lm_quality`` score and report the curation-gate keep
    rate inside each bucket — the calibration read a data-quality
    owner does before trusting a score as a sampling weight (a
    well-behaved score should show keep-rate rising with the score
    bucket; a flat table says the score adds nothing over the gate).

    Buckets are rank-deciles computed from the DISTINCT-score value
    table: per-score counts first (one hash aggregate — the only
    corpus-sized shuffle), then a cumulative window over the bounded
    value domain (the doclen_percentiles discipline — the
    single-partition window never sees corpus-sized input), bucket =
    cum_before * n_buckets DIV n_total, so equal scores always share
    a bucket and the result is partition-invariant.

    Output: (bucket, n_docs, n_keep, keep_rate_micro6, score_lo,
    score_hi)."""
    from pyspark.sql import Window

    scored = (lm_quality(docs).select("doc_id", "lm_score_micro6")
              .join(corpus_curation(docs).select("doc_id", "keep"),
                    "doc_id"))
    vals = (scored.groupBy("lm_score_micro6")
            .agg(F.count(F.lit(1)).cast("long").alias("c"),
                 F.sum("keep").cast("long").alias("k")))
    w = (Window.orderBy("lm_score_micro6")
         .rowsBetween(Window.unboundedPreceding, -1))
    vb = (vals
          .withColumn("cum_before",
                      F.coalesce(F.sum("c").over(w), F.lit(0)))
          .withColumn("n_total",
                      F.sum("c").over(
                          Window.partitionBy(F.lit(1)))))
    bucketed = vb.withColumn(
        "bucket",
        F.expr(f"CAST(cum_before * {n_buckets} DIV n_total AS INT)"))
    return (bucketed.groupBy("bucket")
            .agg(F.sum("c").cast("long").alias("n_docs"),
                 F.sum("k").cast("long").alias("n_keep"),
                 F.min("lm_score_micro6").cast("long")
                 .alias("score_lo"),
                 F.max("lm_score_micro6").cast("long")
                 .alias("score_hi"))
            .select("bucket", "n_docs", "n_keep",
                    F.expr("CAST(n_keep * 1000000 DIV n_docs"
                           " AS BIGINT)").alias("keep_rate_micro6"),
                    "score_lo", "score_hi"))


def host_outliers(docs: DataFrame,
                  k_mad_tenths: int = 35) -> DataFrame:
    """Robust per-host volume outliers: flag sources whose total
    token volume deviates from the cross-host MEDIAN by more than
    k * MAD (k = k_mad_tenths/10, default 3.5 — the classic robust
    z-score cut, left unscaled by the 1.4826 normal constant to stay
    in exact integers).  Median/MAD beat mean/stddev here because a
    single crawler-trap host inflates the mean enough to mask
    itself.

    Medians are lower-median nearest rank (index (n-1) DIV 2 in
    (value, source) order — fully tie-deterministic).  The windows
    run over the PER-HOST table, bounded by the host domain (never
    corpus-sized) — the same discipline as the value-table
    percentile operators; the only corpus-sized stage is the first
    per-source aggregate.

    Output: (source, n_docs, total_tokens, med_tokens, mad_tokens,
    abs_dev, is_outlier).  MAD = 0 degenerates to flagging any
    deviation, which is the right reading of "all other hosts
    agree exactly"."""
    from pyspark.sql import Window

    st = (docs.select("source",
                      F.size(_toks()).cast("long").alias("n_tok"))
          .groupBy("source")
          .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
               F.sum("n_tok").cast("long").alias("total_tokens")))
    wfull = Window.partitionBy(F.lit(1))
    w1 = Window.orderBy("total_tokens", "source")
    a = (st.withColumn("rn", F.row_number().over(w1) - 1)
         .withColumn("cnt", F.count(F.lit(1)).over(wfull))
         .withColumn("med_tokens", F.max(F.when(
             F.col("rn") == F.expr("(cnt - 1) DIV 2"),
             F.col("total_tokens"))).over(wfull))
         .withColumn("abs_dev",
                     F.abs(F.col("total_tokens")
                           - F.col("med_tokens")).cast("long")))
    w2 = Window.orderBy("abs_dev", "source")
    b = (a.withColumn("rn2", F.row_number().over(w2) - 1)
         .withColumn("mad_tokens", F.max(F.when(
             F.col("rn2") == F.expr("(cnt - 1) DIV 2"),
             F.col("abs_dev"))).over(wfull)))
    return b.select(
        "source", "n_docs", "total_tokens",
        F.col("med_tokens").cast("long").alias("med_tokens"),
        F.col("mad_tokens").cast("long").alias("mad_tokens"),
        "abs_dev",
        (F.col("abs_dev") * 10
         > F.lit(k_mad_tenths) * F.col("mad_tokens"))
        .cast("int").alias("is_outlier"))


def source_gate_chi2(docs: DataFrame) -> DataFrame:
    """Chi-square independence audit of (source x curation verdict):
    is the keep/drop gate firing uniformly across hosts, or is some
    host's content systematically rejected?  Per source the
    two-cell contribution collapses to the z-squared form
    n_s * (rate_s - p)^2 / (p * (1 - p)) — reported floor-scaled as
    chi2_micro6 with rates in micro6, so both engines agree
    bit-for-bit (the goal is a cross-engine-stable diagnostic
    statistic, not a p-value; floors are documented behavior).

    Guards: p = 0 or p = 1 (no variance) yields contribution 0.
    Overflow bound: n_s * diff^2 with diff <= 1e6 stays in BIGINT
    for n_s up to ~9e6 docs per source — at larger shards compute
    per-bucket and inspect per-bucket tables.

    Output: (source, n_docs, n_keep, rate_micro6,
    global_rate_micro6, chi2_micro6, chi2_total_micro6) — the total
    repeated per row (sum of floored contributions; window over the
    bounded source table)."""
    from pyspark.sql import Window

    gate = corpus_curation(docs).select("doc_id", "keep")
    per = (docs.select("doc_id", "source").join(gate, "doc_id")
           .groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("keep").cast("long").alias("n_keep")))
    wfull = Window.partitionBy(F.lit(1))
    a = (per
         .withColumn("_N", F.sum("n_docs").over(wfull))
         .withColumn("_K", F.sum("n_keep").over(wfull))
         .withColumn("rate_micro6",
                     F.expr("CAST(n_keep * 1000000 DIV n_docs"
                            " AS BIGINT)"))
         .withColumn("global_rate_micro6",
                     F.expr("CAST(_K * 1000000 DIV _N AS BIGINT)")))
    a = a.withColumn(
        "chi2_micro6",
        F.expr("""CAST(CASE
          WHEN global_rate_micro6 = 0 OR global_rate_micro6 = 1000000
          THEN 0
          ELSE (n_docs * (rate_micro6 - global_rate_micro6)
                       * (rate_micro6 - global_rate_micro6))
               DIV ((global_rate_micro6
                     * (1000000 - global_rate_micro6)) DIV 1000000)
          END AS BIGINT)"""))
    return (a.withColumn("chi2_total_micro6",
                         F.sum("chi2_micro6").over(wfull)
                         .cast("long"))
            .select("source", "n_docs", "n_keep", "rate_micro6",
                    "global_rate_micro6", "chi2_micro6",
                    "chi2_total_micro6"))


PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def with_synth_pii(docs: DataFrame) -> DataFrame:
    """Append a deterministic contact line (email + IPv4 derived from
    doc_id) to every 3rd doc — the PII fixture both engines wrap
    identically, same device as with_synth_lines/with_synth_quote."""
    d = F.col("doc_id")
    line = F.concat(
        F.lit("\ncontact: user"), d.cast("string"),
        F.lit("@mail"), (d % 7).cast("string"),
        F.lit(".example.com from 10."), (d % 256).cast("string"),
        F.lit("."), (d % 13).cast("string"),
        F.lit("."), (d % 251).cast("string"))
    return docs.withColumn(
        "text",
        F.when(F.pmod(d, F.lit(3)) == 0,
               F.concat(F.col("text"), line))
        .otherwise(F.col("text")))


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Corpus PII scrubbing pass: count and mask email addresses and
    IPv4 literals per document — the redaction stage a web-text
    training pipeline runs between extraction and tokenization.
    Patterns are deliberately restricted to greedy character-class
    regexes with no ambiguous alternation, the fragment of regex
    where Java (Spark) and RE2 (DuckDB) produce IDENTICAL matches —
    that is what makes the scrubbed-text hash cross-engine exact.

    Output: (doc_id, n_emails, n_ips, scrubbed_sha) — counts from
    the pre-scrub text, hash over the masked text.

    Scale: pure per-row codegen expressions (regexp_extract_all /
    regexp_replace / sha2), no shuffle at all — the scan IS the
    operator."""
    t = F.col("text")
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, PII_EMAIL, "<EMAIL>"),
        PII_IPV4, "<IP>")
    # patterns passed as lit() Columns, NOT as SQL string literals
    # (Spark SQL literal parsing would eat the backslashes)
    return with_synth_pii(docs).select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), F.lit(0)))
        .cast("long").alias("n_ips"),
        F.sha2(scrubbed, 256).alias("scrubbed_sha"))


def vocab_growth(docs: DataFrame, bucket_docs: int = 50) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative distinct token
    types vs cumulative token volume, sampled at fixed doc-id
    buckets — the curve a corpus owner reads to judge how much NEW
    vocabulary the next crawl slice will buy (a flattening curve
    says dedup/expansion, a steep one says keep crawling).

    A token's first occurrence is attributed to its MIN doc_id (the
    deterministic stand-in for arrival order); new-type and volume
    counts aggregate per bucket = doc_id DIV bucket_docs, and the
    cumulative sums run over the BUCKET table — bounded by
    corpus/bucket_docs, never a corpus-sized window (the
    value-table discipline).

    Output: (bucket, n_docs, n_tokens, n_new_types, cum_tokens,
    vocab_size)."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(_toks()).alias("tok"))
    vol = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"))
    first = toks.groupBy("tok").agg(F.min("doc_id").alias("doc_id"))
    news = first.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_new"))
    per_doc = (docs.select("doc_id")
               .join(vol, "doc_id", "left")
               .join(news, "doc_id", "left")
               .fillna(0, ["n_tok", "n_new"]))
    per_bucket = (per_doc
                  .groupBy(F.expr(f"CAST(doc_id DIV {bucket_docs}"
                                  " AS INT)").alias("bucket"))
                  .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                       F.sum("n_tok").cast("long").alias("n_tokens"),
                       F.sum("n_new").cast("long")
                       .alias("n_new_types")))
    w = (Window.orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return per_bucket.select(
        "bucket", "n_docs", "n_tokens", "n_new_types",
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        F.sum("n_new_types").over(w).cast("long").alias("vocab_size"))


def bpe_merges(docs: DataFrame, n_merges: int = 12) -> DataFrame:
    """Byte-pair-encoding merge training (Sennrich et al. '16, the
    word-frequency formulation every production tokenizer trainer
    uses): learn the first ``n_merges`` merge rules by repeatedly
    fusing the most frequent adjacent symbol pair.

    The corpus is scanned EXACTLY ONCE into a (word, count) frequency
    table; every subsequent round runs over that vocabulary table
    only — at 100 TB the corpus scan is petabyte-scale but the vocab
    table is ~10^7 rows, so the k training rounds cost k small-table
    shuffles, never k corpus passes (the classic trainer split).

    Symbol sequences are carried as paren-delimited strings
    ``(k)(e)(y)(</w>)``; merging pair (l, r) is the single built-in
    ``replace(s, '(l)(r)', '(lr)')`` — leftmost non-overlapping, the
    standard BPE convention, and char-exact between Spark's replace
    and DuckDB's (pinned by the planted aaaa -> (aa)(aa) test).  The
    paren fence makes cross-symbol false matches impossible because
    symbols never contain parens.

    Argmax per round is a distributed top-1 (count desc, lhs asc,
    rhs asc — total order, bit-reproducible); the winning row is a
    bounded 1-row collect per round, same device as mmr_rerank.

    Output: (merge_rank, lhs, rhs, pair_count, new_symbol) — the
    ordered merge table a tokenizer ships as tokenizer.json.
    """
    merges, _ = _bpe_train(docs, n_merges)
    return docs.sparkSession.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, "
                "pair_count long, new_symbol string")


def _bpe_syms():
    return F.split(F.expr("substring(s, 2, length(s)-2)"), r"\)\(")


def _bpe_train(docs: DataFrame, n_merges: int):
    """Shared BPE trainer: returns (merges, rounds) where merges is
    the ordered rule list and rounds[r] is the checkpointed vocab
    table AFTER the first r merges (rounds[0] = char-split baseline).
    See bpe_merges for the full semantics contract."""
    vocab = (docs.select(F.explode(_toks()).alias("tok"))
             .groupBy("tok")
             .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    words = vocab.select(
        "cnt",
        F.concat(F.regexp_replace("tok", "(.)", r"($1)"),
                 F.lit("(</w>)")).alias("s")).localCheckpoint()
    rounds = [words]
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pairs = (words
                 .select("cnt", _bpe_syms().alias("syms"))
                 .where(F.size("syms") >= 2)
                 .select("cnt", F.explode(F.arrays_zip(
                     F.slice("syms", 1, F.size("syms") - 1),
                     F.slice(F.col("syms"), 2, F.size("syms") - 1)))
                     .alias("p"))
                 .select("cnt", F.col("p")["0"].alias("lhs"),
                         F.col("p")["1"].alias("rhs"))
                 .groupBy("lhs", "rhs")
                 .agg(F.sum("cnt").cast("long").alias("c")))
        best = (pairs.orderBy(F.col("c").desc(), "lhs", "rhs")
                .limit(1).collect())  # bounded: 1 row
        if not best:
            break
        b = best[0]
        merged = b["lhs"] + b["rhs"]
        merges.append((rank, b["lhs"], b["rhs"], int(b["c"]), merged))
        words = (words.withColumn(
            "s", F.replace(
                F.col("s"),
                F.lit(f"({b['lhs']})({b['rhs']})"),
                F.lit(f"({merged})")))
            .localCheckpoint())
        rounds.append(words)
    return merges, rounds


def bpe_compression(docs: DataFrame, n_merges: int = 12) -> DataFrame:
    """The tokenizer-quality curve behind every BPE vocab-size
    decision: after each learned merge rule, how many tokens does the
    corpus cost (``corpus_symbols``, token-weighted) and how many
    distinct symbol types exist (``vocab_symbols``)?  Rank 0 is the
    character baseline; the </w> end-of-word sentinel counts as a
    symbol until merges absorb it (the standard word-frequency BPE
    accounting).

    Each round's stat is ONE lazy aggregate over that round's
    checkpointed vocab table — the per-round tables are already
    materialized by the trainer, so the whole curve costs one job of
    n_merges+1 small-table scans, never a corpus rescan.
    """
    _, rounds = _bpe_train(docs, n_merges)
    per = []
    for r, w in enumerate(rounds):
        per.append(
            w.select("cnt", F.explode(_bpe_syms()).alias("sym"))
            .agg(F.coalesce(F.sum("cnt"), F.lit(0))
                 .cast("long").alias("corpus_symbols"),
                 F.countDistinct("sym")
                 .cast("long").alias("vocab_symbols"))
            .select(F.lit(r).cast("int").alias("merge_rank"),
                    "corpus_symbols", "vocab_symbols"))
    out = per[0]
    for p in per[1:]:
        out = out.unionByName(p)
    return out


def rake_keywords(docs: DataFrame, k: int = 25) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) at corpus grain:
    (rank, phrase, n_words, occurrences, score_x1000), the top-``k``
    candidate phrases by the classic degree/frequency word score.

    Candidate phrases are maximal runs of consecutive non-stopword
    tokens (gaps-and-islands on token position; the engine's default
    whitespace tokenizer keeps punctuation attached, a documented
    deviation from RAKE's punctuation-delimiter set — the STOPWORDS
    tuple is the delimiter vocabulary, as in the paper's core
    formulation).  Word statistics are corpus-level: freq(w) = number
    of phrase occurrences containing w, deg(w) = total words in those
    occurrences (co-occurrence degree including self).  The word
    score is the paper's deg/freq ratio, floor-scaled by 1000 in
    exact integer arithmetic (``div``) so both engines agree bit-for-
    bit; a phrase scores the sum of its word scores, identical for
    identical phrase text by construction.

    Scale shape: one corpus scan (posexplode), one per-doc shuffle
    for the island grouping, a vocab-sized word-score aggregate, one
    equi-join back on word, and a distributed TakeOrdered top-k —
    the only global window runs over the k-row result.  No driver
    loops, no cartesian joins.
    """
    toks = docs.select("doc_id", F.posexplode(_toks()).alias("pos", "tok"))
    words = (toks.select("doc_id", "pos", F.lower("tok").alias("word"))
             .where(~F.col("word").isin(*STOPWORDS)))
    seq = Window.partitionBy("doc_id").orderBy("pos")
    runs = words.withColumn(
        "grp", (F.col("pos") - F.row_number().over(seq)).cast("int"))
    occ = (runs.groupBy("doc_id", "grp")
           .agg(F.transform(
               F.array_sort(F.collect_list(F.struct("pos", "word"))),
               lambda s: s["word"]).alias("ws")))
    wrows = occ.select(
        "doc_id", "grp",
        F.concat_ws(" ", "ws").alias("phrase"),
        F.size("ws").cast("int").alias("n_words"),
        F.explode("ws").alias("word"))
    wscore = (wrows.groupBy("word")
              .agg(F.count(F.lit(1)).cast("long").alias("freq"),
                   F.sum("n_words").cast("long").alias("deg"))
              .select("word", F.expr("(1000 * deg) div freq")
                      .cast("long").alias("word_score_x1000")))
    phr = (wrows.join(wscore, "word")
           .groupBy("doc_id", "grp", "phrase", "n_words")
           .agg(F.sum("word_score_x1000").cast("long")
                .alias("score_x1000")))
    agg = (phr.groupBy("phrase")
           .agg(F.max("n_words").cast("int").alias("n_words"),
                F.count(F.lit(1)).cast("long").alias("occurrences"),
                F.max("score_x1000").cast("long").alias("score_x1000")))
    top = agg.orderBy(F.desc("score_x1000"), F.desc("occurrences"),
                      F.asc("phrase")).limit(k)
    w = Window.orderBy(F.desc("score_x1000"), F.desc("occurrences"),
                       F.asc("phrase"))  # k-row bounded input
    return (top.withColumn("rank", F.row_number().over(w).cast("int"))
            .select("rank", "phrase", "n_words", "occurrences",
                    "score_x1000"))


def roc_auc(scored: DataFrame, score_col: str = "score",
            label_col: str = "pos") -> DataFrame:
    """Exact tie-aware ROC AUC (the Mann-Whitney U statistic) of an
    integer score against a binary label — the evaluation every
    quality-filter threshold decision should read before shipping:
    (n_pos, n_neg, u2, auc_micro6).

    AUC = P(score_pos > score_neg) + P(score_pos == score_neg)/2 over
    all positive x negative pairs.  Computed float-free: u2 = 2*U =
    sum over distinct score values s of n_pos(s) * (2*negatives
    strictly below s + n_neg(s)) — ties contribute the half credit as
    the whole n_neg(s) term, so u2 stays integral; auc_micro6 =
    (1e6 * u2) div (2 * n_pos * n_neg).  Bit-exact cross-engine, no
    rank-to-float conversion.

    Scale shape: ONE hash aggregate collapses the corpus to the
    score histogram; the prefix-sum window then runs over distinct
    integer score values — bounded by the micro6 fixed-point
    resolution (<= 1e6 + 1 rows), independent of corpus size — and
    the final reduce is a 1-row aggregate.  Same bounded-support
    device as the doclen histogram.
    """
    hist = (scored.groupBy(F.col(score_col).alias("_s"))
            .agg(F.sum(F.col(label_col).cast("long")).alias("_np"),
                 (F.count(F.lit(1))
                  - F.sum(F.col(label_col).cast("long"))).alias("_nn")))
    w = (Window.orderBy("_s")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum = hist.withColumn(
        "_below", F.coalesce(F.sum("_nn").over(w), F.lit(0)))
    return (cum.agg(
        F.sum("_np").cast("long").alias("n_pos"),
        F.sum("_nn").cast("long").alias("n_neg"),
        F.sum(F.col("_np") * (2 * F.col("_below") + F.col("_nn")))
        .cast("long").alias("u2"))
        .select("n_pos", "n_neg", "u2",
                F.expr("(1000000 * u2) div (2 * n_pos * n_neg)")
                .cast("long").alias("auc_micro6")))


def cohen_kappa(pairs: DataFrame, a_col: str = "a",
                b_col: str = "b") -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two
    categorical raters over the same items (Cohen '60), the honest
    version of raw accuracy when one class dominates:
    (n_items, n_agree, pe_num, kappa_micro6).

    Float-free: with confusion counts c_ab, row marginals r_a, column
    marginals s_b, po = n_agree/n and pe = pe_num/n^2 where pe_num =
    sum_c r_c * s_c, so kappa = (n*n_agree - pe_num) / (n^2 - pe_num)
    — computed as ONE exact integer division, floor-scaled micro6.
    Works for any label vocabulary, not just binary.

    Scale shape: one hash aggregate to the confusion matrix (label
    vocabulary squared, bounded), two marginal aggregates, a
    vocab-sized equi-join, and a 1-row reduce — the corpus is touched
    exactly once.
    """
    conf = (pairs.groupBy(F.col(a_col).alias("_a"),
                          F.col(b_col).alias("_b"))
            .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    ra = conf.groupBy("_a").agg(F.sum("_c").alias("_ra"))
    sb = conf.groupBy("_b").agg(F.sum("_c").alias("_sb"))
    pe = (ra.join(sb, ra["_a"] == sb["_b"])
          .agg(F.coalesce(F.sum(F.col("_ra") * F.col("_sb")),
                          F.lit(0)).cast("long").alias("pe_num")))
    tot = conf.agg(
        F.sum("_c").cast("long").alias("n_items"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_c"))
              .otherwise(F.lit(0))).cast("long").alias("n_agree"))
    return (tot.crossJoin(pe)  # two 1-row frames
            .select("n_items", "n_agree", "pe_num",
                    # pe == 1 (both raters constant) makes kappa's
                    # denominator 0; the conventional reading is
                    # "perfect chance agreement" -> 1e6 sentinel
                    F.expr("CASE WHEN n_items * n_items = pe_num"
                           " THEN 1000000 ELSE"
                           " (1000000 * (n_items * n_agree - pe_num))"
                           " div (n_items * n_items - pe_num) END")
                    .cast("long").alias("kappa_micro6")))


def isotonic_fit(buckets: DataFrame, x_col: str = "bucket",
                 w_col: str = "n_docs",
                 y_num_col: str = "n_keep") -> DataFrame:
    """Isotonic (monotone non-decreasing) regression over a bounded
    bucket table — the calibration step that turns a reliability
    curve into a usable monotone score->probability map (Zadrozny &
    Elkan '02 use PAVA exactly here): adds ``iso_micro6`` to each
    bucket row.

    Instead of the sequential pool-adjacent-violators sweep, uses the
    equivalent minimax closed form yhat_i = max_{j<=i} min_{k>=i}
    mean(y, j..k) (Robertson-Wright-Dykstra '88 Thm 1.4.4) — O(T^3)
    over interval means, but T is the BUCKET count (a fixed
    resolution, 10 here), never data volume, so the whole fit is a
    bounded self-join after the corpus has been reduced to T rows.
    Interval means are weighted (w = bucket mass) and floor-quantized
    to micro6 BEFORE the minimax — both engines quantize identically,
    so the fit is bit-exact cross-engine; the quantized fit is still
    monotone (max-min of a fixed value table) and within 1 micro6 of
    the rational PAVA solution.

    Output: input columns + iso_micro6, one row per bucket.
    """
    c = (buckets.select(
            F.col(x_col).alias("_x"),
            F.col(w_col).cast("long").alias("_w"),
            F.col(y_num_col).cast("long").alias("_yn"))
         .withColumn("_cw", F.sum("_w").over(
             Window.orderBy("_x").rowsBetween(
                 Window.unboundedPreceding, Window.currentRow)))
         .withColumn("_cy", F.sum("_yn").over(
             Window.orderBy("_x").rowsBetween(
                 Window.unboundedPreceding, Window.currentRow))))
    j = c.select(F.col("_x").alias("_j"),
                 (F.col("_cw") - F.col("_w")).alias("_cwj"),
                 (F.col("_cy") - F.col("_yn")).alias("_cyj"))
    k = c.select(F.col("_x").alias("_k"), F.col("_cw").alias("_cwk"),
                 F.col("_cy").alias("_cyk"))
    ivals = (j.join(k, j["_j"] <= k["_k"])  # bounded: T x T buckets
             .select("_j", "_k",
                     F.expr("(1000000 * (_cyk - _cyj))"
                            " div (_cwk - _cwj)").alias("_a")))
    i = c.select(F.col("_x").alias("_i"))
    tri = ivals.join(i, (F.col("_j") <= F.col("_i"))
                     & (F.col("_i") <= F.col("_k")))
    fit = (tri.groupBy("_i", "_j").agg(F.min("_a").alias("_m"))
           .groupBy("_i").agg(F.max("_m").cast("long")
                              .alias("iso_micro6")))
    return buckets.join(fit, F.col(x_col) == F.col("_i")).drop("_i")


def ranker_tau(ranked: DataFrame, group_col: str = "term",
               item_col: str = "doc_id", x_col: str = "score_micro6",
               y_col: str = "tf") -> DataFrame:
    """Kendall rank correlation between two scorers over the same
    per-group item shortlist — exact pair counts, no sqrt: for each
    group, classify every item pair as concordant (both scorers order
    it the same way), discordant, or tied, and report tau-a and
    Goodman-Kruskal gamma as exact floor-scaled integers.  The
    retrieval read: per probe term, how much does the full ranker
    (BM25's idf + length normalization) reorder the naive raw-tf
    ranking?

    tau-b's sqrt denominator is NOT integer-exact, so it is the one
    statistic deliberately not emitted; gamma = (C-D)/(C+D) is the
    tie-robust alternative that stays rational.

    Output: (group, n_items, n_pairs, concordant, discordant,
    ties_x, ties_y, ties_both, tau_a_micro6, gamma_micro6).

    Scale shape: the self-join is keyed on the group column (an
    equi-join) and each group is a top-k shortlist — k(k-1)/2 pairs
    per group, bounded by the retrieval contract, never corpus-sized.
    One aggregate after.
    """
    a = ranked.select(group_col, F.col(item_col).alias("_i"),
                      F.col(x_col).alias("_xi"),
                      F.col(y_col).alias("_yi"))
    b = ranked.select(group_col, F.col(item_col).alias("_j"),
                      F.col(x_col).alias("_xj"),
                      F.col(y_col).alias("_yj"))
    pairs = a.join(b, group_col).where(F.col("_i") < F.col("_j"))

    def sgn(u, v):
        return F.when(F.col(u) > F.col(v), 1) \
            .when(F.col(u) < F.col(v), -1).otherwise(0)

    p = pairs.select(
        group_col,
        (sgn("_xi", "_xj") * sgn("_yi", "_yj")).alias("_prod"),
        (F.col("_xi") == F.col("_xj")).cast("int").alias("_tx"),
        (F.col("_yi") == F.col("_yj")).cast("int").alias("_ty"))
    n_items = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"))
    agg = (p.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when((F.col("_prod") == 1) & (F.col("_tx") == 0)
                     & (F.col("_ty") == 0), 1).otherwise(0))
        .cast("long").alias("concordant"),
        F.sum(F.when(F.col("_prod") == -1, 1).otherwise(0))
        .cast("long").alias("discordant"),
        F.sum(F.col("_tx") * (1 - F.col("_ty"))).cast("long")
        .alias("ties_x"),
        F.sum(F.col("_ty") * (1 - F.col("_tx"))).cast("long")
        .alias("ties_y"),
        F.sum(F.col("_tx") * F.col("_ty")).cast("long")
        .alias("ties_both")))
    return (n_items.join(agg, group_col)
            .select(group_col, "n_items", "n_pairs", "concordant",
                    "discordant", "ties_x", "ties_y", "ties_both",
                    F.expr("(1000000 * (concordant - discordant))"
                           " div n_pairs").cast("long")
                    .alias("tau_a_micro6"),
                    F.expr("CASE WHEN concordant + discordant = 0"
                           " THEN 0 ELSE"
                           " (1000000 * (concordant - discordant))"
                           " div (concordant + discordant) END")
                    .cast("long").alias("gamma_micro6")))


def good_turing(docs: DataFrame, n: int = 3,
                max_c: int = 20) -> DataFrame:
    """Good-Turing frequency-of-frequencies table for the token
    ``n``-gram distribution — the classic LM smoothing read (Gale &
    Sampson '95 "simple Good-Turing" uses exactly these raw N_c rows
    for small c, and Katz backoff discounts with them): for each
    count c <= max_c, how many types occur exactly c times (N_c), how
    much probability mass they hold (c * N_c tokens), and the
    GT-discounted count c* = (c+1) * N_{c+1} / N_c, floor-scaled
    micro6.  Row c=1's mass over the total IS the unseen-probability
    estimate P0 = N_1 / N.

    n defaults to trigrams: GT only says something in a SPARSE type
    regime (hapax-heavy), which for this corpus's closed unigram
    vocabulary first appears at n=3 — the same reason real LM
    pipelines apply GT at the highest order.

    c* is 0 where N_{c+1} = 0 (the gap case simple GT smooths over —
    emitted honestly as 0, not interpolated, so the table stays an
    exact corpus statistic).

    Scale shape: n-grams are built map-side from the per-doc token
    array (transform over index sequence — no window, no shuffle);
    one hash aggregate to type counts, one vocabulary-sized aggregate
    to the N_c table — at most max_c rows survive, and the adjacency
    join N_c vs N_{c+1} is an equi-join on c over that bounded table.
    """
    counts = (docs.select(_toks().alias("_t"))
              # CASE guard: sequence(1, 0) DESCENDS in Spark, so a
              # doc shorter than n tokens must yield [] explicitly
              .select(F.explode(F.expr(
                  "CASE WHEN size(_t) >= {n} THEN"
                  " transform(sequence(1, size(_t) - {o}),"
                  " i -> concat_ws(' ', slice(_t, i, {n})))"
                  " ELSE array() END".format(
                      o=n - 1, n=n))).alias("gram"))
              .groupBy("gram")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    nc = (counts.where(F.col("c") <= max_c + 1)
          .groupBy("c")
          .agg(F.count(F.lit(1)).cast("long").alias("n_types")))
    nxt = nc.select((F.col("c") - 1).alias("c"),
                    F.col("n_types").alias("_n_next"))
    return (nc.where(F.col("c") <= max_c)
            .join(nxt, "c", "left")
            .select(F.col("c").cast("long").alias("c"), "n_types",
                    (F.col("c") * F.col("n_types")).cast("long")
                    .alias("mass"),
                    F.expr("CASE WHEN _n_next IS NULL THEN 0 ELSE"
                           " (1000000 * (c + 1) * _n_next)"
                           " div n_types END").cast("long")
                    .alias("c_star_micro6")))


def zipf_doubling(docs: DataFrame, n: int = 3,
                  max_rank: int = 256) -> DataFrame:
    """Zipf rank-doubling curve over the token ``n``-gram vocabulary:
    for each rank r in {1, 2, 4, ..., max_rank}, the frequency at
    rank r, at rank 2r, and the exact ratio f(r)/f(2r) micro6 — under
    a Zipf law f ~ r^-s the ratio is a constant 2^s, so the curve's
    flatness IS the power-law check, float-free (the log-log
    regression everyone plots, reduced to exact integer ratios at
    doubling points).

    Ranks order by frequency desc with the gram string as the
    deterministic tie-break.

    Scale shape: one corpus scan to type counts; the global ranking
    window runs over the vocabulary value table (type-table sized,
    the top_terms discipline), and only log2(max_rank)+1 rows
    survive to the rank->2r self-join.
    """
    counts = (docs.select(_toks().alias("_t"))
              .select(F.explode(F.expr(
                  "CASE WHEN size(_t) >= {n} THEN"
                  " transform(sequence(1, size(_t) - {o}),"
                  " i -> concat_ws(' ', slice(_t, i, {n})))"
                  " ELSE array() END".format(
                      o=n - 1, n=n))).alias("gram"))
              .groupBy("gram")
              .agg(F.count(F.lit(1)).cast("long").alias("freq")))
    ranked = counts.withColumn(
        "r", F.row_number().over(
            Window.orderBy(F.desc("freq"), F.asc("gram"))))
    pows = [1 << i for i in range((max_rank).bit_length())]
    a = ranked.where(F.col("r").isin(pows)).select(
        F.col("r").cast("long").alias("rank"),
        F.col("freq").alias("freq_r"))
    b = ranked.where(F.col("r").isin([2 * p for p in pows])).select(
        (F.col("r") / 2).cast("long").alias("rank"),
        F.col("freq").alias("freq_2r"))
    return (a.join(b, "rank")
            .select("rank", "freq_r", "freq_2r",
                    F.expr("(1000000 * freq_r) div freq_2r")
                    .cast("long").alias("ratio_micro6")))


def host_pareto(docs: DataFrame,
                thresholds=(50, 80, 90, 95, 99)) -> DataFrame:
    """Pareto / ABC concentration curve over hosts: for each coverage
    threshold, the smallest set of top hosts (by document count) that
    covers at least that share of the corpus — the "how concentrated
    is the crawl" read behind storage tiering and per-host budget
    decisions.

    Hosts rank by doc count desc with the host name as deterministic
    tie-break; the threshold test is exact integer (100 * cum >=
    t * total), no percentage floats.

    Output: (threshold_pct, n_hosts, covered_docs, total_docs,
    share_micro6), one row per threshold.

    Scale shape: one corpus scan to per-host counts; ranking and
    cumulation run over the host vocabulary table (bounded); the
    threshold fan-out is a 5-literal column explode, not a join.
    """
    hosts = docs.groupBy(F.col("source").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
    w = Window.orderBy(F.desc("n_docs"), F.asc("host"))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (hosts
              .withColumn("rank", F.row_number().over(w))
              .withColumn("cum", F.sum("n_docs").over(wc))
              .withColumn("total", F.sum("n_docs").over(
                  Window.rowsBetween(Window.unboundedPreceding,
                                     Window.unboundedFollowing))))
    fan = ranked.select(
        "rank", "cum", "total",
        F.explode(F.array(*[F.lit(t) for t in thresholds]))
        .alias("threshold_pct"))
    hit = fan.where(100 * F.col("cum") >= F.col("threshold_pct")
                    * F.col("total"))
    return (hit.groupBy("threshold_pct")
            .agg(F.min(F.struct("rank", "cum", "total")).alias("_m"))
            .select(F.col("threshold_pct").cast("int"),
                    F.col("_m.rank").cast("long").alias("n_hosts"),
                    F.col("_m.cum").cast("long").alias("covered_docs"),
                    F.col("_m.total").cast("long").alias("total_docs"),
                    F.expr("(1000000 * _m.cum) div _m.total")
                    .cast("long").alias("share_micro6")))


def k_anonymity(docs: DataFrame, k_values=(2, 5, 10)) -> DataFrame:
    """k-anonymity audit over the corpus's quasi-identifier tuple
    (host, lang, doc-length decile bucket) — the privacy read a
    data-release gate runs before publishing derived tables: a
    document whose quasi-identifier combination is shared by fewer
    than k documents is re-identifiable at that k.

    Reports, per k: how many equivalence classes violate k, how many
    documents sit in violating classes, and their corpus share —
    exact integers.  The length bucket is the doc's token count
    decile over the DISTINCT-value table (the quality_calibration
    rank-decile device), so the quasi-identifier stays deterministic
    and engine-neutral.

    Output: (k, n_classes, n_violating_classes, n_exposed_docs,
    exposed_share_micro6).

    Scale shape: one corpus scan to per-doc token counts, a bounded
    distinct-value window for the decile cut, ONE hash aggregate to
    equivalence classes, then a per-k literal explode over the
    class-size table (class count is bounded by host x lang x 10).
    """
    n_tok = docs.select(
        "doc_id", F.col("source").alias("host"), "lang",
        F.size(_toks()).cast("long").alias("_n"))
    vals = (n_tok.groupBy("_n").agg(F.count(F.lit(1)).alias("_c"))
            .withColumn("_cum", F.sum("_c").over(
                Window.orderBy("_n").rowsBetween(
                    Window.unboundedPreceding, -1)))
            .withColumn("_tot", F.sum("_c").over(
                Window.rowsBetween(Window.unboundedPreceding,
                                   Window.unboundedFollowing)))
            .select("_n", F.expr("(coalesce(_cum, 0) * 10) div _tot")
                    .cast("int").alias("_bucket")))
    classes = (n_tok.join(vals, "_n")
               .groupBy("host", "lang", "_bucket")
               .agg(F.count(F.lit(1)).cast("long").alias("_size")))
    fan = classes.select(
        "_size",
        F.explode(F.array(*[F.lit(k) for k in k_values])).alias("k"))
    return (fan.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum((F.col("_size") < F.col("k")).cast("int"))
        .cast("long").alias("n_violating_classes"),
        F.sum(F.when(F.col("_size") < F.col("k"), F.col("_size"))
              .otherwise(0)).cast("long").alias("n_exposed_docs"),
        F.sum("_size").cast("long").alias("_total"))
        .select(F.col("k").cast("int"), "n_classes",
                "n_violating_classes", "n_exposed_docs",
                F.expr("(1000000 * n_exposed_docs) div _total")
                .cast("long").alias("exposed_share_micro6")))


def token_fertility(docs: DataFrame) -> DataFrame:
    """Tokenizer fertility per language — the multilingual-budget
    read every pretraining mixture decision needs: languages whose
    text shatters into more sub-tokens per word (high fertility) cost
    proportionally more sequence length for the same content.

    Per lang: document count, whitespace words, BPE-ish sub-tokens
    (token_count_bpe's estimator), characters, and the two exact
    ratios — fertility_micro6 = 1e6 * sub-tokens / words and
    chars_per_token_micro6 = 1e6 * chars / sub-tokens.

    Output: (lang, n_docs, n_words, n_subtokens, n_chars,
    fertility_micro6, chars_per_token_micro6).

    Scale shape: all counting is per-row codegen expressions; ONE
    hash aggregate by lang.
    """
    runs = F.size(F.regexp_extract_all(
        F.col("text"), F.lit("[0-9A-Za-z]+"), 0))
    marks = F.size(F.regexp_extract_all(
        F.col("text"), F.lit("[^0-9A-Za-z \n\t]"), 0))
    per = docs.select(
        "lang",
        F.size(_toks()).cast("long").alias("_w"),
        (runs + marks).cast("long").alias("_t"),
        F.length("text").cast("long").alias("_c"))
    return (per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_w").cast("long").alias("n_words"),
        F.sum("_t").cast("long").alias("n_subtokens"),
        F.sum("_c").cast("long").alias("n_chars"))
        .where(F.col("n_words") > 0)
        .select("lang", "n_docs", "n_words", "n_subtokens", "n_chars",
                F.expr("(1000000 * n_subtokens) div n_words")
                .cast("long").alias("fertility_micro6"),
                F.expr("CASE WHEN n_subtokens = 0 THEN 0 ELSE"
                       " (1000000 * n_chars) div n_subtokens END")
                .cast("long").alias("chars_per_token_micro6")))


def split_balance(docs: DataFrame, attr_col: str = "lang") -> DataFrame:
    """Split-balance audit: exact total variation distance of an
    attribute's distribution between every pair of corpus splits
    (train/dev/test from the deterministic md5 split) — the QA gate
    a benchmark owner runs before trusting dev/test as drawn from the
    training distribution.  TVD(P, Q) = 1/2 sum_v |P(v) - Q(v)|,
    cleared of denominators: tvd_micro6 = 1e6 * sum_v |c_av * n_b -
    c_bv * n_a| div (2 * n_a * n_b) — exact BIGINT throughout (both
    engines truncate identically; the numerator is non-negative).

    Output: (split_a, split_b, attr_values, n_a, n_b, tvd_micro6),
    one row per unordered split pair (a < b lexicographically).

    Scale shape: ONE corpus hash aggregate to the (split, value)
    count table; the zero-filled (split x value) grid and the pair
    self-join run over that bounded table (splits x attribute
    vocabulary), never over documents.
    """
    _, split = split_expr()
    cnt = (docs.select(split.alias("split"),
                       F.col(attr_col).alias("v"))
           .groupBy("split", "v")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    splits = cnt.select("split").dropDuplicates()
    vals = cnt.select("v").dropDuplicates()
    grid = (splits.crossJoin(vals)  # bounded: splits x attr vocab
            .join(cnt, ["split", "v"], "left").na.fill(0, ["c"]))
    tot = cnt.groupBy("split").agg(F.sum("c").cast("long").alias("n"))
    g = grid.join(tot, "split")
    a = g.select(F.col("split").alias("split_a"), "v",
                 F.col("c").alias("_ca"), F.col("n").alias("n_a"))
    b = g.select(F.col("split").alias("split_b"),
                 F.col("v").alias("_vb"),
                 F.col("c").alias("_cb"), F.col("n").alias("n_b"))
    return (a.join(b, (a["v"] == b["_vb"])
                   & (a["split_a"] < b["split_b"]))
            .groupBy("split_a", "split_b", "n_a", "n_b")
            .agg(F.count(F.lit(1)).cast("long").alias("attr_values"),
                 F.sum(F.abs(F.col("_ca") * F.col("n_b")
                             - F.col("_cb") * F.col("n_a")))
                 .cast("long").alias("_num"))
            .select("split_a", "split_b", "attr_values", "n_a", "n_b",
                    F.expr("(1000000 * _num) div (2 * n_a * n_b)")
                    .cast("long").alias("tvd_micro6")))


def gains_curve(docs: DataFrame) -> DataFrame:
    """Cumulative gains / lift curve of the LM quality score against
    the curation-gate outcome — the targeting read: if we keep only
    the top k score-deciles, what share of the gate-keepable
    documents do we capture (gain), and how much better than random
    is that (lift)?  Built on the same rank-decile buckets as
    quality_calibration, cumulated from the TOP score downward.

    Exact integers: gain_micro6 = 1e6 * cum_keeps / total_keeps,
    lift_micro6 = 1e6 * cum_keeps * total_docs / (cum_docs *
    total_keeps).

    Output: (bucket, n_docs, n_keep, cum_docs, cum_keeps,
    gain_micro6, lift_micro6), bucket 9 = highest scores first row
    of the cumulation.

    Scale shape: everything after quality_calibration's one corpus
    aggregate runs on the 10-row bucket table (global windows over
    10 rows).
    """
    b = quality_calibration(docs).select("bucket", "n_docs", "n_keep")
    w = (Window.orderBy(F.desc("bucket"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    return (b.withColumn("cum_docs", F.sum("n_docs").over(w)
                         .cast("long"))
            .withColumn("cum_keeps", F.sum("n_keep").over(w)
                        .cast("long"))
            .withColumn("_td", F.sum("n_docs").over(wt))
            .withColumn("_tk", F.sum("n_keep").over(wt))
            .select("bucket", "n_docs", "n_keep", "cum_docs",
                    "cum_keeps",
                    F.expr("(1000000 * cum_keeps) div _tk")
                    .cast("long").alias("gain_micro6"),
                    F.expr("(1000000 * cum_keeps * _td)"
                           " div (cum_docs * _tk)").cast("long")
                    .alias("lift_micro6")))


def doclen_drift(docs: DataFrame) -> DataFrame:
    """Two-sample distribution drift of document length (token
    count) between every pair of corpus splits: the exact
    Kolmogorov-Smirnov statistic D = max_x |F_a(x) - F_b(x)| AND the
    exact Wasserstein-1 (earth-mover) distance W1 = sum_x |F_a(x) -
    F_b(x)| * gap(x) — the continuous-distribution companion to
    split_balance's categorical TVD.  Both cleared of denominators:
    with cum counts C and split sizes n, ks_micro6 = 1e6 * max
    |C_a(x) n_b - C_b(x) n_a| div (n_a n_b), and w1 in token units
    w1_micro6 = 1e6 * sum |C_a n_b - C_b n_a| * gap div (n_a n_b) —
    exact BIGINT throughout.

    Output: (split_a, split_b, n_a, n_b, ks_micro6, w1_micro6).

    Scale shape: one corpus scan to (split, len) counts; the dense
    (split x distinct-length) grid, cumulative windows, and pair
    join all run over the bounded length value domain (the
    doclen_percentiles discipline).
    """
    _, split = split_expr()
    cnt = (docs.select(split.alias("split"),
                       F.size(_toks()).cast("long").alias("x"))
           .groupBy("split", "x")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    splits = cnt.select("split").dropDuplicates()
    vals = cnt.select("x").dropDuplicates()
    grid = (splits.crossJoin(vals)  # bounded: splits x length domain
            .join(cnt, ["split", "x"], "left").na.fill(0, ["c"]))
    w = (Window.partitionBy("split").orderBy("x")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    g = (grid.withColumn("cum", F.sum("c").over(w).cast("long"))
         .withColumn("n", F.sum("c").over(
             Window.partitionBy("split")).cast("long"))
         .withColumn("gap", F.coalesce(
             F.lead("x").over(Window.partitionBy("split")
                              .orderBy("x")) - F.col("x"),
             F.lit(0)).cast("long")))
    a = g.select(F.col("split").alias("split_a"), "x",
                 F.col("cum").alias("_ca"), F.col("n").alias("n_a"),
                 F.col("gap").alias("_gap"))
    b = g.select(F.col("split").alias("split_b"),
                 F.col("x").alias("_xb"),
                 F.col("cum").alias("_cb"), F.col("n").alias("n_b"))
    return (a.join(b, (a["x"] == b["_xb"])
                   & (a["split_a"] < b["split_b"]))
            .withColumn("_d", F.abs(F.col("_ca") * F.col("n_b")
                                    - F.col("_cb") * F.col("n_a")))
            .groupBy("split_a", "split_b", "n_a", "n_b")
            .agg(F.max("_d").cast("long").alias("_ks"),
                 F.sum(F.col("_d") * F.col("_gap")).cast("long")
                 .alias("_w1"))
            .select("split_a", "split_b", "n_a", "n_b",
                    F.expr("(1000000 * _ks) div (n_a * n_b)")
                    .cast("long").alias("ks_micro6"),
                    F.expr("(1000000 * _w1) div (n_a * n_b)")
                    .cast("long").alias("w1_micro6")))


def encoding_advisor(docs: DataFrame,
                     cols=("source", "lang", "text")) -> DataFrame:
    """Dictionary-encoding benefit audit per column — the layout
    decision every columnar writer makes, surfaced as a table: raw
    UTF-8 bytes vs the dictionary form (distinct values' bytes + a
    4-byte code per row).  High-cardinality columns (text) go
    negative — the advisor's honest "do not dict-encode" answer.

    savings_micro6 = 1e6 * (raw - dict) div raw (truncating, may be
    negative — both engines truncate toward zero identically).

    Output: (col_name, n_rows, n_distinct, raw_bytes, dict_bytes,
    savings_micro6).

    Scale shape: per column ONE byte-sum aggregate and ONE distinct
    aggregate; the audited column list is a bounded literal.
    """
    outs = []
    for c in cols:
        raw = docs.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.coalesce(F.sum(F.octet_length(F.col(c))), F.lit(0))
            .cast("long").alias("raw_bytes"))
        dct = (docs.select(F.col(c).alias("_v")).dropDuplicates()
               .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"),
                    F.coalesce(F.sum(F.octet_length("_v")), F.lit(0))
                    .cast("long").alias("_dict_vals")))
        outs.append(
            raw.crossJoin(dct)  # two 1-row frames
            .select(F.lit(c).alias("col_name"), "n_rows",
                    "n_distinct", "raw_bytes",
                    (F.col("_dict_vals") + 4 * F.col("n_rows"))
                    .cast("long").alias("dict_bytes"),
                    F.expr("(1000000 * (raw_bytes"
                           " - (_dict_vals + 4 * n_rows)))"
                           " div raw_bytes").cast("long")
                    .alias("savings_micro6")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def simpson_check(docs: DataFrame) -> DataFrame:
    """Simpson's-paradox audit for the curation gate: does "longer
    documents are kept more often" hold overall AND within every
    language stratum?  A stratum whose covariance sign flips against
    the pooled sign is the aggregation trap every corpus dashboard
    should surface before anyone acts on the pooled number.

    The association is the exact integer covariance numerator
    cov_n = n * sum(x*y) - sum(x) * sum(y) with x = token count and
    y = the gate verdict (0/1) — sign and n^2-scaled magnitude are
    emitted, no variance normalization (sign comparison needs none).

    Output: one row per stratum plus the 'ALL' pooled row:
    (stratum, n_docs, n_keep, cov_n, cov_sign, paradox) where
    paradox = 1 iff the stratum's sign is nonzero and opposite to
    the pooled sign.

    Scale shape: one corpus pass to (stratum, x, y) rows, two hash
    aggregates (per stratum + pooled), a 1-row pooled-sign scalar
    crossJoin.
    """
    cur = corpus_curation(docs).select("doc_id", "n_tokens", "keep")
    d = (docs.select("doc_id", "lang").join(cur, "doc_id")
         .select(F.col("lang").alias("stratum"),
                 F.col("n_tokens").cast("long").alias("x"),
                 F.col("keep").cast("long").alias("y")))

    def cov(frame, label_col):
        return (frame.groupBy(label_col).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("y").cast("long").alias("n_keep"),
            (F.count(F.lit(1)) * F.sum(F.col("x") * F.col("y"))
             - F.sum("x") * F.sum("y")).cast("long").alias("cov_n"))
            .withColumn("cov_sign", F.signum("cov_n").cast("int")))

    strata = cov(d, "stratum")
    pooled = cov(d.withColumn("_all", F.lit("ALL")), "_all") \
        .withColumnRenamed("_all", "stratum")
    psign = pooled.select(F.col("cov_sign").alias("_ps"))
    return (strata.unionByName(pooled)
            .crossJoin(psign)  # 1-row pooled-sign scalar
            .select("stratum", "n_docs", "n_keep", "cov_n",
                    "cov_sign",
                    ((F.col("cov_sign") != 0)
                     & (F.col("cov_sign") == -F.col("_ps")))
                    .cast("int").alias("paradox")))


def casing_profile(docs: DataFrame) -> DataFrame:
    """Casing and digit profile per language — the cheap script-level
    quality features (boilerplate shouting, numeric tables, proper-
    noun density) every corpus dashboard tracks: per lang, the share
    of tokens that start uppercase, are ALL-CAPS (len >= 2), or
    contain a digit, as exact micro6 ratios.

    Output: (lang, n_tokens, n_upper_start, n_all_caps, n_digit,
    upper_start_micro6, all_caps_micro6, digit_micro6).

    Scale shape: per-row codegen predicates over the token array
    (no explode — aggregate filters inside the array), ONE hash
    aggregate by lang.
    """
    toks = _toks()
    n_tok = F.size(toks).cast("long")
    up = F.size(F.filter(
        toks, lambda t: t.rlike("^[A-Z]"))).cast("long")
    caps = F.size(F.filter(
        toks, lambda t: t.rlike("^[A-Z]{2,}$"))).cast("long")
    dig = F.size(F.filter(
        toks, lambda t: t.rlike("[0-9]"))).cast("long")
    per = docs.select("lang", n_tok.alias("_n"), up.alias("_u"),
                      caps.alias("_c"), dig.alias("_d"))
    return (per.groupBy("lang").agg(
        F.sum("_n").cast("long").alias("n_tokens"),
        F.sum("_u").cast("long").alias("n_upper_start"),
        F.sum("_c").cast("long").alias("n_all_caps"),
        F.sum("_d").cast("long").alias("n_digit"))
        .where(F.col("n_tokens") > 0)
        .select("lang", "n_tokens", "n_upper_start", "n_all_caps",
                "n_digit",
                F.expr("(1000000 * n_upper_start) div n_tokens")
                .cast("long").alias("upper_start_micro6"),
                F.expr("(1000000 * n_all_caps) div n_tokens")
                .cast("long").alias("all_caps_micro6"),
                F.expr("(1000000 * n_digit) div n_tokens")
                .cast("long").alias("digit_micro6")))


def zonemap_pruning(docs: DataFrame, capacity: int = 8000) -> DataFrame:
    """Zone-map (min/max file statistics) pruning audit — the Iceberg
    /Parquet scan-planning question: with the corpus clustered on
    (lang, doc_id) and packed into files by a running character-count
    capacity, how many files can each canned predicate skip on
    min/max stats alone, and what is the resulting scan
    amplification?

    file_id = exclusive-running-sum(n_chars) DIV capacity over the
    (lang, doc_id) order; per file the zone map is (min/max n_chars,
    min/max lang).  For each predicate: files whose zone map PROVES
    no row matches are skipped; every row in a surviving file is
    scanned.  scan_amp_micro6 = 10^6 * rows_scanned / rows_matched
    (0 when nothing matches).  All integer / string-ordinal
    arithmetic — exact in any engine.

    Scale shape: the running sum is NOT a one-partition window over
    the corpus — lang is a bounded key (handful of values), so the
    global exclusive cumsum = (broadcast per-lang char-total offset)
    + within-lang window.  The per-file zone-map table is file-count
    sized; the predicate fan-out is a literal explode over it.
    """
    per_lang = (docs.groupBy("lang")
                .agg(F.sum("n_chars").alias("_tot")))
    off = per_lang.withColumn(
        "_off",
        F.coalesce(
            F.sum("_tot").over(
                Window.orderBy("lang")
                .rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0))).drop("_tot")
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    packed = (docs.select("doc_id", "lang", "n_chars")
              .join(F.broadcast(off), "lang")
              .withColumn("_cum",
                          F.col("_off")
                          + F.coalesce(F.sum("n_chars").over(w),
                                       F.lit(0)))
              .withColumn("file_id",
                          F.expr(f"_cum div {int(capacity)}")))
    zones = packed.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("_rows"),
        F.min("n_chars").alias("_min_n"),
        F.max("n_chars").alias("_max_n"),
        F.min("lang").alias("_min_l"),
        F.max("lang").alias("_max_l"),
        F.sum((F.col("n_chars") >= 400).cast("long")).alias("_m1"),
        F.sum((F.col("lang") == "en").cast("long")).alias("_m2"),
        F.sum((F.col("n_chars") < 60).cast("long")).alias("_m3"))
    # predicate catalog: (id, zone-map survives?, matched rows)
    preds = [
        ("n_chars>=400", F.col("_max_n") >= 400, F.col("_m1")),
        ("lang=en", (F.col("_min_l") <= "en") & (F.col("_max_l") >= "en"),
         F.col("_m2")),
        ("n_chars<60", F.col("_min_n") < 60, F.col("_m3")),
    ]
    fan = zones.select(
        "_rows",
        F.explode(F.array(*[
            F.struct(F.lit(pid).alias("pred"),
                     surv.cast("int").alias("_surv"),
                     m.alias("_match"))
            for pid, surv, m in preds])).alias("p")) \
        .select("_rows", "p.pred", "p._surv", "p._match")
    return (fan.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(1 - F.col("_surv")).cast("long").alias("files_skipped"),
        F.sum(F.col("_rows") * F.col("_surv")).cast("long")
        .alias("rows_scanned"),
        F.sum("_match").cast("long").alias("rows_matched"))
        .withColumn(
            "scan_amp_micro6",
            F.when(F.col("rows_matched") > 0,
                   F.expr("(1000000 * rows_scanned)"
                          " div rows_matched"))
            .otherwise(F.lit(0)).cast("long")))


def mcnemar_gates(docs: DataFrame) -> DataFrame:
    """McNemar marginal-homogeneity check between the two cheap
    curation gates on the SAME paired documents: the length gate
    (n_chars >= 200) vs the stopword-profile gate (20 * n_stopwords
    >= n_tokens, lang_id's 'looks-English' rule).  Accuracy-style
    comparisons of two filters on shared data need the PAIRED test —
    only the discordant cells (one gate passes, the other rejects)
    carry information; mcnemar = (n10 - n01)^2 / (n10 + n01).

    Per language: (lang, n11, n10, n01, n00, mcnemar_micro6) with
    mcnemar_micro6 = floor(1e6 * (n10-n01)^2 / (n10+n01)), 0 when
    the gates never disagree.  Pure integer arithmetic.

    Scale shape: one narrow map over the corpus (both gates are
    per-row array expressions — same token pipeline as
    quality_features, inlined so no corpus self-join is needed) and
    one bounded groupBy(lang) — no joins, no window.
    """
    toks = _toks()
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks,
                             lambda t: F.array_contains(stop,
                                                        F.lower(t))))
    gated = (docs.select(
        "lang",
        (F.length("text") >= 200).cast("int").alias("_a"),
        (F.lit(20) * n_stop >= n_tokens).cast("int").alias("_b")))
    agg = gated.groupBy("lang").agg(
        F.sum((F.col("_a") * F.col("_b"))).cast("long").alias("n11"),
        F.sum((F.col("_a") * (1 - F.col("_b")))).cast("long")
        .alias("n10"),
        F.sum(((1 - F.col("_a")) * F.col("_b"))).cast("long")
        .alias("n01"),
        F.sum(((1 - F.col("_a")) * (1 - F.col("_b")))).cast("long")
        .alias("n00"))
    return agg.withColumn(
        "mcnemar_micro6",
        F.when(F.col("n10") + F.col("n01") > 0,
               F.expr("(1000000 * (n10 - n01) * (n10 - n01))"
                      " div (n10 + n01)"))
        .otherwise(F.lit(0)).cast("long"))


def mcc_scores(docs: DataFrame) -> DataFrame:
    """Matthews correlation coefficient for the lang_id heuristic as
    a BINARY detector of English ('en' = positive) — the
    chance-robust single-number complement to langid_kappa: unlike
    accuracy or F1, MCC only rewards doing well on BOTH classes,
    which matters when one language dominates the crawl.

    MCC = (TP*TN - FP*FN) / sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN)) is
    irrational, so it is emitted in exact integer pieces: mcc_num =
    TP*TN - FP*FN, mcc_den2 = the four-margin product, mcc_sign,
    and mcc2_micro6 = floor(1e6 * num^2 / den2) (0 when any margin
    is empty — the conventional MCC=0 degenerate case).

    Output: one row (tp, fp, fn, tn, mcc_num, mcc_den2, mcc_sign,
    mcc2_micro6).  The raw num/den2 decomposition is BIGINT-exact to
    ~50k docs; mcc2_micro6 itself is computed in DECIMAL(38,0)
    (DuckDB HUGEINT) so the quotient stays exact far beyond that —
    at full crawl scale, evaluate on the held-out split (the only
    place gold lang labels exist anyway).

    Scale shape: one narrow map over the corpus + one global 4-cell
    aggregate — no joins, no window (lang_id's stopword features are
    inlined per row).
    """
    toks = _toks()
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    pred_en = (F.lit(20)
               * F.size(F.filter(toks,
                                 lambda t: F.array_contains(
                                     stop, F.lower(t))))
               >= F.size(toks)).cast("int")
    gold_en = (F.col("lang") == "en").cast("int")
    cells = docs.select(pred_en.alias("_p"), gold_en.alias("_g")).agg(
        F.sum(F.col("_p") * F.col("_g")).cast("long").alias("tp"),
        F.sum(F.col("_p") * (1 - F.col("_g"))).cast("long")
        .alias("fp"),
        F.sum((1 - F.col("_p")) * F.col("_g")).cast("long")
        .alias("fn"),
        F.sum((1 - F.col("_p")) * (1 - F.col("_g"))).cast("long")
        .alias("tn"))
    return (cells
            .withColumn("mcc_num",
                        (F.col("tp") * F.col("tn")
                         - F.col("fp") * F.col("fn")).cast("long"))
            .withColumn("mcc_den2",
                        ((F.col("tp") + F.col("fp"))
                         * (F.col("tp") + F.col("fn"))
                         * (F.col("tn") + F.col("fp"))
                         * (F.col("tn") + F.col("fn"))).cast("long"))
            .withColumn("mcc_sign",
                        F.signum("mcc_num").cast("int"))
            .withColumn("mcc2_micro6",
                        # 1e6 * num^2 overflows BIGINT once the
                        # corpus passes ~3k docs — the numerator is
                        # widened to DECIMAL(38,0) (DuckDB: HUGEINT)
                        # and only the <=1e6 quotient comes back
                        F.when(F.col("mcc_den2") > 0,
                               F.expr(
                                   "(CAST(1000000 AS DECIMAL(38,0))"
                                   " * mcc_num * mcc_num)"
                                   " div mcc_den2"))
                        .otherwise(F.lit(0)).cast("long")))


def l_diversity(docs: DataFrame, l_values=(2, 3, 5)) -> DataFrame:
    """l-diversity + t-closeness audit — the privacy follow-up to
    k_anonymity: class SIZE alone does not protect a sensitive
    attribute when everyone in the class shares its value.  Here the
    released quasi-identifier is (lang, token-count decile) and the
    sensitive attribute is the HOST (source): can an attacker who
    knows a document's language and rough length infer where it was
    crawled from?

    Per equivalence class: distinct-l = COUNT(DISTINCT host); the
    class violates l when distinct-l < l.  t-closeness is the exact
    total-variation distance between the class's host distribution
    and the corpus's: with c_h = class host counts, g_h = global
    host counts, n = class size, N = corpus size,
    sum_h |c_h*N - g_h*n| = sum_{h in class}(|c_h*N - g_h*n| -
    g_h*n) + N*n (absent hosts fold into the closed form), and
    tvd_micro6 = floor(1e6 * sum / (2*n*N)) — pure integers.

    Output, one row per l: (l, n_classes, n_violating_classes,
    n_exposed_docs, exposed_share_micro6, max_tvd_micro6) —
    max_tvd_micro6 is l-independent and repeated for convenience.

    Scale shape: one corpus scan to token counts, the bounded
    distinct-value decile window, one (lang, bucket, host) hash
    aggregate, a broadcast join against the bounded global host
    table, then bounded-size class math — the corpus is touched
    once.
    """
    n_tok = docs.select(
        "doc_id", F.col("source").alias("host"), "lang",
        F.size(_toks()).cast("long").alias("_n"))
    vals = (n_tok.groupBy("_n").agg(F.count(F.lit(1)).alias("_c"))
            .withColumn("_cum", F.sum("_c").over(
                Window.orderBy("_n").rowsBetween(
                    Window.unboundedPreceding, -1)))
            .withColumn("_tot", F.sum("_c").over(
                Window.rowsBetween(Window.unboundedPreceding,
                                   Window.unboundedFollowing)))
            .select("_n", F.expr("(coalesce(_cum, 0) * 10) div _tot")
                    .cast("int").alias("_bucket")))
    bucketed = n_tok.join(vals, "_n")
    cells = (bucketed.groupBy("lang", "_bucket", "host")
             .agg(F.count(F.lit(1)).cast("long").alias("_ch")))
    ghost = (bucketed.groupBy("host")
             .agg(F.count(F.lit(1)).cast("long").alias("_gh")))
    # corpus total as a lazy 1-row broadcast scalar (the
    # trending_entities dangling-mass idiom) — keeps the builder
    # fully lazy; the resulting 1-row BNLJ is plan-lint allowlisted
    total = ghost.agg(F.sum("_gh").cast("long").alias("_N"))
    wcls = Window.partitionBy("lang", "_bucket")
    per_cell = (cells.join(F.broadcast(ghost), "host")
                .crossJoin(F.broadcast(total))
                .withColumn("_ncls", F.sum("_ch").over(wcls))
                .select(
                    "lang", "_bucket", "_ch", "_N",
                    (F.abs(F.col("_ch") * F.col("_N")
                           - F.col("_gh") * F.col("_ncls"))
                     - F.col("_gh") * F.col("_ncls")).alias("_term")))
    classes = (per_cell.groupBy("lang", "_bucket", "_N")
               .agg(F.count(F.lit(1)).cast("long").alias("_ldiv"),
                    F.sum("_ch").cast("long").alias("_size"),
                    F.sum("_term").cast("long").alias("_tsum"))
               .withColumn(
                   "_tvd",
                   F.expr("(1000000 * (_tsum + _size * _N))"
                          " div (2 * _size * _N)")
                   .cast("long")))
    fan = classes.select(
        "_ldiv", "_size", "_tvd",
        F.explode(F.array(*[F.lit(v) for v in l_values])).alias("l"))
    return (fan.groupBy("l").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum((F.col("_ldiv") < F.col("l")).cast("int"))
        .cast("long").alias("n_violating_classes"),
        F.sum(F.when(F.col("_ldiv") < F.col("l"), F.col("_size"))
              .otherwise(0)).cast("long").alias("n_exposed_docs"),
        F.sum("_size").cast("long").alias("_total"),
        F.max("_tvd").cast("long").alias("max_tvd_micro6"))
        .select(F.col("l").cast("int"), "n_classes",
                "n_violating_classes", "n_exposed_docs",
                F.expr("(1000000 * n_exposed_docs) div _total")
                .cast("long").alias("exposed_share_micro6"),
                "max_tvd_micro6"))


def pr_curve(scored: DataFrame, id_col: str = "doc_id",
             score_col: str = "score",
             label_col: str = "pos") -> DataFrame:
    """11-point interpolated precision-recall curve, EXACT: at each
    recall decile r = j/10, report the maximum precision over all
    ranking cutoffs whose recall reaches r — the TREC-classic PR
    summary, emitted as the true rational (prec_num/prec_den) plus
    its micro6 floor, so engines agree bit-for-bit with no float
    precision anywhere.

    Ranking order is (score DESC, id ASC) — the deterministic
    tie-break both engines replay identically.  Cutoff comparisons
    are pure cross-multiplication: recall(k) >= j/10 iff 10*tp_k >=
    j*P, and the argmax precision uses the exact order key
    floor(1e12 * tp / k) (distinct fractions tp/k over k <= 1e5
    differ by > 1e-10, so the floored key never reorders them),
    ties to the SMALLEST k.

    Output: (recall_decile, k, tp, prec_num, prec_den,
    prec_micro6).

    Scale shape: this is an EVALUATION-SET operator (gold labels
    exist only on the held-out split) — the running-tp window is a
    single ordered pass over that bounded split, then an 11-way
    literal explode and one keyed argmax window.
    """
    w = (Window.orderBy(F.col("_s").desc(), F.col("_id"))
         .rowsBetween(Window.unboundedPreceding, 0))
    ranked = (scored.select(
        F.col(id_col).alias("_id"),
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("long").alias("_y"))
        .withColumn("_k", F.count(F.lit(1)).over(w))
        .withColumn("_tp", F.sum("_y").over(w))
        .withColumn("_P", F.sum("_y").over(
            Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing))))
    fan = (ranked.where(F.col("_P") > 0)
           .select("_k", "_tp", "_P",
                   F.explode(F.array(*[F.lit(j) for j in range(11)]))
                   .alias("recall_decile"))
           .where(F.lit(10) * F.col("_tp")
                  >= F.col("recall_decile") * F.col("_P"))
           .withColumn("_key",
                       F.expr("(1000000000000 * _tp) div _k")))
    pick = Window.partitionBy("recall_decile").orderBy(
        F.col("_key").desc(), F.col("_k").asc())
    return (fan.withColumn("_rn", F.row_number().over(pick))
            .where(F.col("_rn") == 1)
            .select(F.col("recall_decile").cast("int"),
                    F.col("_k").cast("long").alias("k"),
                    F.col("_tp").cast("long").alias("tp"),
                    F.col("_tp").cast("long").alias("prec_num"),
                    F.col("_k").cast("long").alias("prec_den"),
                    F.expr("(1000000 * _tp) div _k").cast("long")
                    .alias("prec_micro6")))


def jain_fairness(docs: DataFrame) -> DataFrame:
    """Jain's fairness index of the document distribution under the
    three partitioning keys a pipeline actually shards by — host
    (source), language, and the md5-nibble hash bucket: J =
    (sum x)^2 / (n * sum x^2), the classic scheduling-fairness
    number (1 = perfectly even, 1/n = everything on one shard).
    The skew-triage companion to join_skew/shard_rebalance: one
    comparable scalar per candidate key.

    Exact: counts are integers, so J's numerator and denominator
    are BIGINT and jain_micro6 = floor(1e6 * (sum)^2 / (n *
    sum_sq)).  The hash bucket is the corpus-wide md5 last-nibble
    device (hash_uniformity's), so this row doubles as a fairness
    view of that audit.

    Output: (grouping, n_groups, n_docs, sum_sq, jain_micro6).

    Scale shape: three bounded hash aggregates over one corpus scan
    each (host/lang/16-bucket), then constant-size arithmetic.
    """
    nib = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                              32, 1), 16, 10).cast("int"))
    outs = []
    for name, key in [("host", F.col("source")),
                      ("lang", F.col("lang")),
                      ("md5_bucket", nib.cast("string"))]:
        cnt = (docs.select(key.alias("_k"))
               .groupBy("_k").agg(F.count(F.lit(1)).alias("_c")))
        outs.append(cnt.agg(
            F.lit(name).alias("grouping"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("_c").cast("long").alias("n_docs"),
            F.sum(F.col("_c") * F.col("_c")).cast("long")
            .alias("sum_sq")))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.withColumn(
        "jain_micro6",
        F.expr("(1000000 * n_docs * n_docs) div (n_groups * sum_sq)")
        .cast("long"))


def spearman_check(scored: DataFrame, x_col: str = "x",
                   y_col: str = "y") -> DataFrame:
    """Tie-aware Spearman rank correlation between two integer doc
    statistics — the monotone-association companion to ranker_tau's
    Kendall: Pearson on average ranks, emitted float-free.

    Ranks come from the VALUE HISTOGRAMS (no per-row sort): for a
    value v with c_v occurrences and cum_v values strictly below,
    the doubled average rank is r2(v) = 2*cum_v + c_v + 1 — an
    integer even under ties.  Then with n rows, cov_num = n*sum(r2x
    *r2y) - sum(r2x)*sum(r2y) and var_x/var_y analogously; rho =
    cov/sqrt(var_x*var_y) is irrational, so the output carries the
    exact pieces plus sign and rho2_micro6 = floor(1e6 * cov^2 /
    (var_x*var_y)), computed in DECIMAL(38,0) (DuckDB HUGEINT) —
    cov^2 overflows BIGINT beyond ~1k rows.

    Output: one row (n, cov_num, var_x, var_y, rho_sign,
    rho2_micro6).

    Scale shape: two bounded value-histogram aggregates, two
    broadcast joins to attach r2 per row, ONE global moment
    aggregate — no global sort, no per-row window.
    """
    def _r2(col):
        hist = (scored.groupBy(F.col(col).alias("_v"))
                .agg(F.count(F.lit(1)).alias("_c")))
        return (hist.withColumn(
            "_cum",
            F.coalesce(F.sum("_c").over(
                Window.orderBy("_v").rowsBetween(
                    Window.unboundedPreceding, -1)), F.lit(0)))
            .select(F.col("_v").alias(col),
                    (F.lit(2) * F.col("_cum") + F.col("_c") + 1)
                    .cast("long").alias(f"_r2_{col}")))

    joined = (scored.select(x_col, y_col)
              .join(F.broadcast(_r2(x_col)), x_col)
              .join(F.broadcast(_r2(y_col)), y_col))
    m = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(f"_r2_{x_col}").cast("long").alias("_sx"),
        F.sum(f"_r2_{y_col}").cast("long").alias("_sy"),
        F.sum(F.col(f"_r2_{x_col}") * F.col(f"_r2_{x_col}"))
        .cast("long").alias("_sxx"),
        F.sum(F.col(f"_r2_{y_col}") * F.col(f"_r2_{y_col}"))
        .cast("long").alias("_syy"),
        F.sum(F.col(f"_r2_{x_col}") * F.col(f"_r2_{y_col}"))
        .cast("long").alias("_sxy"))
    return (m.select(
        "n",
        (F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
        .cast("long").alias("cov_num"),
        (F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        .cast("long").alias("var_x"),
        (F.col("n") * F.col("_syy") - F.col("_sy") * F.col("_sy"))
        .cast("long").alias("var_y"))
        .withColumn("rho_sign", F.signum("cov_num").cast("int"))
        .withColumn(
            "rho2_micro6",
            F.when((F.col("var_x") > 0) & (F.col("var_y") > 0),
                   F.expr("(CAST(1000000 AS DECIMAL(38,0))"
                          " * cov_num * cov_num)"
                          " div (CAST(var_x AS DECIMAL(38,0))"
                          " * var_y)"))
            .otherwise(F.lit(0)).cast("long")))


def readability_profile(docs: DataFrame) -> DataFrame:
    """Syllable-complexity profile per language — the readability
    half of Flesch/SMOG that survives a corpus with no sentence
    punctuation (this one): syllables per word and the share of
    polysyllabic (3+) words, the two lexical-difficulty terms those
    grades weight.

    Syllables are the classic regex estimator: vowel-GROUP count
    ([aeiouy]+ runs in the lowercased token), floored at 1 per word
    (vowel-less tokens count one) — deterministic and identical in
    RE2/Java regex (no lookaround).  All integers; ratios are micro6
    floors.

    Output: (lang, n_words, n_syllables, n_polysyllabic,
    syll_per_word_micro6, poly_share_micro6).

    Scale shape: one map-side explode + ONE bounded groupBy(lang) —
    no joins, no window.
    """
    tok = F.explode(_toks()).alias("tok")
    base = docs.select("lang", tok)
    groups = F.size(F.expr(
        "regexp_extract_all(lower(tok), '[aeiouy]+', 0)"))
    syl = F.greatest(F.lit(1), groups)
    return (base.select("lang", syl.alias("_s"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                 F.sum("_s").cast("long").alias("n_syllables"),
                 F.sum((F.col("_s") >= 3).cast("int")).cast("long")
                 .alias("n_polysyllabic"))
            .withColumn("syll_per_word_micro6",
                        F.expr("(1000000 * n_syllables) div n_words")
                        .cast("long"))
            .withColumn("poly_share_micro6",
                        F.expr("(1000000 * n_polysyllabic)"
                               " div n_words").cast("long")))


def bitmap_runs(docs: DataFrame) -> DataFrame:
    """Roaring-style encoding audit of each language's doc_id set —
    the index-layout decision a posting/deletion-vector writer makes
    per container: RUN-length encode, keep a BITMAP, or keep the raw
    id LIST?  Islands of consecutive doc_ids are the classic
    gaps-and-islands device: doc_id - DENSE row_number is constant
    within a run.

    Per lang: n_docs, n_runs, span (max-min+1), longest_run,
    avg_run_x1000 = floor(1000 * n_docs / n_runs), and the exact
    bit costs of the three encodings (bits_run = 128 * n_runs
    [64-bit start + len], bits_bitmap = span, bits_list = 64 *
    n_docs) plus the arg-min verdict (ties: run < bitmap < list).

    Scale shape: one keyed window (row_number within lang) + two
    keyed aggregates — the same shuffle a per-container index build
    pays anyway.
    """
    w = Window.partitionBy("lang").orderBy("doc_id")
    runs = (docs.select("lang", "doc_id")
            .withColumn("_grp",
                        F.col("doc_id") - F.row_number().over(w))
            .groupBy("lang", "_grp")
            .agg(F.count(F.lit(1)).alias("_len")))
    per = (runs.groupBy("lang")
           .agg(F.sum("_len").cast("long").alias("n_docs"),
                F.count(F.lit(1)).cast("long").alias("n_runs"),
                F.max("_len").cast("long").alias("longest_run")))
    span = (docs.groupBy("lang")
            .agg((F.max("doc_id") - F.min("doc_id") + 1)
                 .cast("long").alias("span")))
    out = (per.join(span, "lang")
           .withColumn("avg_run_x1000",
                       F.expr("(1000 * n_docs) div n_runs")
                       .cast("long"))
           .withColumn("bits_run",
                       (F.lit(128) * F.col("n_runs")).cast("long"))
           .withColumn("bits_bitmap", F.col("span").cast("long"))
           .withColumn("bits_list",
                       (F.lit(64) * F.col("n_docs")).cast("long")))
    verdict = (F.when((F.col("bits_run") <= F.col("bits_bitmap"))
                      & (F.col("bits_run") <= F.col("bits_list")),
                      "run")
               .when(F.col("bits_bitmap") <= F.col("bits_list"),
                     "bitmap")
               .otherwise("list"))
    return out.select("lang", "n_docs", "n_runs", "span",
                      "longest_run", "avg_run_x1000", "bits_run",
                      "bits_bitmap", "bits_list",
                      verdict.alias("verdict"))


def lang_vocab_overlap(docs: DataFrame) -> DataFrame:
    """Pairwise vocabulary overlap between languages — the
    contamination / code-switching read behind lang_id's failure
    modes: how much of one language's lexicon appears verbatim in
    another's?  High overlap predicts exactly the confusions the
    kappa/MCC audits count.

    Vocabularies are distinct lowercase whitespace tokens per lang;
    per unordered pair (lang_a < lang_b): both vocabulary sizes, the
    intersection, and exact Jaccard + both containments as micro6
    floors (union = v_a + v_b - n_common).

    Output: (lang_a, lang_b, v_a, v_b, n_common, jaccard_micro6,
    contain_a_micro6, contain_b_micro6).

    Scale shape: one distinct (lang, token) aggregate, a self-join
    keyed on TOKEN (high-cardinality equi-join, not a lang
    cartesian), one bounded pair roll-up + broadcast size joins.
    """
    vocab = (docs.select(
        "lang",
        F.explode(_toks()).alias("tok"))
        .select("lang", F.lower("tok").alias("tok"))
        .dropDuplicates())
    sizes = vocab.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("v"))
    a = vocab.select(F.col("lang").alias("lang_a"), "tok")
    b = vocab.select(F.col("lang").alias("lang_b"), "tok")
    common = (a.join(b, "tok")
              .where(F.col("lang_a") < F.col("lang_b"))
              .groupBy("lang_a", "lang_b")
              .agg(F.count(F.lit(1)).cast("long").alias("n_common")))
    sa = sizes.select(F.col("lang").alias("lang_a"),
                      F.col("v").alias("v_a"))
    sb = sizes.select(F.col("lang").alias("lang_b"),
                      F.col("v").alias("v_b"))
    return (common.join(F.broadcast(sa), "lang_a")
            .join(F.broadcast(sb), "lang_b")
            .select("lang_a", "lang_b", "v_a", "v_b", "n_common",
                    F.expr("(1000000 * n_common)"
                           " div (v_a + v_b - n_common)")
                    .cast("long").alias("jaccard_micro6"),
                    F.expr("(1000000 * n_common) div v_a")
                    .cast("long").alias("contain_a_micro6"),
                    F.expr("(1000000 * n_common) div v_b")
                    .cast("long").alias("contain_b_micro6")))


def pareto_knee(docs: DataFrame) -> DataFrame:
    """Exact knee (Kneedle-style) of the host-coverage Pareto curve
    — WHERE to stop when budgeting per-host work: hosts ranked by
    doc count descending trace the cumulative-coverage curve
    (rank k, cum_k); the knee is the point FURTHEST from the chord
    between (0, 0) and (H, N), which maximizes the integer cross
    product 2*area = |H * cum_k - N * k| — no sqrt, no floats,
    exact argmax (ties to the smallest rank).

    Output: one row (n_hosts, n_docs, knee_rank, knee_cum_docs,
    knee_2area, knee_coverage_micro6, knee_rank_share_micro6).

    Scale shape: one bounded host aggregate, one window over the
    host-count table (host cardinality, not corpus), one argmax.
    """
    counts = (docs.groupBy(F.col("source").alias("host"))
              .agg(F.count(F.lit(1)).alias("_c")))
    w = Window.orderBy(F.col("_c").desc(), F.col("host"))
    wt = Window.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    curve = (counts
             .withColumn("_k", F.row_number().over(w))
             .withColumn("_cum", F.sum("_c").over(
                 w.rowsBetween(Window.unboundedPreceding, 0)))
             .withColumn("_H", F.count(F.lit(1)).over(wt))
             .withColumn("_N", F.sum("_c").over(wt))
             .withColumn("_area",
                         F.abs(F.col("_H") * F.col("_cum")
                               - F.col("_N") * F.col("_k"))))
    pick = Window.orderBy(F.col("_area").desc(), F.col("_k"))
    return (curve.withColumn("_r", F.row_number().over(pick))
            .where(F.col("_r") == 1)
            .select(F.col("_H").cast("long").alias("n_hosts"),
                    F.col("_N").cast("long").alias("n_docs"),
                    F.col("_k").cast("long").alias("knee_rank"),
                    F.col("_cum").cast("long").alias("knee_cum_docs"),
                    F.col("_area").cast("long").alias("knee_2area"),
                    F.expr("(1000000 * _cum) div _N").cast("long")
                    .alias("knee_coverage_micro6"),
                    F.expr("(1000000 * _k) div _H").cast("long")
                    .alias("knee_rank_share_micro6")))


def oov_rate(docs: DataFrame) -> DataFrame:
    """Out-of-vocabulary audit of the dev/test splits against the
    TRAIN vocabulary — the first number an LM/NER training run needs
    after splitting: how much of the held-out text is literally
    unseen?  Token-level OOV bounds the best achievable held-out
    likelihood; type-level OOV sizes the UNK problem.

    Splits come from split_expr (the deterministic md5-bucket device
    every split-dependent query here shares); vocabulary = distinct
    lowercase whitespace tokens of the train split.

    Output per eval split: (split, n_tokens, n_types, oov_tokens,
    oov_types, oov_token_micro6, oov_type_micro6).

    Scale shape: the split is a pure column expression (no join);
    train vocab is one distinct aggregate BROADCAST into a left-anti
    -style null-flag join keyed on token; two bounded roll-ups.
    """
    _, split = split_expr()
    toks = (docs.select(
        split.alias("split"),
        F.explode(F.transform(_toks(), lambda t: F.lower(t)))
        .alias("tok")))
    train_vocab = (toks.where(F.col("split") == "train")
                   .select("tok").dropDuplicates()
                   .withColumn("_seen", F.lit(1)))
    ev = (toks.where(F.col("split") != "train")
          .join(F.broadcast(train_vocab), "tok", "left"))
    tok_level = ev.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("_seen").isNull().cast("int")).cast("long")
        .alias("oov_tokens"))
    type_level = (ev.select("split", "tok", "_seen").dropDuplicates()
                  .groupBy("split").agg(
                      F.count(F.lit(1)).cast("long").alias("n_types"),
                      F.sum(F.col("_seen").isNull().cast("int"))
                      .cast("long").alias("oov_types")))
    return (tok_level.join(type_level, "split")
            .select("split", "n_tokens", "n_types", "oov_tokens",
                    "oov_types",
                    F.expr("(1000000 * oov_tokens) div n_tokens")
                    .cast("long").alias("oov_token_micro6"),
                    F.expr("(1000000 * oov_types) div n_types")
                    .cast("long").alias("oov_type_micro6")))


def mann_whitney(docs: DataFrame, group_col: str = "lang",
                 value_col: str = "n_chars") -> DataFrame:
    """Exact tie-aware Mann-Whitney U between every pair of groups'
    value distributions — the rank-based location-shift test that
    completes the drift family (KS statistic, Wasserstein-1,
    categorical TVD): where KS asks "do the CDFs differ anywhere",
    Mann-Whitney asks "does one group stochastically dominate", and
    is the standard pre-gate before pooling two crawl languages (or
    two snapshot dates) into one training mixture.

    Doubled-U trick keeps everything integer under ties: 2*U_a =
    2*#{a>b pairs} + #{a=b pairs}, computed from the per-group VALUE
    HISTOGRAMS (never the n_a*n_b pair space): for each value v,
    a's count c_a(v) contributes c_a(v) * (2*below_b(v) + c_b(v)).
    The normal-approximation z^2 with the standard tie correction
    sum(t^3 - t) is rational, so the output carries exact integer
    pieces plus z2_micro6 = floor(1e6 * (2U - n_a*n_b)^2 * 3*n*(n-1)
    / (n_a*n_b*((n^3 - n) - tie_cubes))) in DECIMAL(38,0) (the
    squared numerator overflows BIGINT past ~50k rows/group).

    Output: one row per unordered group pair (group_a < group_b):
    (group_a, group_b, n_a, n_b, u2_a, tie_cubes, shift_sign,
    z2_micro6) — all integers.

    Scale shape: ONE corpus-wide histogram aggregate; the pivot is
    over the bounded group domain (languages) and the single
    unpartitioned window runs over the value histogram, whose size
    is bounded by the value DOMAIN (doc-length cap), not the corpus
    — the same device as spearman_check.  Pair fan-out is
    L*(L-1)/2 structs exploded per histogram row, then one hash
    aggregate; the n_a*n_b comparison space is never materialized.
    """
    hist = (docs.groupBy(group_col, value_col)
            .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    groups = sorted(
        r[0] for r in hist.select(group_col).distinct().collect())
    piv = (hist.groupBy(value_col)
           .pivot(group_col, groups).agg(F.first("_c"))
           .na.fill(0))
    w = (Window.orderBy(value_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    for g in groups:
        piv = piv.withColumn(
            f"_cum_{g}",
            F.coalesce(F.sum(F.col(f"`{g}`")).over(w), F.lit(0)))
    pairs = [(a, b) for i, a in enumerate(groups)
             for b in groups[i + 1:]]
    structs = []
    for a, b in pairs:
        ca, cb = F.col(f"`{a}`"), F.col(f"`{b}`")
        t = ca + cb
        structs.append(F.struct(
            F.lit(a).alias("group_a"), F.lit(b).alias("group_b"),
            (ca * (F.lit(2) * F.col(f"`_cum_{b}`") + cb))
            .cast("long").alias("_u2c"),
            ca.cast("long").alias("_ca"), cb.cast("long").alias("_cb"),
            (t * t * t - t).cast("long").alias("_tie")))
    ex = (piv.select(F.explode(F.array(*structs)).alias("p"))
          .select("p.*"))
    agg = (ex.groupBy("group_a", "group_b").agg(
        F.sum("_ca").cast("long").alias("n_a"),
        F.sum("_cb").cast("long").alias("n_b"),
        F.sum("_u2c").cast("long").alias("u2_a"),
        F.sum("_tie").cast("long").alias("tie_cubes")))
    return (agg
            .withColumn("shift_sign",
                        F.signum(F.col("u2_a") - F.col("n_a") * F.col("n_b"))
                        .cast("int"))
            .withColumn(
                "z2_micro6",
                F.expr(
                    "CASE WHEN n_a > 0 AND n_b > 0 AND"
                    " (CAST(n_a + n_b AS DECIMAL(38,0)) * (n_a + n_b)"
                    " * (n_a + n_b) - (n_a + n_b)) - tie_cubes > 0"
                    " THEN CAST((CAST(1000000 AS DECIMAL(38,0))"
                    " * (u2_a - n_a * n_b) * (u2_a - n_a * n_b)"
                    " * 3 * (n_a + n_b) * (n_a + n_b - 1))"
                    " div (CAST(n_a AS DECIMAL(38,0)) * n_b"
                    " * ((CAST(n_a + n_b AS DECIMAL(38,0))"
                    " * (n_a + n_b) * (n_a + n_b)"
                    " - (n_a + n_b)) - tie_cubes)) AS BIGINT)"
                    " ELSE 0 END"))
            .select("group_a", "group_b", "n_a", "n_b", "u2_a",
                    "tie_cubes", "shift_sign", "z2_micro6"))


def robust_location(docs: DataFrame, group_col: str = "lang",
                    value_col: str = "n_chars",
                    trim_pct: int = 5) -> DataFrame:
    """Exact trimmed and winsorized doc-length means per group — the
    robust-location companion to doclen_percentiles/doclen_drift:
    corpus length stats are dominated by boilerplate dumps and empty
    shells at the tails, so mixture decisions should gate on a
    trimmed mean, not the raw one.  k = n * trim_pct // 100 values
    are dropped from EACH side (trimmed) or clamped to the cut
    values (winsorized).

    Rank arithmetic on the VALUE HISTOGRAM, never a per-row sort:
    with below(v) values strictly smaller and c(v) ties at v, the
    kept mass at v for the rank window [k+1, n-k] is
    max(0, min(below+c, n-k) - max(below+1, k+1) + 1); the cut
    values are the min v whose running count reaches k+1 (lo) and
    n-k (hi); winsor_sum = trimmed_sum + k * (lo_cut + hi_cut).
    All integers; means floor-scaled micro6.

    Output: (group, n, k, lo_cut, hi_cut, trimmed_sum,
    trimmed_mean_micro6, winsor_sum, winsor_mean_micro6).

    Scale shape: ONE corpus histogram aggregate, one per-group
    cumulative window over the bounded value domain, one per-group
    roll-up — the spearman_check/mann_whitney device.
    """
    hist = (docs.groupBy(F.col(group_col).alias("group"),
                         F.col(value_col).alias("v"))
            .agg(F.count(F.lit(1)).cast("long").alias("c")))
    w = (Window.partitionBy("group").orderBy("v")
         .rowsBetween(Window.unboundedPreceding, -1))
    h = (hist.withColumn("below",
                         F.coalesce(F.sum("c").over(w), F.lit(0)))
         .withColumn("n", F.sum("c").over(
             Window.partitionBy("group").rowsBetween(
                 Window.unboundedPreceding,
                 Window.unboundedFollowing)))
         .withColumn("k", F.expr(f"n * {trim_pct} div 100")))
    kept = F.expr("greatest(CAST(0 AS BIGINT), "
                  "least(below + c, n - k) "
                  "- greatest(below + 1, k + 1) + 1)")
    agg = (h.withColumn("_kept", kept)
           .groupBy("group").agg(
               F.first("n").alias("n"),
               F.first("k").alias("k"),
               F.min(F.when(F.col("below") + F.col("c")
                            >= F.col("k") + 1, F.col("v")))
               .cast("long").alias("lo_cut"),
               F.min(F.when(F.col("below") + F.col("c")
                            >= F.col("n") - F.col("k"), F.col("v")))
               .cast("long").alias("hi_cut"),
               F.sum(F.col("v") * F.col("_kept")).cast("long")
               .alias("trimmed_sum")))
    return (agg.select(
        "group", F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"), "lo_cut", "hi_cut",
        "trimmed_sum",
        F.expr("CAST(1000000 * trimmed_sum div (n - 2 * k)"
               " AS BIGINT)").alias("trimmed_mean_micro6"),
        (F.col("trimmed_sum")
         + F.col("k") * (F.col("lo_cut") + F.col("hi_cut")))
        .cast("long").alias("winsor_sum"))
        .withColumn("winsor_mean_micro6",
                    F.expr("CAST(1000000 * winsor_sum div n"
                           " AS BIGINT)")))


def ta_depth_audit(scored: DataFrame, group_col: str = "group",
                   id_col: str = "doc_id", s1_col: str = "s1",
                   s2_col: str = "s2", k: int = 5,
                   depths: tuple = (1, 2, 4, 8, 16, 32, 64, 128, 256,
                                    512)) -> DataFrame:
    """Fagin Threshold-Algorithm depth audit — how deep must sorted
    scans of TWO ranked lists (same items, different scores) run
    before the classic TA stop rule certifies the top-``k`` by
    combined score?  This is the design audit behind multi-signal
    selection (quality score x length, BM25 x freshness): if the
    certified stop depth is tiny, rank-merge selection can skip
    scoring the tail entirely.

    TA semantics, exactly: at depth d the threshold is
    T(d) = s1(d-th of list 1) + s2(d-th of list 2) (row_number
    order, ties by id); an item is SEEN iff min(r1, r2) <= d; the
    scan may stop iff at least k seen items have combined score
    >= T(d) (equivalent to kth-best-seen >= T(d)).  Both depth
    probes and groups are bounded, so the audit emits the full
    (group x probe-depth) grid; when d exceeds the group (threshold
    NULL, both lists exhausted) the scan has trivially stopped and
    n_above is NULL.

    Output per (group, depth): (group, depth, threshold, n_seen,
    n_above, stopped).

    Scale shape: two per-group rank windows + per-group conditional
    maxima evaluated in the same window pass (all partitioned by
    group — no global sort), one struct fan-out over the bounded
    probe list, one hash aggregate.
    """
    w1 = Window.partitionBy(group_col).orderBy(
        F.col(s1_col).desc(), F.col(id_col))
    w2 = Window.partitionBy(group_col).orderBy(
        F.col(s2_col).desc(), F.col(id_col))
    wl = Window.partitionBy(group_col)
    r = (scored
         .withColumn("_r1", F.row_number().over(w1))
         .withColumn("_r2", F.row_number().over(w2))
         .withColumn("_m", F.least("_r1", "_r2"))
         .withColumn("_comb",
                     (F.col(s1_col) + F.col(s2_col)).cast("long")))
    for d in depths:
        r = r.withColumn(
            f"_t{d}",
            (F.max(F.when(F.col("_r1") == d, F.col(s1_col))).over(wl)
             + F.max(F.when(F.col("_r2") == d,
                            F.col(s2_col))).over(wl)).cast("long"))
    structs = [F.struct(
        F.lit(d).cast("int").alias("depth"),
        F.col(f"_t{d}").alias("threshold"),
        (F.col("_m") <= d).cast("long").alias("_seen"),
        F.when(F.col(f"_t{d}").isNull(), F.lit(None).cast("long"))
        .otherwise(((F.col("_m") <= d)
                    & (F.col("_comb") >= F.col(f"_t{d}")))
                   .cast("long")).alias("_above"))
        for d in depths]
    ex = (r.select(F.col(group_col).alias("group"),
                   F.explode(F.array(*structs)).alias("p"))
          .select("group", "p.*"))
    agg = (ex.groupBy("group", "depth").agg(
        F.max("threshold").alias("threshold"),
        F.sum("_seen").cast("long").alias("n_seen"),
        F.sum("_above").cast("long").alias("n_above")))
    return agg.select(
        "group", "depth", "threshold", "n_seen", "n_above",
        F.when(F.col("threshold").isNull() | (F.col("n_above") >= k),
               F.lit(1)).otherwise(F.lit(0)).cast("int")
        .alias("stopped"))


def kruskal_wallis(docs: DataFrame, group_col: str = "lang",
                   value_col: str = "n_chars") -> DataFrame:
    """Exact tie-aware Kruskal-Wallis H across ALL groups' value
    distributions at once — the k-sample generalization that closes
    the rank-test family (mann_whitney is the 2-sample special
    case): ONE omnibus "are these language length distributions
    exchangeable" answer instead of L*(L-1)/2 pairwise U tests,
    which is the correct first gate before pooling k crawl
    languages (or k snapshot dates) into one training mixture.

    Doubled-rank trick keeps everything integer under ties: the
    doubled mid-rank of value v is r2(v) = 2*below(v) + c(v) + 1
    (an integer even when the tied-group average rank is *.5), so
    the doubled rank sum R2_i = sum_v c_i(v) * r2(v) is exact.
    With R_i = R2_i/2, H = 12/(N(N+1)) * sum_i R_i^2/n_i - 3(N+1)
    becomes sum_i 3*R2_i^2/(N(N+1)*n_i) - 3(N+1); each group term
    is floored independently at micro-6 scale (the per-term-floor
    device of harmonic_centrality) in DECIMAL(38,0) (R2_i^2
    overflows BIGINT past ~50k rows/group), and the standard tie
    correction divides by 1 - sum(t^3-t)/(N^3-N) as one final
    HUGEINT-exact floor.

    Output: one row per group, overall columns repeated:
    (group, n, r2_sum, mean_r2_micro6, n_total, tie_cubes,
    h_micro6, h_corr_micro6) — all integers.

    Scale shape: ONE corpus-wide (group, value) histogram
    aggregate; the single unpartitioned window runs over the pooled
    VALUE histogram, bounded by the value domain (doc-length cap),
    not the corpus — the mann_whitney/spearman_check device.  The
    two 1-row overall aggregates come back via lazy broadcast
    crossJoins, never a driver collect.
    """
    hist = (docs.groupBy(F.col(group_col).alias("grp"),
                         F.col(value_col).alias("v"))
            .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    pooled = hist.groupBy("v").agg(F.sum("_c").cast("long").alias("_ct"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    pooled = (pooled
              .withColumn("_s", F.coalesce(F.sum("_ct").over(w),
                                           F.lit(0)).cast("long"))
              .withColumn("_r2", (F.lit(2) * F.col("_s")
                                  + F.col("_ct") + 1).cast("long"))
              .withColumn("_tie", (F.col("_ct") * F.col("_ct")
                                   * F.col("_ct")
                                   - F.col("_ct")).cast("long")))
    per_group = (hist.join(pooled.select("v", "_r2"), "v")
                 .groupBy("grp").agg(
                     F.sum("_c").cast("long").alias("n"),
                     F.sum(F.col("_c") * F.col("_r2")).cast("long")
                     .alias("r2_sum")))
    overall = pooled.agg(F.sum("_ct").cast("long").alias("n_total"),
                         F.sum("_tie").cast("long").alias("tie_cubes"))
    g = (per_group.crossJoin(F.broadcast(overall))  # 1-row scalar
         .withColumn("mean_r2_micro6",
                     F.expr("CAST((CAST(1000000 AS DECIMAL(38,0))"
                            " * r2_sum) div n AS BIGINT)"))
         .withColumn("_term",
                     F.expr("CAST((CAST(3000000 AS DECIMAL(38,0))"
                            " * r2_sum * r2_sum)"
                            " div (CAST(n_total AS DECIMAL(38,0))"
                            " * (n_total + 1) * n) AS BIGINT)")))
    hsum = g.agg(F.sum("_term").cast("long").alias("_tsum"),
                 F.max("n_total").cast("long").alias("_nt"),
                 F.max("tie_cubes").cast("long").alias("_tc"))
    h = (hsum
         .withColumn("h_micro6",
                     (F.col("_tsum") - F.lit(3) * (F.col("_nt") + 1)
                      * F.lit(1000000)).cast("long"))
         .withColumn(
             "h_corr_micro6",
             F.expr(
                 "CASE WHEN (CAST(_nt AS DECIMAL(38,0)) * _nt * _nt"
                 " - _nt) - _tc > 0 THEN"
                 " CAST((CAST(h_micro6 AS DECIMAL(38,0))"
                 " * (CAST(_nt AS DECIMAL(38,0)) * _nt * _nt - _nt))"
                 " div ((CAST(_nt AS DECIMAL(38,0)) * _nt * _nt"
                 " - _nt) - _tc) AS BIGINT)"
                 " ELSE CAST(h_micro6 AS BIGINT) END"))
         .select("h_micro6", "h_corr_micro6"))
    return (g.crossJoin(F.broadcast(h))  # 1-row scalar
            .select(F.col("grp").alias("group"), "n", "r2_sum",
                    "mean_r2_micro6", "n_total", "tie_cubes",
                    "h_micro6", "h_corr_micro6"))


def brier_decomposition(scored: DataFrame,
                        n_buckets: int = 10) -> DataFrame:
    """Exact Brier score + Murphy decomposition (reliability -
    resolution + uncertainty) of a score used as a probability
    forecast — the PROPER-scoring-rule summary that completes the
    calibration family: quality_calibration shows the per-bucket
    keep-rate table, isotonic_calibration refits it, this one
    charges the score a single number and says WHERE the loss comes
    from (miscalibration vs missing discrimination vs irreducible
    base-rate noise).

    Input: (score BIGINT, pos INT 0/1).  The forecast attached to
    rank-decile bucket k (quality_calibration's bucketing: distinct
    score value table + cumulative window over the bounded score
    domain, bucket = cum_before * B DIV N, so equal scores share a
    bucket and the result is partition-invariant) is the bucket
    midpoint f_k = (2k+1)/(2B) — constant within bucket, which is
    exactly the regime where the Murphy identity holds.

    Everything is exact rational over f20 = 2k+1 (the forecast
    times 2B): brier_num = sum_k [s_k*(f20-2B)^2 + (n_k-s_k)*
    f20^2], brier_micro6 = 1e6*brier_num div (4B^2*N); reliability
    terms 1e6*(n_k*f20 - 2B*s_k)^2 div (4B^2*N*n_k) and resolution
    terms 1e6*(s_k*N - S*n_k)^2 div (N^3*n_k) are floored per
    bucket (the harmonic_centrality per-term-floor device, DECIMAL
    (38,0) / HUGEINT so the squared numerators survive web scale);
    uncertainty_micro6 = 1e6*S*(N-S) div N^2.  The identity
    brier = rel - res + unc then holds to within one micro-unit
    per floored term.

    Output: one row per bucket (bucket, f20, n, n_pos,
    obar_micro6) with the overall columns repeated (n_total,
    n_pos_total, brier_micro6, reliability_micro6,
    resolution_micro6, uncertainty_micro6).

    Scale shape: one corpus-sized (score, pos) histogram
    aggregate; the single unpartitioned window runs over the
    bounded score value domain (the doclen_percentiles
    discipline); overall sums come back via 1-row lazy broadcast
    crossJoins.
    """
    b2 = 2 * n_buckets
    vals = (scored.groupBy("score")
            .agg(F.count(F.lit(1)).cast("long").alias("_c"),
                 F.sum("pos").cast("long").alias("_s")))
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1)
    vb = (vals
          .withColumn("_cb", F.coalesce(F.sum("_c").over(w),
                                        F.lit(0)).cast("long"))
          .withColumn("_nt", F.sum("_c").over(
              Window.partitionBy(F.lit(1))).cast("long"))
          .withColumn("bucket", F.expr(
              f"CAST(_cb * {n_buckets} DIV _nt AS INT)")))
    per = (vb.groupBy("bucket")
           .agg(F.sum("_c").cast("long").alias("n"),
                F.sum("_s").cast("long").alias("n_pos"))
           .withColumn("f20", (F.lit(2) * F.col("bucket") + 1)
                       .cast("long")))
    tot = per.agg(F.sum("n").cast("long").alias("n_total"),
                  F.sum("n_pos").cast("long").alias("n_pos_total"))
    g = (per.crossJoin(F.broadcast(tot))  # 1-row scalar
         .withColumn("obar_micro6",
                     F.expr("CAST(1000000 * n_pos DIV n AS BIGINT)"))
         .withColumn("_bnum",
                     F.expr(f"CAST(n_pos * (f20 - {b2})"
                            f" * (f20 - {b2})"
                            " + (n - n_pos) * f20 * f20"
                            " AS DECIMAL(38,0))"))
         .withColumn("_rel",
                     F.expr(
                         "CAST((CAST(1000000 AS DECIMAL(38,0))"
                         f" * (n * f20 - {b2} * n_pos)"
                         f" * (n * f20 - {b2} * n_pos))"
                         f" div (CAST({4 * n_buckets * n_buckets}"
                         " AS DECIMAL(38,0)) * n_total * n)"
                         " AS BIGINT)"))
         .withColumn("_res",
                     F.expr(
                         "CAST((CAST(1000000 AS DECIMAL(38,0))"
                         " * (n_pos * n_total - n_pos_total * n)"
                         " * (n_pos * n_total - n_pos_total * n))"
                         " div (CAST(n_total AS DECIMAL(38,0))"
                         " * n_total * n_total * n) AS BIGINT)")))
    summ = (g.agg(F.sum("_bnum").alias("_bsum"),
                  F.sum("_rel").cast("long")
                  .alias("reliability_micro6"),
                  F.sum("_res").cast("long")
                  .alias("resolution_micro6"),
                  F.max("n_total").cast("long").alias("_n"),
                  F.max("n_pos_total").cast("long").alias("_s"))
            .withColumn("brier_micro6",
                        F.expr(
                            "CAST((CAST(1000000 AS DECIMAL(38,0))"
                            " * _bsum)"
                            f" div (CAST({4 * n_buckets * n_buckets}"
                            " AS DECIMAL(38,0)) * _n) AS BIGINT)"))
            .withColumn("uncertainty_micro6",
                        F.expr(
                            "CAST((CAST(1000000 AS DECIMAL(38,0))"
                            " * _s * (_n - _s))"
                            " div (CAST(_n AS DECIMAL(38,0)) * _n)"
                            " AS BIGINT)"))
            .select("brier_micro6", "reliability_micro6",
                    "resolution_micro6", "uncertainty_micro6"))
    return (g.crossJoin(F.broadcast(summ))  # 1-row scalar
            .select("bucket", "f20", "n", "n_pos", "obar_micro6",
                    "n_total", "n_pos_total", "brier_micro6",
                    "reliability_micro6", "resolution_micro6",
                    "uncertainty_micro6"))


def chao1_richness(docs: DataFrame) -> DataFrame:
    """Chao1 species-richness estimate of each language's TOTAL
    vocabulary — the "how many words exist that we have not crawled
    yet" bound that completes the vocabulary family: vocab_growth
    shows the empirical Heaps curve, oov_rate charges a specific
    split, good_turing prices the unseen MASS; Chao1 estimates the
    unseen TYPE COUNT from nothing but the singleton/doubleton
    counts: chao1 = V + F1*(F1-1)/(2*(F2+1)) (the bias-corrected
    form, exact rational — the classic abundance-based estimator
    from Chao 1984, standard in corpus-coverage audits).  Good's
    coverage estimate C = 1 - F1/N rides along: together they say
    "this crawl has seen C of the language's token mass but only
    V/chao1 of its vocabulary".

    Output per language: (lang, n_tokens, vocab, f1, f2,
    chao1_milli3 = 1000*V + (1000*F1*(F1-1)) div (2*(F2+1)),
    coverage_micro6 = 1e6*(N - F1) div N) — all integers, the
    Chao1 product widened to DECIMAL(38,0) (DuckDB HUGEINT) so a
    billion-type vocabulary cannot overflow the numerator.

    Scale shape: one corpus-sized (lang, type) hash aggregate
    (map-side combinable), then one per-language aggregate over
    the type table — no windows, no joins.
    """
    tc = (docs.select("lang",
                      F.explode(_toks()).alias("_t"))
          .select("lang", F.lower("_t").alias("_w"))
          .groupBy("lang", "_w")
          .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    return (tc.groupBy("lang").agg(
        F.sum("_c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum((F.col("_c") == 1).cast("long")).cast("long")
        .alias("f1"),
        F.sum((F.col("_c") == 2).cast("long")).cast("long")
        .alias("f2"))
        .select("lang", "n_tokens", "vocab", "f1", "f2",
                F.expr("CAST(1000 * vocab"
                       " + (CAST(1000 AS DECIMAL(38,0)) * f1"
                       " * (f1 - 1)) div (2 * (f2 + 1))"
                       " AS BIGINT)").alias("chao1_milli3"),
                F.expr("CAST(1000000 * (n_tokens - f1)"
                       " DIV n_tokens AS BIGINT)")
                .alias("coverage_micro6")))


def mrr_eval(docs: DataFrame, terms: DataFrame,
             k: int = NDCG_K) -> DataFrame:
    """Mean reciprocal rank + Hits@1/@5 + top-5 set overlap of the
    BM25 ranking against the ideal raw-tf ordering — the
    first-relevant-hit companion to retrieval_ndcg: NDCG charges
    the whole graded list, MRR asks the navigational question
    "how deep must a user dig before the SINGLE most-attesting
    page appears?", which is the read that matters for the
    entity-card use case (one good citation suffices).

    Per probe term: best_doc = the true top attestor (max tf, tie
    doc_id — retrieval_ndcg's ideal head), best_rank = its
    position in the BM25 top-k (0 = missed), rr_micro6 =
    1e6 div best_rank, hit1/hit5 flags, overlap5 = |BM25 top-5 ∩
    ideal top-5|.  Overall (repeated per row, the 1-row lazy
    crossJoin device): n_terms, mrr_micro6 = sum(rr) div n_terms,
    hits1_micro6, hits5_micro6 — all exact integers.

    Scale shape: inherits bm25_entity_retrieval's shape (probe
    terms broadcast, one tf aggregate, per-term top-k windows over
    match lists); the eval joins run over top-k-bounded tables.
    """
    from pyspark.sql.functions import broadcast

    ranked = bm25_entity_retrieval(docs, terms, k) \
        .select("term", "doc_id", "rank")
    toks = docs.select("doc_id",
                       F.explode(_toks()).alias("_raw")).select(
        "doc_id", F.lower(F.col("_raw")).alias("term"))
    probe = broadcast(terms.select(
        F.lower(F.col(terms.columns[0])).alias("term"))
        .dropDuplicates())
    tf = (toks.join(probe, "term")
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    wi = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id"))
    ideal = tf.withColumn("_ir", F.row_number().over(wi))
    best = (ideal.where(F.col("_ir") == 1)
            .select("term", F.col("doc_id").alias("best_doc")))
    br = (best.join(ranked.withColumnRenamed("doc_id", "best_doc"),
                    ["term", "best_doc"], "left")
          .select("term", "best_doc",
                  F.coalesce(F.col("rank"), F.lit(0)).cast("int")
                  .alias("best_rank")))
    ov = (ranked.where(F.col("rank") <= 5)
          .join(ideal.where(F.col("_ir") <= 5)
                .select("term", "doc_id"), ["term", "doc_id"])
          .groupBy("term")
          .agg(F.count(F.lit(1)).cast("long").alias("overlap5")))
    per = (br.join(ov, "term", "left")
           .select("term", "best_doc", "best_rank",
                   F.expr("CAST(CASE WHEN best_rank > 0 THEN"
                          " 1000000 DIV best_rank ELSE 0 END"
                          " AS BIGINT)").alias("rr_micro6"),
                   (F.col("best_rank") == 1).cast("int")
                   .alias("hit1"),
                   ((F.col("best_rank") >= 1)
                    & (F.col("best_rank") <= 5)).cast("int")
                   .alias("hit5"),
                   F.coalesce(F.col("overlap5"), F.lit(0))
                   .cast("long").alias("overlap5")))
    summ = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.expr("CAST(SUM(rr_micro6) DIV COUNT(1) AS BIGINT)")
        .alias("mrr_micro6"),
        F.expr("CAST(1000000 * SUM(hit1) DIV COUNT(1) AS BIGINT)")
        .alias("hits1_micro6"),
        F.expr("CAST(1000000 * SUM(hit5) DIV COUNT(1) AS BIGINT)")
        .alias("hits5_micro6"))
    return (per.crossJoin(F.broadcast(summ))  # 1-row scalar
            .select("term", "best_doc", "best_rank", "rr_micro6",
                    "hit1", "hit5", "overlap5", "n_terms",
                    "mrr_micro6", "hits1_micro6", "hits5_micro6"))


def cochran_q(docs: DataFrame) -> DataFrame:
    """Cochran's Q omnibus test across THREE cheap curation gates on
    the same paired documents — the k-treatment generalization that
    completes mcnemar_gates exactly the way kruskal_wallis
    completes mann_whitney: one "do these gates pass the same
    documents at the same rate" answer before anyone tunes
    thresholds pairwise.  Gates: length (n_chars >= 200), stopword
    profile (20 * n_stopwords >= n_tokens — lang_id's
    looks-English rule), and lexical diversity (3 * n_distinct >=
    n_tokens — the anti-repetition gate).

    Q = (k-1) * (k * sum_j C_j^2 - (sum_j C_j)^2)
        / (k * sum_i R_i - sum_i R_i^2)

    with C_j the per-gate pass totals and R_i the per-document
    pass count (0..3) — R_i is a ROW expression, so the whole test
    is one narrow map + one bounded groupBy(lang), no joins.  For
    k = 2 Q degenerates to McNemar's statistic, which is the
    cross-check the tests pin.  q_micro6 floors once at the end in
    DECIMAL(38,0)/HUGEINT (the squared totals overflow BIGINT past
    ~3M docs/language).

    Output per language: (lang, n_docs, c_len, c_stop, c_div,
    sum_r, sum_r2, q_micro6).
    """
    toks = _toks()
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks,
                             lambda t: F.array_contains(stop,
                                                        F.lower(t))))
    n_dist = F.size(F.array_distinct(toks))
    gated = docs.select(
        "lang",
        (F.length("text") >= 200).cast("long").alias("_a"),
        (F.lit(20) * n_stop >= n_tokens).cast("long").alias("_b"),
        (F.lit(3) * n_dist >= n_tokens).cast("long").alias("_c"))
    gated = gated.withColumn("_r", F.col("_a") + F.col("_b")
                             + F.col("_c"))
    agg = gated.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_a").cast("long").alias("c_len"),
        F.sum("_b").cast("long").alias("c_stop"),
        F.sum("_c").cast("long").alias("c_div"),
        F.sum("_r").cast("long").alias("sum_r"),
        F.sum(F.col("_r") * F.col("_r")).cast("long").alias("sum_r2"))
    return agg.withColumn(
        "q_micro6",
        F.expr(
            "CASE WHEN 3 * sum_r - sum_r2 > 0 THEN"
            " CAST((CAST(2000000 AS DECIMAL(38,0))"
            " * (3 * (CAST(c_len AS DECIMAL(38,0)) * c_len"
            "    + CAST(c_stop AS DECIMAL(38,0)) * c_stop"
            "    + CAST(c_div AS DECIMAL(38,0)) * c_div)"
            "   - CAST(c_len + c_stop + c_div AS DECIMAL(38,0))"
            "     * (c_len + c_stop + c_div)))"
            " div (3 * sum_r - sum_r2) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"))


def kendall_w(docs: DataFrame) -> DataFrame:
    """Kendall's coefficient of concordance W across the three
    cheap per-document quality RANKERS (char length, distinct-token
    count, stopword count) within each language — the m-judge
    omnibus that completes the rank-correlation family the same way
    kruskal_wallis completes mann_whitney: spearman_check compares
    two rankers pairwise; W asks "do all three orderings tell one
    story" (W = 1 total agreement, 0 = no concordance), which is
    the gate before collapsing them into one quality score.

    Doubled mid-ranks keep ties integer (r2 = 2*below + c + 1, the
    established device), R2_i = per-doc doubled rank sum.  Using
    sum_i R2_i = m*n*(n+1) exactly, n*4S = n*sum(R2^2) -
    (m*n*(n+1))^2 =: S2n, and with the standard tie correction

        w_micro6 = 1e6 * 3 * S2n
                   div (n * (m^2*(n^3 - n) - m*sum_j T_j))

    for m = 3 — one DECIMAL(38,0)/HUGEINT floor (n*sum(R2^2) is
    ~36*n^4).

    Output per language: (lang, n_docs, sum_r2_sq, tie_cubes,
    w_micro6).

    Scale shape: one narrow map (all three signals are row
    expressions), three (lang, value) histogram aggregates with
    windows over the bounded per-ranker value domains, three
    value-keyed equi-joins back, one per-language aggregate.
    """
    toks = _toks()
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    feats = docs.select(
        "lang", "doc_id",
        F.length("text").cast("long").alias("_v1"),
        F.size(F.array_distinct(toks)).cast("long").alias("_v2"),
        F.size(F.filter(toks,
                        lambda t: F.array_contains(
                            stop, F.lower(t)))).cast("long")
        .alias("_v3"))
    tie_total = None
    for j in (1, 2, 3):
        vc = F.col(f"_v{j}")
        hist = (feats.groupBy("lang", vc.alias("_v"))
                .agg(F.count(F.lit(1)).cast("long").alias("_c")))
        w = (Window.partitionBy("lang").orderBy("_v")
             .rowsBetween(Window.unboundedPreceding, -1))
        hist = (hist.withColumn("_below", F.coalesce(
                    F.sum("_c").over(w), F.lit(0)).cast("long"))
                .withColumn(f"_r2_{j}",
                            (F.lit(2) * F.col("_below")
                             + F.col("_c") + 1).cast("long"))
                .withColumn("_tie", (F.col("_c") * F.col("_c")
                                     * F.col("_c") - F.col("_c"))
                            .cast("long")))
        tj = hist.groupBy("lang").agg(
            F.sum("_tie").cast("long").alias(f"_t{j}"))
        tie_total = tj if tie_total is None else \
            tie_total.join(tj, "lang")
        feats = feats.join(
            hist.select("lang", F.col("_v").alias(f"_v{j}"),
                        f"_r2_{j}"),
            ["lang", f"_v{j}"])
    feats = feats.withColumn(
        "_r2", F.col("_r2_1") + F.col("_r2_2") + F.col("_r2_3"))
    agg = feats.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("_r2") * F.col("_r2")).cast("long")
        .alias("sum_r2_sq"))
    out = (agg.join(tie_total, "lang")
           .withColumn("tie_cubes",
                       (F.col("_t1") + F.col("_t2") + F.col("_t3"))
                       .cast("long")))
    return out.select(
        "lang", "n_docs", "sum_r2_sq", "tie_cubes",
        F.expr(
            "CASE WHEN n_docs > 1 AND"
            " 9 * (CAST(n_docs AS DECIMAL(38,0)) * n_docs * n_docs"
            " - n_docs) - 3 * tie_cubes > 0 THEN"
            " CAST((CAST(3000000 AS DECIMAL(38,0))"
            " * (CAST(n_docs AS DECIMAL(38,0)) * sum_r2_sq"
            "    - (CAST(3 AS DECIMAL(38,0)) * n_docs"
            "       * (n_docs + 1))"
            "      * (CAST(3 AS DECIMAL(38,0)) * n_docs"
            "         * (n_docs + 1))))"
            " div (CAST(n_docs AS DECIMAL(38,0))"
            " * (9 * (CAST(n_docs AS DECIMAL(38,0)) * n_docs"
            " * n_docs - n_docs) - 3 * tie_cubes)) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END").alias("w_micro6"))


def stylometric_delta(docs: DataFrame, top_k: int = 30) -> DataFrame:
    """Burrows' Delta between host writing styles, MAD-scaled so it
    stays exact-integer (the robust variant — classic Delta z-scores
    need a standard deviation, which is irrational; Argamon's
    analysis shows the scale factor is a free choice and median/MAD
    is the standard robust pick): per host, the usage rate of the
    corpus's top-K tokens; per token, center by the cross-host
    LOWER MEDIAN and scale by the lower-median absolute deviation
    (+1 to guard zero MAD — "every host agrees exactly" then scores
    raw differences); delta(a, b) = mean absolute difference of the
    scaled profiles.  Low delta between two supposedly-independent
    hosts is the stylometric syndication/template signal that
    content-hash dedup misses (same author, different words).

    Output: one row per unordered host pair (source_a < source_b,
    n_tokens_used = K, delta_micro6) — all integers (rates and
    scaled scores floor at micro6; lower medians are
    tie-deterministic by (value, source) order, the host_outliers
    convention).

    Scale shape: one corpus-sized (source, token) aggregate; the
    top-K table is bounded and broadcast; the zero-fill grid, the
    median/MAD windows, and the pair join all run over the bounded
    (hosts x K) profile table.
    """
    tc = (docs.select("source",
                      F.explode(_toks()).alias("_t"))
          .select("source", F.lower("_t").alias("_w"))
          .groupBy("source", "_w")
          .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    tot = tc.groupBy("source").agg(
        F.sum("_c").cast("long").alias("_n"))
    topk = (tc.groupBy("_w").agg(F.sum("_c").cast("long").alias("_g"))
            .withColumn("_rk", F.row_number().over(
                Window.orderBy(F.col("_g").desc(), F.col("_w"))))
            .where(F.col("_rk") <= top_k)
            .select("_w"))
    grid = (tot.select("source", "_n").crossJoin(
        F.broadcast(topk))  # bounded: hosts x top-K vocabulary
        .join(tc, ["source", "_w"], "left").na.fill(0, ["_c"])
        .withColumn("rate",
                    F.expr("CAST(1000000 * _c DIV _n AS BIGINT)")))
    wt = Window.partitionBy("_w").orderBy("rate", "source")
    g2 = (grid.withColumn("_rn", F.row_number().over(wt))
          .withColumn("_m", F.count(F.lit(1)).over(
              Window.partitionBy("_w")))
          .withColumn("_med", F.max(F.when(
              F.col("_rn") == F.expr("(_m - 1) div 2 + 1"),
              F.col("rate"))).over(Window.partitionBy("_w"))))
    g2 = g2.withColumn("_ad", F.abs(F.col("rate") - F.col("_med")))
    wd = Window.partitionBy("_w").orderBy("_ad", "source")
    g3 = (g2.withColumn("_rn2", F.row_number().over(wd))
          .withColumn("_mad", F.max(F.when(
              F.col("_rn2") == F.expr("(_m - 1) div 2 + 1"),
              F.col("_ad"))).over(Window.partitionBy("_w"))))
    prof = g3.select(
        "source", "_w",
        F.expr("CAST((1000000 * (rate - _med))"
               " DIV (_mad + 1) AS BIGINT)").alias("_s"))
    a = prof.select(F.col("source").alias("source_a"), "_w",
                    F.col("_s").alias("_sa"))
    b = prof.select(F.col("source").alias("source_b"),
                    F.col("_w").alias("_wb"),
                    F.col("_s").alias("_sb"))
    return (a.join(b, (a["_w"] == b["_wb"])
                   & (a["source_a"] < b["source_b"]))
            .groupBy("source_a", "source_b")
            .agg(F.count(F.lit(1)).cast("long")
                 .alias("n_tokens_used"),
                 F.expr("CAST(SUM(ABS(_sa - _sb))"
                        " DIV COUNT(1) AS BIGINT)")
                 .alias("delta_micro6")))


def anova_f(docs: DataFrame, group_col: str = "lang",
            value_col: str = "n_chars") -> DataFrame:
    """One-way ANOVA F statistic + eta-squared effect size across
    group value distributions — the PARAMETRIC twin of
    kruskal_wallis on the same decomposition the rank test blurs:
    SST = SSB + SSW, with F = (SSB/(k-1)) / (SSW/(N-k)) and
    eta2 = SSB/SST ("how much of the length variance does language
    membership explain").  Running both and reading the gap is the
    standard outlier diagnostic: ranks robust, means not.

    Exactness: everything reduces to the integer sums S_g, n_g,
    sum(x^2); the only non-integers are the S_g^2/n_g terms, which
    are floored PER GROUP at micro6 scale (the harmonic_centrality
    per-term-floor device, error <= k micro-units, identical in
    both engines):

        ssb_x1e6 = sum_g [1e6*S_g^2 div n_g] - [1e6*S^2 div N]
        ssw_x1e6 = 1e6*sum(x^2) - sum_g [1e6*S_g^2 div n_g]

    all in DECIMAL(38,0)/HUGEINT (1e6*sum(x^2) passes int64 around
    3M docs).  f_milli3 = 1000 * ssb*(N-k) div (ssw*(k-1)),
    eta2_micro6 = 1e6*ssb div (ssb+ssw).

    Output: one row (k_groups, n_total, ssb_x1e6, ssw_x1e6,
    f_milli3, eta2_micro6).

    Scale shape: ONE corpus-sized (group) aggregate (map-side
    combinable sums), then arithmetic over the bounded group table
    — no windows, no joins but the 1-row composition.
    """
    per = (docs.groupBy(F.col(group_col).alias("_g"))
           .agg(F.count(F.lit(1)).cast("long").alias("_n"),
                F.sum(F.col(value_col)).cast("long").alias("_s"),
                F.sum(F.col(value_col) * F.col(value_col))
                .cast("long").alias("_s2")))
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("_n").cast("long").alias("n_total"),
        F.sum("_s").cast("long").alias("_st"),
        F.sum("_s2").cast("long").alias("_s2t"),
        F.sum(F.expr("(CAST(1000000 AS DECIMAL(38,0)) * _s * _s)"
                     " div _n")).alias("_q"))
    out = (agg
           .withColumn("ssb_x1e6",
                       F.expr("CAST(_q - (CAST(1000000 AS"
                              " DECIMAL(38,0)) * _st * _st)"
                              " div n_total AS DECIMAL(38,0))"))
           .withColumn("ssw_x1e6",
                       F.expr("CAST(CAST(1000000 AS DECIMAL(38,0))"
                              " * _s2t - _q AS DECIMAL(38,0))")))
    return out.select(
        "k_groups", "n_total",
        F.col("ssb_x1e6").cast("long").alias("ssb_x1e6"),
        F.col("ssw_x1e6").cast("long").alias("ssw_x1e6"),
        F.expr(
            "CASE WHEN k_groups > 1 AND ssw_x1e6 > 0 THEN"
            " CAST((CAST(1000 AS DECIMAL(38,0)) * ssb_x1e6"
            " * (n_total - k_groups))"
            " div (ssw_x1e6 * (k_groups - 1)) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END").alias("f_milli3"),
        F.expr(
            "CASE WHEN ssb_x1e6 + ssw_x1e6 > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0)) * ssb_x1e6)"
            " div (ssb_x1e6 + ssw_x1e6) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END").alias("eta2_micro6"))


def levene_test(docs: DataFrame, group_col: str = "lang",
                value_col: str = "n_chars") -> DataFrame:
    """Brown-Forsythe test of variance homogeneity across groups —
    the assumption check anova_f silently makes (equal within-group
    spread) and kruskal_wallis sidesteps, and in its own right the
    "is one language's length distribution WIDER" read the
    location tests cannot see.  Brown-Forsythe = ANOVA-F computed
    on z = |x - median_g| — the median-centered variant chosen
    over classic Levene because the LOWER MEDIAN is integer-exact
    and tie-deterministic (the host_outliers convention), while a
    mean center would reintroduce rationals row-wise.

    The z-deviations are integers, so the whole anova_f per-term-
    floor machinery applies verbatim: w_milli3 = 1000 * SSB_z *
    (N-k) div (SSW_z * (k-1)) in DECIMAL(38,0)/HUGEINT.

    Output: one row (k_groups, n_total, ssb_z_x1e6, ssw_z_x1e6,
    w_milli3).

    Scale shape: one (group, value) histogram aggregate, the
    median from a cumulative window over the bounded per-group
    value domain, one value-keyed equi-join back, one group
    aggregate — no corpus-sized window.
    """
    hist = (docs.groupBy(F.col(group_col).alias("_g"),
                         F.col(value_col).alias("_v"))
            .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    w = (Window.partitionBy("_g").orderBy("_v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    h2 = (hist.withColumn("_cum", F.sum("_c").over(w))
          .withColumn("_n", F.sum("_c").over(
              Window.partitionBy("_g"))))
    med = (h2.where(F.col("_cum") - F.col("_c")
                    <= F.expr("(_n - 1) div 2"))
           .where(F.col("_cum") > F.expr("(_n - 1) div 2"))
           .select("_g", F.col("_v").alias("_med")))
    z = (hist.join(med, "_g")
         .select("_g",
                 F.abs(F.col("_v") - F.col("_med")).alias("_z"),
                 "_c"))
    per = z.groupBy("_g").agg(
        F.sum("_c").cast("long").alias("_n"),
        F.sum(F.col("_z") * F.col("_c")).cast("long").alias("_s"),
        F.sum(F.col("_z") * F.col("_z") * F.col("_c")).cast("long")
        .alias("_s2"))
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("_n").cast("long").alias("n_total"),
        F.sum("_s").cast("long").alias("_st"),
        F.sum("_s2").cast("long").alias("_s2t"),
        F.sum(F.expr("(CAST(1000000 AS DECIMAL(38,0)) * _s * _s)"
                     " div _n")).alias("_q"))
    return (agg
            .withColumn("ssb_z_x1e6",
                        F.expr("CAST(_q - (CAST(1000000 AS"
                               " DECIMAL(38,0)) * _st * _st)"
                               " div n_total AS DECIMAL(38,0))"))
            .withColumn("ssw_z_x1e6",
                        F.expr("CAST(CAST(1000000 AS DECIMAL(38,0))"
                               " * _s2t - _q AS DECIMAL(38,0))"))
            .select(
                "k_groups", "n_total",
                F.col("ssb_z_x1e6").cast("long").alias("ssb_z_x1e6"),
                F.col("ssw_z_x1e6").cast("long").alias("ssw_z_x1e6"),
                F.expr(
                    "CASE WHEN k_groups > 1 AND ssw_z_x1e6 > 0 THEN"
                    " CAST((CAST(1000 AS DECIMAL(38,0))"
                    " * ssb_z_x1e6 * (n_total - k_groups))"
                    " div (ssw_z_x1e6 * (k_groups - 1)) AS BIGINT)"
                    " ELSE CAST(0 AS BIGINT) END")
                .alias("w_milli3")))


def fleiss_kappa(docs: DataFrame) -> DataFrame:
    """Fleiss' kappa across the three cheap curation gates as
    raters — the chance-corrected AGREEMENT number that completes
    the gate-comparison family: mcnemar_gates tests whether two
    gates pass at the same RATE, cochran_q whether k gates do,
    fleiss_kappa asks the different question "do they agree on the
    SAME documents beyond chance" (two gates can have identical
    pass rates while disagreeing on every single doc).

    With k = 3 binary raters, per-doc agreement P_i = [r(r-1) +
    (3-r)(2-r)]/6 for r = per-doc pass count (a row expression),
    and with N docs, S = sum r, E = S^2 + (3N-S)^2:

        kappa_micro6 = 1e6 * (3N*sum_i[r(r-1)+(3-r)(2-r)] - 2E)
                       div (2 * (9N^2 - E))

    — the fully cross-multiplied exact rational (DECIMAL(38,0) /
    HUGEINT); the degenerate Pe = 1 case (all verdicts identical
    corpus-wide) emits 0 by the standard convention.

    Output per language: (lang, n_docs, sum_r, agree_num,
    kappa_micro6).

    Scale shape: one narrow map (gates are row expressions) + one
    bounded groupBy(lang) — no joins, no windows.
    """
    toks = _toks()
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks,
                             lambda t: F.array_contains(stop,
                                                        F.lower(t))))
    n_dist = F.size(F.array_distinct(toks))
    r = ((F.length("text") >= 200).cast("long")
         + (F.lit(20) * n_stop >= n_tokens).cast("long")
         + (F.lit(3) * n_dist >= n_tokens).cast("long"))
    gated = docs.select("lang", r.alias("_r"))
    agg = gated.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_r").cast("long").alias("sum_r"),
        F.sum(F.col("_r") * (F.col("_r") - 1)
              + (3 - F.col("_r")) * (2 - F.col("_r")))
        .cast("long").alias("agree_num"))
    return agg.select(
        "lang", "n_docs", "sum_r", "agree_num",
        F.expr(
            "CASE WHEN 9 * CAST(n_docs AS DECIMAL(38,0)) * n_docs"
            " - (CAST(sum_r AS DECIMAL(38,0)) * sum_r"
            "    + CAST(3 * n_docs - sum_r AS DECIMAL(38,0))"
            "      * (3 * n_docs - sum_r)) > 0 THEN"
            " CAST((CAST(1000000 AS DECIMAL(38,0))"
            " * (3 * CAST(n_docs AS DECIMAL(38,0)) * agree_num"
            "    - 2 * (CAST(sum_r AS DECIMAL(38,0)) * sum_r"
            "       + CAST(3 * n_docs - sum_r AS DECIMAL(38,0))"
            "         * (3 * n_docs - sum_r))))"
            " div (2 * (9 * CAST(n_docs AS DECIMAL(38,0)) * n_docs"
            " - (CAST(sum_r AS DECIMAL(38,0)) * sum_r"
            "    + CAST(3 * n_docs - sum_r AS DECIMAL(38,0))"
            "      * (3 * n_docs - sum_r)))) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END").alias("kappa_micro6"))


def capture_recapture(docs: DataFrame) -> DataFrame:
    """Lincoln-Petersen / Chapman capture-recapture estimate of the
    per-host URL population from two independent crawl passes — the
    mark-recapture answer to "how much of this host have we NOT
    crawled yet", the ecology estimator that complements Chao1
    exactly: Chao1 bounds the unseen VOCABULARY from singleton
    counts, capture-recapture bounds the unseen PAGE population
    from two-pass overlap (n1*n2/m), and a host whose estimate far
    exceeds its observed union is under-crawled.

    The two passes are synthesized deterministically (single-crawl
    corpus, the triple_snapshots md5-presence device): pass g
    captures doc d iff the first md5 nibble of "g|doc_id" >= 3
    (~81% each) — so the TRUE population is known here and the
    estimator's accuracy is itself part of the audit.  Chapman's
    (n1+1)(n2+1)/(m+1) - 1 form rides along (bias-corrected, exact
    integer floor, defined even at m = 0).

    Output per host: (source, n_true, n_cap1, n_cap2, n_both,
    lp_est, chapman_est) — lp_est = n1*n2 div m (0 when m = 0).

    Scale shape: one narrow map (the capture flags are row
    expressions of doc_id) + one bounded groupBy(source) — no
    joins, no windows.
    """
    def nib(g: int):
        return F.expr(
            "instr('0123456789abcdef', substring(md5(concat("
            f"'{g}', '|', CAST(doc_id AS STRING))), 1, 1)) - 1")

    flagged = docs.select(
        "source",
        (nib(0) >= 3).cast("long").alias("_c1"),
        (nib(1) >= 3).cast("long").alias("_c2"))
    agg = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum("_c1").cast("long").alias("n_cap1"),
        F.sum("_c2").cast("long").alias("n_cap2"),
        F.sum(F.col("_c1") * F.col("_c2")).cast("long")
        .alias("n_both"))
    return agg.select(
        "source", "n_true", "n_cap1", "n_cap2", "n_both",
        F.expr("CASE WHEN n_both > 0 THEN"
               " CAST(n_cap1 * n_cap2 DIV n_both AS BIGINT)"
               " ELSE CAST(0 AS BIGINT) END").alias("lp_est"),
        F.expr("CAST((n_cap1 + 1) * (n_cap2 + 1) DIV (n_both + 1)"
               " - 1 AS BIGINT)").alias("chapman_est"))


def stump_split(docs: DataFrame) -> DataFrame:
    """Exact decision-stump split search — the CART building block,
    run over the three cheap per-doc signals (char length,
    distinct-token count, stopword count) against the English
    label: for every candidate threshold t of each feature, the
    weighted Gini impurity of the (x <= t | x > t) split, and the
    argmin.  This is the supervised complement of the correlation
    family (quality_auc ranks thresholds-free, this one picks THE
    threshold a one-rule classifier would ship) and the exact
    version of what every tree learner does greedily.

    Integer exactness: with nL/pL cumulative counts from the
    feature's value histogram, the weighted cost at micro6 scale is

        cost(t) = 1e6*(nL^2 - pL^2 - (nL-pL)^2) div nL
                + 1e6*(nR^2 - pR^2 - (nR-pR)^2) div nR

    (per-side floors — the established device; n*gini(n,p) =
    (n^2 - p^2 - (n-p)^2)/n); the argmin tie-breaks to the
    smallest threshold.  The root impurity and the gain ride
    along.

    Output: one row per feature (feature, best_threshold, n_left,
    pos_left, n_right, pos_right, cost_micro6, root_micro6,
    gain_micro6).

    Scale shape: per feature, ONE corpus-sized (value) histogram
    aggregate; the cumulative window and the argmin run over the
    bounded value domain (the doclen_percentiles discipline).
    """
    toks = _toks()
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    feats = [
        ("n_chars", F.length("text").cast("long")),
        ("n_distinct", F.size(F.array_distinct(toks)).cast("long")),
        ("n_stop", F.size(F.filter(
            toks, lambda t: F.array_contains(stop, F.lower(t))))
         .cast("long")),
    ]
    y = (F.col("lang") == "en").cast("long")
    outs = []
    for name, expr in feats:
        hist = (docs.select(expr.alias("_v"), y.alias("_y"))
                .groupBy("_v")
                .agg(F.count(F.lit(1)).cast("long").alias("_c"),
                     F.sum("_y").cast("long").alias("_p")))
        w = Window.orderBy("_v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)
        wt = Window.partitionBy(F.lit(1))
        g = (hist
             .withColumn("_nl", F.sum("_c").over(w).cast("long"))
             .withColumn("_pl", F.sum("_p").over(w).cast("long"))
             .withColumn("_n", F.sum("_c").over(wt).cast("long"))
             .withColumn("_pt", F.sum("_p").over(wt).cast("long"))
             .where(F.col("_nl") < F.col("_n"))
             .withColumn("_nr", (F.col("_n") - F.col("_nl"))
                         .cast("long"))
             .withColumn("_pr", (F.col("_pt") - F.col("_pl"))
                         .cast("long"))
             .withColumn("cost_micro6", F.expr(
                 "CAST((CAST(1000000 AS DECIMAL(38,0))"
                 " * (_nl * _nl - _pl * _pl"
                 "    - (_nl - _pl) * (_nl - _pl))) div _nl"
                 " + (CAST(1000000 AS DECIMAL(38,0))"
                 " * (_nr * _nr - _pr * _pr"
                 "    - (_nr - _pr) * (_nr - _pr))) div _nr"
                 " AS BIGINT)"))
             .withColumn("root_micro6", F.expr(
                 "CAST((CAST(1000000 AS DECIMAL(38,0))"
                 " * (_n * _n - _pt * _pt"
                 "    - (_n - _pt) * (_n - _pt))) div _n"
                 " AS BIGINT)"))
             .withColumn("_rk", F.row_number().over(
                 Window.orderBy("cost_micro6", "_v")))
             .where(F.col("_rk") == 1))
        outs.append(g.select(
            F.lit(name).alias("feature"),
            F.col("_v").cast("long").alias("best_threshold"),
            F.col("_nl").alias("n_left"),
            F.col("_pl").alias("pos_left"),
            F.col("_nr").alias("n_right"),
            F.col("_pr").alias("pos_right"),
            "cost_micro6", "root_micro6",
            (F.col("root_micro6") - F.col("cost_micro6"))
            .cast("long").alias("gain_micro6")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def bradley_terry(docs: DataFrame, n_iter: int = 5,
                  scale: int = 10**6) -> DataFrame:
    """Bradley-Terry ability scores for hosts from pairwise
    comparisons, fit by Hunter's MM iteration in integer fixed
    point — the pairwise-preference ranking family (the model
    beneath Elo and every LLM preference leaderboard), absent from
    the rank-statistics suite until now: where kendall_w asks "do
    rankers agree", Bradley-Terry turns raw pairwise WINS into a
    strength scale with transitive structure.

    Comparisons are synthesized deterministically from the corpus
    (no preference logs exist): within each language, host a beats
    host b iff a's lower-median doc length exceeds b's (ties are
    skipped) — so every language contributes one round-robin
    tournament and n_ij <= n_languages.

    MM update (Hunter 2004), quantized (the pagerank_fixed
    discipline — per-pair floors, renormalized to max = scale each
    round so the chain cannot drift):

        denom_i = sum_j n_ij * scale^2 div (g_i + g_j)
        g_i'    = wins_i * scale^2 div denom_i, then
        g_i''   = g_i' * scale div max_j g_j'

    Output per host: (source, wins, matches, gamma_u) — gamma_u in
    units of 1/scale, winner pinned at scale.

    Scale shape: one (lang, host) median from the bounded value
    histogram; everything after runs over the bounded host-pair
    table; the per-round max is a 1-row lazy broadcast crossJoin.
    """
    hist = (docs.groupBy("lang", F.col("source").alias("_h"),
                         F.col("n_chars").alias("_v"))
            .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    w = (Window.partitionBy("lang", "_h").orderBy("_v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    h2 = (hist.withColumn("_cum", F.sum("_c").over(w))
          .withColumn("_n", F.sum("_c").over(
              Window.partitionBy("lang", "_h"))))
    med = (h2.where((F.col("_cum") - F.col("_c")
                     <= F.expr("(_n - 1) div 2"))
                    & (F.col("_cum") > F.expr("(_n - 1) div 2")))
           .select("lang", "_h", F.col("_v").alias("_med")))
    a = med.select("lang", F.col("_h").alias("_a"),
                   F.col("_med").alias("_ma"))
    b = med.select("lang", F.col("_h").alias("_b"),
                   F.col("_med").alias("_mb"))
    games = (a.join(b, "lang")
             .where(F.col("_a") != F.col("_b"))
             .where(F.col("_ma") != F.col("_mb"))
             .select("_a", "_b",
                     (F.col("_ma") > F.col("_mb")).cast("long")
                     .alias("_win")))
    pair = (games.groupBy("_a", "_b")
            .agg(F.count(F.lit(1)).cast("long").alias("_n_ij"),
                 F.sum("_win").cast("long").alias("_w_ij"))
            .localCheckpoint())
    per = pair.groupBy("_a").agg(
        F.sum("_w_ij").cast("long").alias("wins"),
        F.sum("_n_ij").cast("long").alias("matches")) \
        .localCheckpoint()
    g = per.select(F.col("_a").alias("_h"),
                   F.lit(scale).cast("long").alias("_g"))
    for _ in range(n_iter):
        gj = g.select(F.col("_h").alias("_b"),
                      F.col("_g").alias("_gb"))
        den = (pair.join(g.withColumnRenamed("_h", "_a"), "_a")
               .join(gj, "_b")
               .groupBy("_a")
               .agg(F.sum(F.expr(
                   f"(_n_ij * CAST({scale * scale} AS"
                   " DECIMAL(38,0))) div (_g + _gb)"))
                   .cast("long").alias("_den")))
        raw = (per.join(den, "_a")
               .select(F.col("_a").alias("_h"),
                       F.expr(
                           f"CASE WHEN _den > 0 THEN CAST((wins"
                           f" * CAST({scale * scale} AS"
                           " DECIMAL(38,0))) div _den AS BIGINT)"
                           " ELSE CAST(0 AS BIGINT) END")
                       .alias("_gr")))
        mx = raw.agg(F.max("_gr").alias("_mx"))
        g = (raw.crossJoin(F.broadcast(mx))  # 1-row scalar
             .select("_h",
                     F.expr(f"CASE WHEN _mx > 0 THEN"
                            f" CAST((_gr * {scale}) div _mx"
                            " AS BIGINT)"
                            " ELSE CAST(0 AS BIGINT) END")
                     .alias("_g"))
             .localCheckpoint())
    return (per.join(g.withColumnRenamed("_h", "_a"), "_a")
            .select(F.col("_a").alias("source"), "wins", "matches",
                    F.col("_g").cast("long").alias("gamma_u")))


def eb_shrinkage(docs: DataFrame) -> DataFrame:
    """Empirical-Bayes (beta-binomial, method-of-moments) shrinkage
    of per-host gate pass-rates — the small-sample correction every
    host-quality ranking needs: a 3-doc host with 3 length-gate
    passes is NOT better than a 10,000-doc host at 92%, and the
    standard fix is to shrink each host's rate toward the corpus
    prior with a strength learned FROM the cross-host spread
    (tau = m(1-m)/v - 1 pseudo-observations; v the between-host
    variance of rates).

    Integer exactness: host rates are micro6 integers r = 1e6*k
    div n; the prior mean m_u = sum(r) div H and spread v_u =
    (H*sum(r^2) - sum(r)^2) div (H*(H-1)) floor once each
    (DECIMAL(38,0)/HUGEINT); tau = m_u*(1e6 - m_u) div v_u - 1
    (capped to [0, 100000]; v_u = 0 means "hosts agree exactly" and
    takes the cap); the pseudo-positives are pp = tau * m_u div
    1e6, and shrunk_micro6 = 1e6*(k + pp) div (n + tau) — floors
    compose identically in both engines.

    Output per host: (source, n_docs, n_keep, rate_micro6, m_u,
    tau, shrunk_micro6).

    Scale shape: one corpus-sized (host) aggregate, one bounded
    host-table aggregate, one 1-row lazy broadcast crossJoin back.
    """
    per = (docs.groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum((F.length("text") >= 200).cast("long"))
                .cast("long").alias("n_keep"))
           .withColumn("rate_micro6",
                       F.expr("CAST(1000000 * n_keep DIV n_docs"
                              " AS BIGINT)")))
    pri = per.agg(
        F.count(F.lit(1)).cast("long").alias("_h"),
        F.sum("rate_micro6").cast("long").alias("_sr"),
        F.sum(F.col("rate_micro6") * F.col("rate_micro6"))
        .cast("long").alias("_sr2"))
    pri = (pri
           .withColumn("m_u", F.expr("CAST(_sr DIV _h AS BIGINT)"))
           .withColumn("_v_u", F.expr(
               "CASE WHEN _h > 1 THEN CAST((CAST(_h AS"
               " DECIMAL(38,0)) * _sr2 - CAST(_sr AS"
               " DECIMAL(38,0)) * _sr) div (CAST(_h AS"
               " DECIMAL(38,0)) * (_h - 1)) AS BIGINT)"
               " ELSE CAST(0 AS BIGINT) END"))
           .withColumn("tau", F.expr(
               "CASE WHEN _v_u > 0 THEN"
               " LEAST(CAST(100000 AS BIGINT), GREATEST("
               " CAST(0 AS BIGINT),"
               " CAST((CAST(m_u AS DECIMAL(38,0))"
               " * (1000000 - m_u)) div _v_u - 1 AS BIGINT)))"
               " ELSE CAST(100000 AS BIGINT) END"))
           .select("m_u", "tau"))
    return (per.crossJoin(F.broadcast(pri))  # 1-row scalar
            .select("source", "n_docs", "n_keep", "rate_micro6",
                    "m_u", "tau",
                    F.expr(
                        "CAST((CAST(1000000 AS DECIMAL(38,0))"
                        " * (n_keep + (tau * m_u) DIV 1000000))"
                        " div (n_docs + tau) AS BIGINT)")
                    .alias("shrunk_micro6")))


def quantile_normalize(docs: DataFrame,
                       n_q: int = 10) -> DataFrame:
    """Quantile-normalization mapping table across host length
    distributions — the bioinformatics device (microarray quantile
    normalization) applied to crawl hosts: map every host's
    doc-length quantiles onto the POOLED quantile function, so
    host-level length effects (boilerplate-heavy shells, truncating
    CMSes) can be divided out before lengths feed a quality score.
    The emitted table is the audit form: per (host, decile), the
    host's own nearest-rank quantile next to the pooled target it
    would be mapped to, and the shift.

    Exact integers: nearest-rank quantiles at index
    (n-1)*q div n_q (lower nearest rank, the source_stats
    convention) from cumulative windows over the bounded value
    histograms — no interpolation, no floats.

    Output: (source, q, host_value, pooled_value, shift =
    pooled - host) for q = 0..n_q (q = n_q is the max).

    Scale shape: one (host, value) histogram + one pooled value
    histogram; quantile selection via cumulative windows over the
    bounded value domains; one bounded (host x quantile) join.
    """
    hist = (docs.groupBy(F.col("source").alias("_h"),
                         F.col("n_chars").alias("_v"))
            .agg(F.count(F.lit(1)).cast("long").alias("_c")))
    qs = F.explode(F.array(*[F.lit(q) for q in range(n_q + 1)]))

    def quantiles(h, part_cols):
        w = (Window.partitionBy(*part_cols).orderBy("_v")
             .rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))
        wp = Window.partitionBy(*part_cols)
        g = (h.withColumn("_cum", F.sum("_c").over(w))
             .withColumn("_n", F.sum("_c").over(wp))
             .withColumn("q", qs))
        idx = F.expr(f"((_n - 1) * q) div {n_q}")
        return (g.where((F.col("_cum") - F.col("_c") <= idx)
                        & (F.col("_cum") > idx))
                .select(*part_cols, "q",
                        F.col("_v").alias("_qv")))

    host_q = quantiles(hist, ["_h"])
    pooled = (hist.groupBy("_v")
              .agg(F.sum("_c").cast("long").alias("_c")))
    pool_q = quantiles(pooled.withColumn("_one", F.lit(1)),
                       ["_one"]).drop("_one")
    return (host_q.join(pool_q.withColumnRenamed("_qv", "_pv"), "q")
            .select(F.col("_h").alias("source"),
                    F.col("q").cast("int").alias("q"),
                    F.col("_qv").cast("long").alias("host_value"),
                    F.col("_pv").cast("long").alias("pooled_value"),
                    (F.col("_pv") - F.col("_qv")).cast("long")
                    .alias("shift")))


def lexical_topk(docs: DataFrame, k: int = 5,
                 max_df: int = 20) -> DataFrame:
    """Sparse tf-idf document-similarity join with rare-term
    blocking — the LEXICAL twin of the embedding ANN stack: same
    candidates-then-verify shape (prefix_filter_pairs' discipline),
    but over the tf-idf bag instead of dense vectors, which is the
    classic first-stage retriever wherever embeddings don't exist
    yet.  Scoring uses the Dice-weighted form sim = 2*dot /
    (|a|^2 + |b|^2) — cosine's harmonic cousin that needs NO
    square root, so the whole ranking stays exact-integer
    (sim <= 1 with equality iff the vectors coincide).

    Weights: tfidf = tf * idf_micro6 with the bm25 single-ln idf
    device (floor(ln((2N+2)/(2df+1)) * 1e6) — the one float op in
    the family, identical in both engines).  Candidates: pairs
    sharing at least one term with 2 <= df <= max_df (rare-term
    blocking — common terms pair everything and carry no signal);
    the dot product then runs over ALL shared terms of the
    candidate pairs.

    Output: (doc_a, doc_b, sim_micro6, rank) — top-k per doc_a by
    (sim desc, doc_b).

    Scale shape: one (doc, term) tf aggregate (localCheckpoint so
    df derives from it without a second scan); the pair join is
    bounded by the df cap, never all-pairs; dot/norm accumulate in
    DECIMAL(38,0)/HUGEINT.  N arrives via one bounded 1-row
    collect (the bm25 T/N pattern).
    """
    toks = docs.select("doc_id",
                       F.explode(_toks()).alias("_raw")).select(
        "doc_id", F.lower(F.col("_raw")).alias("_w"))
    tf = (toks.groupBy("doc_id", "_w")
          .agg(F.count(F.lit(1)).cast("long").alias("_tf"))
          .localCheckpoint())
    dfh = tf.groupBy("_w").agg(
        F.count(F.lit(1)).cast("long").alias("_df"))
    n = docs.count()  # bounded: one scalar (the bm25 T/N pattern)
    idf = dfh.withColumn(
        "_idf",
        F.floor(F.log(F.lit(float(2 * n + 2))
                      / (2 * F.col("_df") + 1))
                * 1000000).cast("long"))
    tv = (tf.join(idf.select("_w", "_idf", "_df"), "_w")
          .select("doc_id", "_w", "_df",
                  (F.col("_tf") * F.col("_idf")).cast("long")
                  .alias("_t"))
          .localCheckpoint())
    norm2 = tv.groupBy("doc_id").agg(
        F.sum(F.expr("CAST(_t AS DECIMAL(38,0)) * _t"))
        .alias("_n2"))
    rare = tv.where((F.col("_df") >= 2) & (F.col("_df") <= max_df))
    ra = rare.select(F.col("doc_id").alias("doc_a"), "_w")
    rb = rare.select(F.col("doc_id").alias("_db"),
                     F.col("_w").alias("_wb"))
    cand = (ra.join(rb, (ra["_w"] == rb["_wb"])
                    & (ra["doc_a"] < rb["_db"]))
            .select("doc_a", F.col("_db").alias("doc_b"))
            .dropDuplicates())
    ta = tv.select(F.col("doc_id").alias("doc_a"), "_w",
                   F.col("_t").alias("_ta"))
    tb = tv.select(F.col("doc_id").alias("_db2"),
                   F.col("_w").alias("_wb2"),
                   F.col("_t").alias("_tb"))
    dot = (cand.join(ta, "doc_a")
           .join(tb, (F.col("_w") == F.col("_wb2"))
                 & (F.col("doc_b") == F.col("_db2")))
           .groupBy("doc_a", "doc_b")
           .agg(F.sum(F.expr("CAST(_ta AS DECIMAL(38,0)) * _tb"))
                .alias("_dot")))
    na = norm2.select(F.col("doc_id").alias("doc_a"),
                      F.col("_n2").alias("_na"))
    nb = norm2.select(F.col("doc_id").alias("doc_b"),
                      F.col("_n2").alias("_nb"))
    scored = (dot.join(na, "doc_a").join(nb, "doc_b")
              .select("doc_a", "doc_b",
                      F.expr("CAST((CAST(2000000 AS DECIMAL(38,0))"
                             " * _dot) div (_na + _nb) AS BIGINT)")
                      .alias("sim_micro6")))
    w = Window.partitionBy("doc_a").orderBy(
        F.col("sim_micro6").desc(), F.col("doc_b"))
    return (scored.withColumn("rank", F.row_number().over(w)
                              .cast("int"))
            .where(F.col("rank") <= k)
            .select("doc_a", "doc_b", "sim_micro6", "rank"))
