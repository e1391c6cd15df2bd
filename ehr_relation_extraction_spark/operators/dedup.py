"""Deduplication operators for training-data pipelines.

Beyond the reference's single ``drop_duplicates`` (utils.py:553), a
100 TB web corpus needs near-dup detection.  All hashing is md5-based
(identical hex output in Spark and DuckDB) so every stage has an exact
SQL oracle; everything is built-in JVM expressions — no Python in the
hot path.

Scale design:
- exact dedup: one hash-aggregate (map-side partial) on ``md5(text)``.
- minhash: explode shingles once, compute all K permutations as
  ``min(md5(seed || shingle))`` in a single grouped aggregate (K
  columns, not K passes).
- LSH: band signatures -> self-join on (band, signature) — candidate
  generation is an equi-join, never an all-pairs product; verification
  (true Jaccard) runs only on candidates.
- simhash: explode tokens, per-bit majority vote via sum of ±1
  contributions from the token hash bits; one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import (CONTAINMENT_THRESHOLD_PCT, JACCARD_THRESHOLD_PCT,
                      LSH_BANDS, MINHASH_PERMS, SHINGLE_K, SIMHASH_BITS)


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, text_md5, group_size, is_canonical) — canonical = min id."""
    h = docs.select("doc_id", F.md5("text").alias("text_md5"))
    w = Window.partitionBy("text_md5")
    return (h.withColumn("group_size", F.count(F.lit(1)).over(w).cast("long"))
             .withColumn("is_canonical",
                         (F.col("doc_id") == F.min("doc_id").over(w)).cast("int")))


def shingles(docs: DataFrame, k: int = SHINGLE_K,
             distinct: bool = True) -> DataFrame:
    """Distinct token k-gram shingles per doc (JVM-side: split +
    transform over a sliding index range — no UDF).

    ``distinct=False`` skips the per-doc dedup shuffle — for
    idempotent consumers (the HLL sketch's max aggregate, streaming
    sources where dropDuplicates would pin unbounded state)."""
    toks = F.filter(F.split(F.col("text"), "[\n \t]"), lambda t: t != "")
    n = F.size(toks)
    # sequence(0, -1) would produce a DESCENDING range — guard short docs
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    out = docs.select("doc_id", F.explode(grams).alias("shingle"))
    return out.dropDuplicates(["doc_id", "shingle"]) if distinct else out


def minhash_signatures(sh: DataFrame,
                       perms: int = MINHASH_PERMS) -> DataFrame:
    """(doc_id, seed, minhash): K md5-keyed min-hashes per doc.

    Computed as one grouped aggregate with K min() columns, then
    unpivoted — a single shuffle regardless of K.
    """
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
            for i in range(perms)]
    wide = sh.groupBy("doc_id").agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(i).alias("seed"), F.col(f"h{i}").alias("minhash"))
        for i in range(perms)])
    return (wide.select("doc_id", F.explode(pairs).alias("p"))
            .select("doc_id", F.col("p.seed").cast("int").alias("seed"),
                    F.col("p.minhash").alias("minhash")))


def lsh_bands(sigs: DataFrame, bands: int = LSH_BANDS,
              perms: int = MINHASH_PERMS) -> DataFrame:
    """(doc_id, band, band_sig): md5 of the concatenated band slice."""
    rows = perms // bands
    banded = sigs.withColumn("band", (F.col("seed") / rows).cast("int"))
    return (banded.groupBy("doc_id", "band")
            .agg(F.md5(F.concat_ws("|", F.array_sort(
                F.collect_list(F.concat_ws(":", "seed", "minhash"))))).alias("band_sig")))


def lsh_candidate_pairs(bands_df: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one band."""
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_sig") == F.col("b.band_sig"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .dropDuplicates())


def verify_jaccard(pairs: DataFrame, sh: DataFrame,
                   threshold_pct: int = JACCARD_THRESHOLD_PCT) -> DataFrame:
    """True shingle-set Jaccard per candidate pair, integer outputs:
    (doc_a, doc_b, n_inter, n_union, jaccard_pct); filtered to
    jaccard_pct >= threshold."""
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (pairs.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter")))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    out = (pairs
           .join(sizes.withColumnRenamed("doc_id", "doc_a")
                      .withColumnRenamed("n_sh", "n_a"), "doc_a")
           .join(sizes.withColumnRenamed("doc_id", "doc_b")
                      .withColumnRenamed("n_sh", "n_b"), "doc_b")
           .join(inter, ["doc_a", "doc_b"], "left")
           .fillna(0, ["n_inter"])
           .withColumn("n_union", (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("long"))
           .withColumn("jaccard_pct",
                       F.floor(F.lit(100) * F.col("n_inter") / F.col("n_union")).cast("long")))
    return (out.where(F.col("jaccard_pct") >= threshold_pct)
            .select("doc_a", "doc_b", "n_inter", "n_union", "jaccard_pct"))


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — per-bit majority over token hashes.

    Bit b of a token's hash = bit (b % 4) of hex nibble (b // 4) of
    md5(token); contribution is +1/-1; simhash bit = (sum > 0).
    Token multiplicity counts (multiset simhash).
    """
    tok = F.explode(F.filter(F.split(F.col("text"), "[\n \t]"), lambda t: t != ""))
    t = docs.select("doc_id", tok.alias("token"))
    t = t.withColumn("h", F.md5("token"))
    nib = [F.conv(F.substring("h", i + 1, 1), 16, 10).cast("int").alias(f"n{i}")
           for i in range((bits + 3) // 4)]
    t = t.select("doc_id", *nib)
    votes = [
        F.sum(F.when(F.shiftright(F.col(f"n{b // 4}"), b % 4).bitwiseAND(1) == 1,
                     1).otherwise(-1)).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = t.groupBy("doc_id").agg(*votes)
    val = None
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << b)
        val = bit if val is None else val + bit
    return agg.select("doc_id", val.cast("long").alias("simhash"))


def verify_containment(pairs: DataFrame, sh: DataFrame,
                       threshold_pct: int = CONTAINMENT_THRESHOLD_PCT
                       ) -> DataFrame:
    """Shingle-set CONTAINMENT per candidate pair:
    ``containment_pct = floor(100 * |A∩B| / min(|A|, |B|))``.

    Symmetric Jaccard misses the quote/boilerplate case — a short doc
    fully embedded in a long one scores low Jaccard but containment
    100.  Same candidate set as :func:`verify_jaccard` (LSH-bounded
    equi-join, never all-pairs); only the verification ratio differs.
    Output: (doc_a, doc_b, n_inter, n_small, containment_pct) filtered
    to >= threshold.
    """
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (pairs.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter")))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    out = (pairs
           .join(sizes.withColumnRenamed("doc_id", "doc_a")
                      .withColumnRenamed("n_sh", "n_a"), "doc_a")
           .join(sizes.withColumnRenamed("doc_id", "doc_b")
                      .withColumnRenamed("n_sh", "n_b"), "doc_b")
           .join(inter, ["doc_a", "doc_b"], "left")
           .fillna(0, ["n_inter"])
           .withColumn("n_small", F.least("n_a", "n_b").cast("long"))
           .withColumn("containment_pct",
                       F.floor(F.lit(100) * F.col("n_inter") / F.col("n_small"))
                       .cast("long")))
    return (out.where(F.col("containment_pct") >= threshold_pct)
            .select("doc_a", "doc_b", "n_inter", "n_small", "containment_pct"))


def dup_clusters(docs: DataFrame,
                 threshold_pct: int = JACCARD_THRESHOLD_PCT) -> DataFrame:
    """Near-duplicate CLUSTERS — the actionable dedup unit a pair list
    is not: (doc_id, cluster_id, cluster_size, is_canonical), where
    cluster_id = min doc_id of the connected component of verified
    near-dup pairs and the canonical doc (keep) is that minimum.
    ``is_canonical = 1`` rows ARE the deduplicated corpus view.

    Scale: edges are verified near-dup pairs only (LSH candidate
    generation, never all-pairs); components via the same O(log n)
    large-star/small-star rounds as entity canonicalization
    (operators/linking.connected_components); docs with no dup edge
    short-circuit through the left join as singleton clusters.  Node
    ids travel as zero-padded strings so the CC's lexicographic MIN
    is the numeric MIN.
    """
    from .linking import connected_components

    sh = shingles(docs)
    pairs = verify_jaccard(
        lsh_candidate_pairs(lsh_bands(minhash_signatures(sh))), sh,
        threshold_pct)

    def pad(c: str):
        return F.lpad(F.col(c).cast("string"), 12, "0")

    edges = pairs.select(pad("doc_a").alias("src"), pad("doc_b").alias("dst"))
    nodes = docs.select(pad("doc_id").alias("node"))
    comp = connected_components(edges, nodes)
    out = comp.select(F.col("node").cast("long").alias("doc_id"),
                      F.col("component").cast("long").alias("cluster_id"))
    w = Window.partitionBy("cluster_id")
    return (out
            .withColumn("cluster_size",
                        F.count(F.lit(1)).over(w).cast("long"))
            .withColumn("is_canonical",
                        (F.col("doc_id") == F.col("cluster_id")).cast("int")))


def simhash_near_dups(docs: DataFrame, bits: int = SIMHASH_BITS,
                      bands: int = 4, max_hamming: int = 3) -> DataFrame:
    """Hamming-ball near-dup pairs over simhash — the cheap
    complement to minhash LSH for boilerplate-ish near-identity:
    block on ``bands`` equal-width bit-bands (a pair within hamming
    distance < bands shares at least one exact band by pigeonhole),
    then verify popcount(xor) <= max_hamming.  Never all-pairs; the
    candidate join is an equi-join on (band, band_bits).  Band width
    scales with SIMHASH_BITS (production: 64-bit simhash, 4x16-bit
    bands).

    Output: (doc_a, doc_b, hamming) for verified pairs.
    """
    width = bits // bands
    mask = (1 << width) - 1
    sh = simhash(docs, bits)
    bandrows = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright(F.col("simhash"), b * width)
                 .bitwiseAND(mask).alias("band_bits"))
        for b in range(bands)])
    banded = sh.select("doc_id", "simhash",
                       F.explode(bandrows).alias("b")) \
        .select("doc_id", "simhash", "b.band", "b.band_bits")
    a = banded.select(F.col("doc_id").alias("doc_a"),
                      F.col("simhash").alias("_sa"), "band", "band_bits")
    b = banded.select(F.col("doc_id").alias("doc_b"),
                      F.col("simhash").alias("_sb"), "band", "band_bits")
    # r06: verify the hamming ball BEFORE the pair dedup — rows of the
    # same (doc_a, doc_b) carry identical simhashes, so the filter
    # commutes with dropDuplicates, and failing candidates never enter
    # the dedup exchange (guide §2.3 "shuffle fewer bytes").
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (a.join(b, ["band", "band_bits"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .withColumn("hamming", ham.cast("int"))
            .where(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming")
            .dropDuplicates(["doc_a", "doc_b"]))


def prefix_filter_pairs(docs: DataFrame,
                        threshold_pct: int = 80) -> DataFrame:
    """EXACT set-similarity join by prefix filtering (the PPJoin
    family, Xiao et al. WWW'08): unlike the MinHash-LSH path this has
    ZERO false negatives — every pair with token-Jaccard >=
    threshold is guaranteed to surface as a candidate, because two
    sets with overlap o >= ceil(t*|x|) must collide inside their
    (|x| - ceil(t*|x|) + 1)-length prefixes under ANY shared global
    token order.

    The global order is (doc-frequency ASC, token ASC) — rarest
    first, so prefixes are the least-collising tokens and the
    candidate join fans out on the frequency TAIL, not the head.
    Crucially the order is applied with a PER-DOC window
    (row_number partitioned by doc_id), never a global rank — no
    single-partition sort anywhere.

    Plan: one distinct (doc, token) aggregate, one token-frequency
    aggregate, one broadcast-joinable frequency lookup, the per-doc
    prefix window, one token-equi candidate join + pair dedup, then
    the exact verify (two incidence joins + one grouped count).
    Output: (doc_a, doc_b, n_inter, n_union, jac_micro6) — ONLY the
    verified pairs (Jaccard >= threshold, by integer
    cross-multiplication); candidates that fail the verify stay
    internal.  On a web-scale corpus the prefix join fans out on the
    frequency tail; the driver corpus's deliberately tiny vocabulary
    is the worst case for pruning (the zero-false-negative pytest
    brute-forces all pairs to prove completeness anyway).
    """
    dt = (docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(F.filter(F.split(F.lower(F.col("text")), "[\n \t]"),
                           lambda t: t != "")).alias("tok"))
        .dropDuplicates())
    freq = dt.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
    sized = dt.withColumn(
        "n", F.count(F.lit(1)).over(
            Window.partitionBy("doc_id")).cast("long"))
    t = threshold_pct
    # prefix len p = n - ceil(t*n/100) + 1; ceil as (t*n + 100 - 1)//100
    ordered = (sized.join(freq, "tok")
               .withColumn("pos", F.row_number().over(
                   Window.partitionBy("doc_id")
                   .orderBy(F.col("n_docs").asc(), F.col("tok").asc())))
               .withColumn("p", F.col("n")
                           - F.floor((F.lit(t) * F.col("n")
                                      + F.lit(99)) / F.lit(100))
                           .cast("long") + F.lit(1)))
    pref = ordered.where(F.col("pos") <= F.col("p")).select("doc_id", "tok")
    cand = (pref.alias("a").join(pref.alias("b"), "tok")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .dropDuplicates())
    # Verify shape note (r06, measured): an array_intersect verify
    # (attach per-doc token arrays, one row per candidate) was tried
    # and is ~2x SLOWER here — the array attach duplicates ~54-token
    # arrays per candidate while the incidence join ships skinny
    # (pair, tok) rows that partially aggregate map-side.  The
    # incidence-join verify stands; this fixture (tiny template
    # vocabulary, 24% of ALL pairs >= 0.8 Jaccard) is the documented
    # worst case — on real corpora the prefix filter prunes the
    # candidate set and the verify is linear in true matches.
    sizes = dt.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_toks"))
    inter = (cand
             .join(dt.select(F.col("doc_id").alias("doc_a"),
                             "tok"), "doc_a")
             .join(dt.select(F.col("doc_id").alias("doc_b"),
                             "tok"), ["doc_b", "tok"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter")))
    return (cand.join(inter, ["doc_a", "doc_b"], "left")
            .join(sizes.select(F.col("doc_id").alias("doc_a"),
                               F.col("n_toks").alias("_na")), "doc_a")
            .join(sizes.select(F.col("doc_id").alias("doc_b"),
                               F.col("n_toks").alias("_nb")), "doc_b")
            .select("doc_a", "doc_b",
                    F.coalesce("n_inter", F.lit(0)).cast("long")
                    .alias("n_inter"),
                    (F.col("_na") + F.col("_nb")
                     - F.coalesce("n_inter", F.lit(0))).cast("long")
                    .alias("n_union"))
            .where(F.col("n_inter") * 100 >= F.col("n_union") * t)
            .withColumn("jac_micro6",
                        F.floor(F.col("n_inter") * F.lit(1000000)
                                / F.col("n_union")).cast("long")))


def _exact_item_pairs(items: DataFrame, threshold_pct: int) -> DataFrame:
    """Complete (zero-false-negative) set-similarity join over an
    arbitrary (doc_id, item) incidence table at Jaccard >=
    threshold_pct — the :func:`prefix_filter_pairs` prefix-filter
    device generalized from token sets to any item universe (here:
    shingle sets, so the LSH eval's ground truth lives on the SAME
    universe MinHash sketches).  Verification is exact integer
    cross-multiplication; output (doc_a, doc_b) only."""
    it = items.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "item").dropDuplicates()
    freq = it.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
    sized = it.withColumn(
        "n", F.count(F.lit(1)).over(
            Window.partitionBy("doc_id")).cast("long"))
    t = threshold_pct
    ordered = (sized.join(freq, "item")
               .withColumn("pos", F.row_number().over(
                   Window.partitionBy("doc_id")
                   .orderBy(F.col("n_docs").asc(), F.col("item").asc())))
               .withColumn("p", F.col("n")
                           - F.floor((F.lit(t) * F.col("n")
                                      + F.lit(99)) / F.lit(100))
                           .cast("long") + F.lit(1)))
    pref = ordered.where(F.col("pos") <= F.col("p")).select(
        "doc_id", "item")
    cand = (pref.alias("a").join(pref.alias("b"), "item")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .dropDuplicates())
    sizes = it.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_it"))
    inter = (cand
             .join(it.select(F.col("doc_id").alias("doc_a"),
                             "item"), "doc_a")
             .join(it.select(F.col("doc_id").alias("doc_b"),
                             "item"), ["doc_b", "item"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter")))
    return (cand.join(inter, ["doc_a", "doc_b"])
            .join(sizes.select(F.col("doc_id").alias("doc_a"),
                               F.col("n_it").alias("_na")), "doc_a")
            .join(sizes.select(F.col("doc_id").alias("doc_b"),
                               F.col("n_it").alias("_nb")), "doc_b")
            .where(F.col("n_inter") * 100
                   >= (F.col("_na") + F.col("_nb")
                       - F.col("n_inter")) * t)
            .select("doc_a", "doc_b"))


def lsh_dedup_eval(docs: DataFrame,
                   threshold_pct: int = JACCARD_THRESHOLD_PCT) -> DataFrame:
    """Candidate-quality evaluation of the MinHash-LSH dedup path —
    the measurement a pipeline owner needs before trusting LSH at a
    new (perms, bands) setting: against the COMPLETE exact-Jaccard
    pair set (prefix filter over the same shingle universe, zero
    false negatives by construction), how many true near-dup pairs
    does banding surface (recall) and how much of the candidate join
    is wasted verify work (precision)?

    One row: (n_truth, n_cand, tp, fp, fn, precision_micro6,
    recall_micro6).  tp = LSH candidates whose exact shingle Jaccard
    >= threshold (integer cross-multiplication); fp = the rest of the
    candidates; fn = truth pairs banding never surfaced.  Exact
    integer division, zero-guarded.

    Scale: both pair generators are bucketed equi-joins (band
    buckets / rare-item prefixes) — never all-pairs; the compare is
    two keyed semi/anti joins; the roll-up is the labeled-union
    single aggregate."""
    sh = shingles(docs)
    truth = _exact_item_pairs(
        sh.select("doc_id", F.col("shingle").alias("item")),
        threshold_pct)
    cand = lsh_candidate_pairs(lsh_bands(minhash_signatures(sh)))
    tp = cand.join(truth, ["doc_a", "doc_b"], "semi")
    lab = (truth.agg(F.count(F.lit(1)).cast("long").alias("v"))
           .select(F.lit("truth").alias("k"), "v")
           .unionByName(cand.agg(F.count(F.lit(1)).cast("long")
                                 .alias("v"))
                        .select(F.lit("cand").alias("k"), "v"))
           .unionByName(tp.agg(F.count(F.lit(1)).cast("long")
                               .alias("v"))
                        .select(F.lit("tp").alias("k"), "v")))
    row = lab.groupBy().agg(
        F.max(F.when(F.col("k") == "truth", F.col("v"))).cast("long")
        .alias("n_truth"),
        F.max(F.when(F.col("k") == "cand", F.col("v"))).cast("long")
        .alias("n_cand"),
        F.max(F.when(F.col("k") == "tp", F.col("v"))).cast("long")
        .alias("tp"))
    return row.select(
        "n_truth", "n_cand", "tp",
        (F.col("n_cand") - F.col("tp")).cast("long").alias("fp"),
        (F.col("n_truth") - F.col("tp")).cast("long").alias("fn"),
        F.when(F.col("n_cand") > 0,
               F.expr("tp * 1000000 DIV n_cand"))
        .otherwise(F.lit(0)).cast("long").alias("precision_micro6"),
        F.when(F.col("n_truth") > 0,
               F.expr("tp * 1000000 DIV n_truth"))
        .otherwise(F.lit(0)).cast("long").alias("recall_micro6"))


def syndication_edges(docs: DataFrame,
                      threshold_pct: int = JACCARD_THRESHOLD_PCT) -> DataFrame:
    """Content-syndication provenance graph: which source published
    first, and who re-published?  Every near-duplicate doc pair
    (COMPLETE exact shingle-Jaccard join — provenance cannot tolerate
    LSH false negatives, so this rides :func:`_exact_item_pairs`) is
    attributed by the synthetic crawl clock (doc_id IS the crawl
    order, sources/pages.py's warc_ts convention): the lower doc_id's
    source is the first publisher, the higher the re-publisher.

    Output: (src_first, src_later, n_pairs, n_docs_later) — n_pairs
    near-dup pairs flowing first->later, over n_docs_later distinct
    re-published docs.  src_first == src_later rows are internal
    re-posts, kept and labeled by the same rule.

    Scale: the pair generator is the prefix-filter join (bucketed on
    rare shingles, never all-pairs); attribution is two keyed joins
    against the doc->source projection; one roll-up."""
    sh = shingles(docs)
    pairs = _exact_item_pairs(
        sh.select("doc_id", F.col("shingle").alias("item")),
        threshold_pct)
    src = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "source")
    return (pairs
            .join(src.select(F.col("doc_id").alias("doc_a"),
                             F.col("source").alias("src_first")),
                  "doc_a")
            .join(src.select(F.col("doc_id").alias("doc_b"),
                             F.col("source").alias("src_later")),
                  "doc_b")
            .groupBy("src_first", "src_later")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.countDistinct("doc_b").cast("long")
                 .alias("n_docs_later")))


DUP_CURVE_THRESHOLDS = (30, 50, 70, 90)


def dup_rate_curve(docs: DataFrame,
                   thresholds=DUP_CURVE_THRESHOLDS) -> DataFrame:
    """Dedup-threshold tuning curve — the table an operator reads
    before picking a Jaccard cutoff: at each candidate threshold, how
    many near-dup pairs exist and what share of the corpus would be
    touched?  Pairs come from ONE complete prefix-filter join at the
    LOOSEST threshold (completeness at t_min implies completeness at
    every t >= t_min), with exact (n_inter, n_union) per pair; each
    curve point is then a pure filter + roll-up of the same pair
    table — the threshold sweep costs one join, not len(thresholds).

    Output: (threshold_pct, n_pairs, n_docs_dup, docs_share_micro6)
    — one row per threshold; n_docs_dup = distinct docs in >= 1
    surviving pair.

    Scale: one prefix-filter candidate join + exact verify, one
    explode over len(thresholds) literals, two roll-ups."""
    t_min = min(thresholds)
    sh = shingles(docs)
    it = sh.select(F.col("doc_id").cast("long").alias("doc_id"),
                   F.col("shingle").alias("item")).dropDuplicates()
    freq = it.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
    sized = it.withColumn(
        "n", F.count(F.lit(1)).over(
            Window.partitionBy("doc_id")).cast("long"))
    ordered = (sized.join(freq, "item")
               .withColumn("pos", F.row_number().over(
                   Window.partitionBy("doc_id")
                   .orderBy(F.col("n_docs").asc(),
                            F.col("item").asc())))
               .withColumn("p", F.col("n")
                           - F.floor((F.lit(t_min) * F.col("n")
                                      + F.lit(99)) / F.lit(100))
                           .cast("long") + F.lit(1)))
    pref = ordered.where(F.col("pos") <= F.col("p")).select(
        "doc_id", "item")
    cand = (pref.alias("a").join(pref.alias("b"), "item")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .dropDuplicates())
    sizes = it.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_it"))
    inter = (cand
             .join(it.select(F.col("doc_id").alias("doc_a"),
                             "item"), "doc_a")
             .join(it.select(F.col("doc_id").alias("doc_b"),
                             "item"), ["doc_b", "item"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter")))
    verified = (inter
                .join(sizes.select(F.col("doc_id").alias("doc_a"),
                                   F.col("n_it").alias("_na")),
                      "doc_a")
                .join(sizes.select(F.col("doc_id").alias("doc_b"),
                                   F.col("n_it").alias("_nb")),
                      "doc_b")
                .select("doc_a", "doc_b", "n_inter",
                        (F.col("_na") + F.col("_nb")
                         - F.col("n_inter")).cast("long")
                        .alias("n_union")))
    th = F.explode(F.array(*[F.lit(int(t)) for t in
                             sorted(thresholds)])).alias("threshold_pct")
    swept = (verified.select(th, "doc_a", "doc_b", "n_inter",
                             "n_union")
             .where(F.col("n_inter") * 100
                    >= F.col("n_union") * F.col("threshold_pct")))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n")).first()["n"]
    pairs = swept.groupBy("threshold_pct").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"))
    touched = (swept.select("threshold_pct",
                            F.col("doc_a").alias("doc_id"))
               .union(swept.select("threshold_pct",
                                   F.col("doc_b").alias("doc_id")))
               .dropDuplicates()
               .groupBy("threshold_pct")
               .agg(F.count(F.lit(1)).cast("long")
                    .alias("n_docs_dup")))
    base = docs.sparkSession.createDataFrame(
        [(int(t),) for t in sorted(thresholds)], "threshold_pct int")
    return (base.join(pairs, "threshold_pct", "left")
            .join(touched, "threshold_pct", "left")
            .select(F.col("threshold_pct").cast("int")
                    .alias("threshold_pct"),
                    F.coalesce("n_pairs", F.lit(0)).cast("long")
                    .alias("n_pairs"),
                    F.coalesce("n_docs_dup", F.lit(0)).cast("long")
                    .alias("n_docs_dup"),
                    F.expr(f"CAST(COALESCE(n_docs_dup, 0) * 1000000"
                           f" DIV {n_docs} AS BIGINT)")
                    .alias("docs_share_micro6")))


def cdc_chunks(docs: DataFrame, window: int = 8, base: int = 31,
               modulus: int = 1 << 20, divisor: int = 64) -> DataFrame:
    """Content-defined chunking (CDC) dedup census — the chunk-level
    companion to exact/minhash/simhash doc-level dedup: a Rabin-style
    polynomial rolling hash over a ``window``-char sliding window
    declares a chunk boundary at every position i where
    H(i) % divisor == 0, so chunk cut points survive insertions and
    deletions (the property fixed-size blocks lack) and shared
    passages between near-duplicate pages land in byte-identical
    chunks.  This is the storage-dedup / delta-crawl primitive
    (LBFS/Venti lineage) applied to web text.

    Deviation from production CDC, on purpose: no min/max chunk-size
    clamps.  The clamped variant makes boundary i depend on boundary
    i-1 (sequential scan per doc); the pure predicate form is
    position-local, so the whole corpus chunks in ONE codegen'd
    projection — and it stays an exact function of content, which is
    what the oracle checks.

    H(i) = sum_{k=0..w-1} codepoint(text[i-k]) * base^k  (mod 2^20),
    all BIGINT-safe (max codepoint * 31^7 * 8 ~ 2.4e17).  Docs
    shorter than the window form a single chunk; a boundary at the
    last char would create an empty tail, which is dropped.

    Output: the corpus-wide chunk-multiplicity histogram
    (multiplicity, n_chunks, n_bytes) — n_chunks distinct chunk
    values occur exactly `multiplicity` times, n_bytes is the bytes
    of ONE copy of each (so dedup savings = sum((m-1) * n_bytes)).

    Scale shape: one narrow projection computes boundaries as array
    expressions (no Python, no shuffle), one explode, then two
    hash aggregates (chunk value -> multiplicity -> histogram) —
    the same shape as dedup_exact with an explode in front.  The
    histogram output is bounded by the max multiplicity, not the
    corpus.
    """
    w, b, m, d = window, base, modulus, divisor
    terms = " + ".join(
        f"CAST(ascii(substr(text, i - {k}, 1)) AS BIGINT) * {b ** k}"
        for k in range(w))
    bnd = (f"filter(sequence({w}, length(text)), "
           f"i -> (({terms}) % {m}) % {d} = 0)")
    chunks = (docs
              .where(F.length("text") > 0)
              .withColumn("_bnd", F.expr(bnd))
              .withColumn(
                  "_starts",
                  F.expr("concat(array(1), transform(_bnd, x -> x + 1))"))
              .withColumn(
                  "_ends",
                  F.expr("concat(_bnd, array(length(text)))"))
              .select(F.explode(F.expr(
                  "filter(arrays_zip(_starts, _ends), "
                  "p -> p._ends >= p._starts)")).alias("p"),
                  "text")
              .select(F.expr(
                  "substr(text, p._starts, p._ends - p._starts + 1)")
                  .alias("chunk")))
    per_chunk = (chunks.groupBy("chunk").agg(
        F.count(F.lit(1)).cast("long").alias("multiplicity"))
        .select("multiplicity",
                F.length("chunk").cast("long").alias("_len")))
    return (per_chunk.groupBy("multiplicity").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("_len").cast("long").alias("n_bytes"))
        .select("multiplicity", "n_chunks", "n_bytes"))


def winnow_dups(docs: DataFrame, k: int = 3, w: int = 4,
                max_df: int = 50) -> DataFrame:
    """Winnowing fingerprint near-dup candidates (Schleimer/
    Wilkerson/Aiken, SIGMOD'03 — the MOSS algorithm): the guarantee
    the minhash/simhash/passage family does NOT give is positional
    — any shared run of at least w+k-1 tokens is certain to share a
    selected fingerprint (no probabilistic miss), which is why
    winnowing is the standard for plagiarism/clone detection while
    LSH is the standard for whole-document similarity.

    Per document: k-gram md5 hashes (the minhash lexicographic-hex
    device), then each length-w window selects its minimum hash,
    RIGHTMOST position on ties (the paper's rule, implemented as
    array_sort by (hash asc, -pos) — no per-row Python); selected
    (hash, position)s collapse to the doc's fingerprint SET.
    Documents sharing a fingerprint pair up; fingerprints shared by
    more than ``max_df`` docs are purged first (the token_blocks
    block-purging guard — boilerplate grams pair everything).

    Output: (doc_a, doc_b, n_shared, n_a, n_b, overlap_micro6 =
    1e6 * n_shared div least(n_a, n_b)).

    Scale shape: per-doc windows only (partitioned by doc_id);
    the pair stage is a fingerprint equi-join bounded by max_df —
    never all-pairs.
    """
    toks = (docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split(F.col("text"), "[\n \t]"),
                              lambda t: t != ""))
        .alias("_i", "_t"))
        .select("doc_id", "_i", F.lower("_t").alias("_t")))
    wd = Window.partitionBy("doc_id").orderBy("_i")
    # k-gram built from k (ADVICE r05: this was hardcoded to trigrams,
    # silently ignoring k — the streaming twin honored it, so the two
    # disagreed for non-default k)
    parts = ["_t"] + [F.lead("_t", j).over(wd) for j in range(1, k)]
    last = F.lead("_t", k - 1).over(wd) if k > 1 else F.col("_t")
    grams = toks.select(
        "doc_id", "_i",
        F.concat_ws(" ", *parts).alias("_g"),
        last.alias("_ok"))
    grams = (grams.where(F.col("_ok").isNotNull())
             .withColumn("_gi", F.row_number().over(wd) - 1)
             .withColumn("_h", F.md5("_g"))
             .withColumn("_ng", F.count(F.lit(1)).over(
                 Window.partitionBy("doc_id"))))
    wf = (Window.partitionBy("doc_id").orderBy("_gi")
          .rowsBetween(0, w - 1))
    starts = (grams
              .withColumn("_arr", F.collect_list(
                  F.struct(F.col("_h").alias("h"),
                           (-F.col("_gi")).alias("ni"),
                           F.col("_gi").alias("gi"))).over(wf))
              .where(F.col("_gi") <= F.col("_ng") - w)
              .withColumn("_top", F.element_at(
                  F.array_sort("_arr"), 1)))
    sel = (starts.select("doc_id",
                         F.col("_top.h").alias("fp"),
                         F.col("_top.gi").alias("fp_pos"))
           .dropDuplicates())
    fps = sel.select("doc_id", "fp").dropDuplicates() \
        .localCheckpoint()
    nfp = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("_n"))
    hot = (fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
           .where(F.col("_df") <= max_df).select("fp"))
    cold = fps.join(hot, "fp")
    a = cold.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = cold.select(F.col("fp").alias("_fpb"),
                    F.col("doc_id").alias("doc_b"))
    pairs = (a.join(b, (a["fp"] == b["_fpb"])
                    & (a["doc_a"] < b["doc_b"]))
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_shared")))
    na = nfp.select(F.col("doc_id").alias("doc_a"),
                    F.col("_n").alias("n_a"))
    nb = nfp.select(F.col("doc_id").alias("doc_b"),
                    F.col("_n").alias("n_b"))
    return (pairs.join(na, "doc_a").join(nb, "doc_b")
            .select("doc_a", "doc_b", "n_shared", "n_a", "n_b",
                    F.expr("CAST(1000000 * n_shared"
                           " DIV least(n_a, n_b) AS BIGINT)")
                    .alias("overlap_micro6")))


def weighted_jaccard(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """Exact WEIGHTED (bag) Jaccard verify over candidate pairs —
    the multiset upgrade of verify_jaccard's set similarity:
    J_w = sum_t min(tf_a, tf_b) / sum_t max(tf_a, tf_b) over token
    frequencies, which separates "same vocabulary, different
    emphasis" (a page quoting another once) from true near-clones
    in a way the set form cannot (set Jaccard saturates the moment
    every token appears at least once on both sides).

    All integers: per pair, inter_w = sum min(tf), union_w =
    sum max(tf) = tf_a_total + tf_b_total - inter_w (so tokens on
    one side only are handled by the totals, and the join only has
    to touch SHARED tokens), wjaccard_micro6 = 1e6 * inter_w div
    union_w.

    Output: (doc_a, doc_b, inter_w, union_w, wjaccard_micro6).

    Scale shape: verify runs on candidates only (the LSH-band
    output — never all pairs); one (doc, token) tf aggregate, two
    candidate-keyed equi-joins on the shared-token stream, one
    per-pair aggregate, two doc-total joins.
    """
    tf = (docs.select("doc_id",
                      F.explode(F.filter(
                          F.split(F.col("text"), "[\n \t]"),
                          lambda t: t != "")).alias("_t"))
          .select("doc_id", F.lower("_t").alias("_w"))
          .groupBy("doc_id", "_w")
          .agg(F.count(F.lit(1)).cast("long").alias("_tf"))
          .localCheckpoint())
    tot = tf.groupBy("doc_id").agg(
        F.sum("_tf").cast("long").alias("_tot"))
    ta = tf.select(F.col("doc_id").alias("doc_a"), "_w",
                   F.col("_tf").alias("_fa"))
    tb = tf.select(F.col("doc_id").alias("_db"),
                   F.col("_w").alias("_wb"),
                   F.col("_tf").alias("_fb"))
    inter = (pairs.select("doc_a", "doc_b").dropDuplicates()
             .join(ta, "doc_a")
             .join(tb, (F.col("_w") == F.col("_wb"))
                   & (F.col("doc_b") == F.col("_db")))
             .groupBy("doc_a", "doc_b")
             .agg(F.sum(F.least("_fa", "_fb")).cast("long")
                  .alias("inter_w")))
    na = tot.select(F.col("doc_id").alias("doc_a"),
                    F.col("_tot").alias("_na"))
    nb = tot.select(F.col("doc_id").alias("doc_b"),
                    F.col("_tot").alias("_nb"))
    return (pairs.select("doc_a", "doc_b").dropDuplicates()
            .join(inter, ["doc_a", "doc_b"], "left")
            .na.fill(0, ["inter_w"])
            .join(na, "doc_a").join(nb, "doc_b")
            .select("doc_a", "doc_b",
                    F.col("inter_w").cast("long").alias("inter_w"),
                    (F.col("_na") + F.col("_nb")
                     - F.col("inter_w")).cast("long")
                    .alias("union_w"))
            .withColumn("wjaccard_micro6",
                        F.expr("CAST(CASE WHEN union_w > 0 THEN"
                               " 1000000 * inter_w DIV union_w"
                               " ELSE 0 END AS BIGINT)")))
