"""URL normalization + canonical-URL dedup.

A web corpus carries the same page under many spellings — tracking
params, unsorted query strings, default ports, case-varied hosts,
trailing slashes, fragments.  Normalizing BEFORE content dedup
collapses the cheap identity-level duplicates without touching text
(reference has no analogue: single-document service, utils.py; this is
the 10^12-doc crawl requirement from SURVEY §7.0).

Everything is built-in JVM expressions (regexp / split / array_sort),
so normalization runs inside whole-stage codegen and has an exact
DuckDB oracle.  The test fixture has no messy urls, so the driver
query SYNTHESIZES them deterministically from (doc_id, source) — six
mess classes keyed by doc_id % 6, six doc_ids per logical page — and
both engines synthesize identically (oracle/sqlgen.py URL_CTES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: query params that never change page identity
TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|ref)="


def synth_messy_urls(docs: DataFrame) -> DataFrame:
    """(doc_id, url_raw): deterministic messy url per doc.  Docs of
    one source sharing a doc_id-div-120 bucket share a logical page
    (so real multi-variant groups exist at every SF); doc_id % 6
    picks the mess class — clean, shouty-host+default-port, trailing
    slash, tracking params (two kinds), fragment — all six normalize to the
    same canonical url."""
    page = F.concat(F.lit("/p/"), F.expr("doc_id div 120").cast("string"))
    variant = F.pmod(F.col("doc_id"), F.lit(6))
    host = F.concat(F.col("source"), F.lit(".example.com"))
    url = (
        F.when(variant == 0,
               F.concat(F.lit("https://"), host, page))
        .when(variant == 1,
              F.concat(F.lit("HTTPS://"), F.upper(F.col("source")),
                       F.lit(".Example.COM:443"), page))
        .when(variant == 2,
              F.concat(F.lit("https://"), host, page, F.lit("/")))
        .when(variant == 3,
              F.concat(F.lit("https://"), host, page,
                       F.lit("?utm_source=feed&utm_campaign=x")))
        .when(variant == 4,
              F.concat(F.lit("https://"), host, page, F.lit("?fbclid=abc")))
        .otherwise(
            F.concat(F.lit("https://"), host, page,
                     F.lit("#section-2"))))
    return docs.select("doc_id", url.alias("url_raw"))


def synth_redirect_edges(docs: DataFrame) -> DataFrame:
    """(src_url, dst_url): deterministic redirect-edge fixture built
    from doc_id alone (testdata has no redirect table — same trick as
    :func:`synth_messy_urls`; the DuckDB oracle synthesizes the
    identical edges).  Covers every chain-resolution case:

    - chains: docs with doc_id % 5 != 0 redirect ``r/<d> -> r/<d-1>``,
      so chains of 1..4 hops end at the multiple-of-5 sinks;
    - malformed multi-target: every doc_id % 20 == 7 adds a second
      out-edge ``r/<d> -> r/x<d>`` (resolution must pick min(dst)
      deterministically);
    - 3-cycles: doc_ids 9,10,11 mod 50 wire ``c/9 -> c/10 -> c/11 ->
      c/9`` (per 50-block) — malformed crawl data the resolver must
      flag, not loop on;
    - chain INTO a cycle: doc_id % 50 == 12 points ``c/12 -> c/9``.
    """
    d = F.col("doc_id")

    def r(x):
        return F.concat(F.lit("http://r/"), x.cast("string"))

    def c(x):
        return F.concat(F.lit("http://c/"), x.cast("string"))

    def edge(cond, src, dst):
        return F.when(cond, F.struct(src.alias("src_url"),
                                     dst.alias("dst_url")))

    edges = F.array(
        edge(F.pmod(d, 5) != 0, r(d), r(d - 1)),
        edge(F.pmod(d, 20) == 7, r(d),
             F.concat(F.lit("http://r/x"), d.cast("string"))),
        edge(F.pmod(d, 50).isin(9, 10), c(d), c(d + 1)),
        edge(F.pmod(d, 50) == 11, c(d), c(d - 2)),
        edge(F.pmod(d, 50) == 12, c(d), c(d - 3)),
    )
    return (docs.select(F.explode(edges).alias("e"))
            .where(F.col("e").isNotNull())
            .select("e.src_url", "e.dst_url"))


def url_normalize(df: DataFrame, url_col: str = "url_raw",
                  out_col: str = "url_norm") -> DataFrame:
    """Append the normalized url: strip fragment, lowercase
    scheme+host, drop the scheme's default port, strip trailing
    slashes (empty path -> '/'), drop tracking params, sort the
    remaining query params."""
    u = F.element_at(F.split(F.col(url_col), "#", 2), 1)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = (F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
            .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
            .otherwise(hostport))
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path0 = F.element_at(F.split(pathq, r"\?", 2), 1)
    query = F.when(F.instr(pathq, "?") > 0,
                   F.element_at(F.split(pathq, r"\?", 2), 2)).otherwise(F.lit(""))
    path1 = F.regexp_replace(path0, "/+$", "")
    path = F.when(path1 == "", F.lit("/")).otherwise(path1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    qs = F.when(F.size(params) > 0,
                F.concat(F.lit("?"), F.array_join(params, "&"))) \
        .otherwise(F.lit(""))
    return df.withColumn(out_col, F.concat(scheme, F.lit("://"), host,
                                           path, qs))


def canonical_url_groups(docs: DataFrame) -> DataFrame:
    """The driver-query surface: synthesize messy urls, normalize,
    group by normalized url.  (doc_id, url_raw, url_norm, n_variants,
    is_canonical) — is_canonical marks the min doc_id per group; the
    is_canonical = 1 rows are the url-deduplicated corpus view.

    Scale: one window over url_norm (single shuffle); normalization
    itself is codegen expressions, zero shuffles.
    """
    normed = url_normalize(synth_messy_urls(docs))
    w = Window.partitionBy("url_norm")
    return (normed
            .withColumn("n_variants", F.count(F.lit(1)).over(w).cast("long"))
            .withColumn("is_canonical",
                        (F.col("doc_id") == F.min("doc_id").over(w))
                        .cast("int"))
            .select("doc_id", "url_raw", "url_norm", "n_variants",
                    "is_canonical"))


def resolve_redirect_chains(redirects: DataFrame,
                            max_doubling: int = 16) -> DataFrame:
    """(src_url, dst_url) redirect edges -> (url, final_url): follow
    each chain to its sink by POINTER DOUBLING — each round joins the
    mapping with itself, squaring the resolved hop distance, so a
    chain of length L settles in ceil(log2 L) rounds (16 rounds cover
    chains of 65k hops; real redirect chains are < 10).  O(log L)
    shuffles of the edge table instead of O(L) — the same round
    discipline as the connected-components operator, localCheckpoint
    per round to cut lineage.

    Early-exits when a round changes nothing (one count per round —
    driver-side scalar, not data).  Redirect CYCLES are malformed
    crawl data: rows whose final_url still has an outgoing edge after
    the rounds are flagged ``unresolved=1`` (callers keep or drop;
    resolution never loops forever).
    """
    # one out-edge per src; min(dst) deterministically breaks the
    # (malformed) multi-target case — dropDuplicates on a subset would
    # keep a partition-order-dependent row
    m = (redirects.select(F.col("src_url").alias("src"),
                          F.col("dst_url").alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .groupBy("src").agg(F.min("dst").alias("dst"))
         .localCheckpoint())
    for _ in range(max_doubling):
        a, b = m.alias("a"), m.alias("b")
        m2 = (a.join(b, F.col("a.dst") == F.col("b.src"), "left")
              .select(F.col("a.src").alias("src"),
                      F.coalesce(F.col("b.dst"), F.col("a.dst"))
                      .alias("dst"))
              .localCheckpoint())
        changed = (m2.alias("n")
                   .join(m.alias("o"), "src")
                   .where(F.col("n.dst") != F.col("o.dst")).count())
        m = m2
        if changed == 0:
            break
    sinks_with_out = m.select(F.col("src").alias("dst")).dropDuplicates()
    return (m.join(sinks_with_out.withColumn("_cyc", F.lit(1)),
                   "dst", "left")
            .select(F.col("src").alias("url"),
                    F.col("dst").alias("final_url"),
                    F.coalesce(F.col("_cyc"), F.lit(0)).cast("int")
                    .alias("unresolved")))


def canonical_url_groups_with_redirects(docs_with_url: DataFrame,
                                        redirects: DataFrame) -> DataFrame:
    """Cross-host canonical-url dedup (round-2 roadmap thread): urls
    normalize (tracking params, case, ports, slashes), then resolve
    through the redirect graph, so content reached via chains of
    301s — including cross-host moves — collapses to ONE canonical
    group.  (doc_id, url_norm, final_url, is_canonical); canonical =
    min doc_id per final target.  Redirect edges are given on
    NORMALIZED urls; unresolved (cyclic) urls stay their own group."""
    normed = url_normalize(docs_with_url.select("doc_id", "url"),
                           url_col="url")
    resolved = resolve_redirect_chains(redirects)
    j = (normed.join(resolved.where(F.col("unresolved") == 0),
                     normed["url_norm"] == resolved["url"], "left")
         .select("doc_id", "url_norm",
                 F.coalesce(F.col("final_url"), F.col("url_norm"))
                 .alias("final_url")))
    w = Window.partitionBy("final_url")
    return (j.withColumn("is_canonical",
                         (F.col("doc_id") == F.min("doc_id").over(w))
                         .cast("int"))
            .select("doc_id", "url_norm", "final_url", "is_canonical"))


def politeness_audit(pages: DataFrame, window_s: int = 10) -> DataFrame:
    """Crawl-politeness audit per host — the rate-limit compliance
    read a fetch scheduler owes every origin: within any sliding
    ``window_s``-second window, how many fetches did we fire at the
    host, and how close together were the tightest two?

    burst(f) = fetches of the same host with warc_ts in
    [t_f - (window_s - 1), t_f] — an event-time RANGE window, so
    same-second fetches count together regardless of row order.
    Output per host: (host, n_fetches, max_burst, min_gap_s,
    max_rate_milli = 1000 * max_burst / window_s).  min_gap_s is
    NULL-free: single-fetch hosts report window_s (no gap observed,
    nothing to throttle).  All integer arithmetic.

    Scale shape: ONE shuffle on host, two keyed windows (range-frame
    count + lag gap), one keyed aggregate — the same partitioning a
    per-host politeness limiter shards by at crawl scale.
    """
    host = F.substring_index(
        F.substring_index("url", "//", -1), "/", 1)
    sec = F.expr(
        "unix_micros(cast(warc_ts as timestamp)) div 1000000")
    base = pages.select(host.alias("host"), sec.alias("_sec"))
    wr = (Window.partitionBy("host").orderBy("_sec")
          .rangeBetween(-(window_s - 1), 0))
    wl = Window.partitionBy("host").orderBy("_sec")
    return (base
            .withColumn("_burst", F.count(F.lit(1)).over(wr))
            .withColumn("_gap",
                        F.col("_sec") - F.lag("_sec").over(wl))
            .groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_fetches"),
                 F.max("_burst").cast("long").alias("max_burst"),
                 F.coalesce(F.min("_gap"), F.lit(window_s))
                 .cast("long").alias("min_gap_s"))
            .withColumn("max_rate_milli",
                        F.expr(f"(1000 * max_burst) div {window_s}")
                        .cast("long")))


def path_rollup(docs: DataFrame) -> DataFrame:
    """Site-section rollup: parse every URL's path and aggregate
    doc count / volume / quality share per (host, first path
    segment) — the crawl-economics table a frontier owner reads
    before re-budgeting ("/news is 60% of the host's pages but 20%
    of its text").  The parse is generic (strip scheme, split on
    '/', take the first non-empty segment, '(root)' when the path
    is bare); sections are synthesized deterministically here
    (single-section corpus): sec = ['news','blog','shop','docs']
    [md5-nibble(doc_id) % 4] (the md5-presence device — doc_id % 4
    would alias with the round-robin host assignment), giving every
    host a four-section layout with stable shares.

    Output per (source, section): (source, section, n_docs,
    total_chars, doc_share_micro6, char_share_micro6) — shares
    within the host, floor-scaled.

    Scale shape: one narrow map (url synthesis + parse are row
    expressions), one (host, section) aggregate, one per-host
    window over the bounded section table.
    """
    sec = F.element_at(
        F.array(F.lit("news"), F.lit("blog"), F.lit("shop"),
                F.lit("docs")),
        (F.expr("pmod(instr('0123456789abcdef', substring("
                "md5(CAST(doc_id AS STRING)), 1, 1)) - 1, 4)")
         + 1).cast("int"))
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/"), sec, F.lit("/p/"),
                   F.expr("doc_id div 120").cast("string"))
    parsed = docs.select(
        "source", "n_chars",
        F.coalesce(
            F.nullif(F.element_at(
                F.split(F.regexp_replace(url, "^https?://[^/]+", ""),
                        "/"), 2), F.lit("")),
            F.lit("(root)")).alias("section"))
    per = (parsed.groupBy("source", "section")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("total_chars")))
    w = Window.partitionBy("source")
    return (per
            .withColumn("_nd", F.sum("n_docs").over(w))
            .withColumn("_nc", F.sum("total_chars").over(w))
            .select("source", "section", "n_docs", "total_chars",
                    F.expr("CAST(1000000 * n_docs DIV _nd"
                           " AS BIGINT)").alias("doc_share_micro6"),
                    F.expr("CAST(CASE WHEN _nc > 0 THEN"
                           " 1000000 * total_chars DIV _nc"
                           " ELSE 0 END AS BIGINT)")
                    .alias("char_share_micro6")))
