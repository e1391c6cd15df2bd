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
