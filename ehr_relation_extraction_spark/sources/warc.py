"""WARC/1.0 record source — the Common-Crawl interchange format.

Common Crawl ships crawls as WARC files: one record per fetch, an
ISO-28500 header block (``WARC/1.0`` + ``Name: value`` lines), a blank
line, then the payload.  The engine's authoritative input is the pages
table (sources/pages.py), so this module provides the two adapters a
crawl pipeline needs at that boundary:

- ``warc_records(pages)``: serialize a pages frame into WARC *response*
  records (one string per page) — the export side; deterministic, so it
  doubles as the test fixture generator.
- ``parse_warc_records(records)``: parse record strings back into the
  typed header + payload columns — the ingest side.  Pure codegen
  string expressions (``regexp_extract`` / ``substring_index``), no
  Python in the path; at 10^12 scale this runs inside the scan
  projection of whatever splits the raw WARC files into records.

Round-trip invariant (tested + oracle-checked): ``parse(serialize(p))``
reproduces (url, warc_ts, payload) byte-exactly — the same byte-
identical-extraction contract the html wrapper in sources/pages.py is
held to.

Real Common Crawl WARCs are gzip-framed; the container has no gzip
codec hook for a custom line format, so file-level framing stays at
the (pluggable) reader — the record grammar here is the stable part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_CRLF = "\r\n"


def warc_records(pages: DataFrame) -> DataFrame:
    """pages -> (doc_id, record): one WARC/1.0 response record per
    page.  Header values derive only from page columns, so the record
    is a pure projection; Content-Length counts payload bytes (UTF-8),
    per ISO-28500."""
    payload = F.decode(F.col("html"), "utf-8")
    rec = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Target-URI: "), F.col("url"), F.lit(_CRLF),
        F.lit("WARC-Date: "),
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(_CRLF),
        F.lit("WARC-Record-ID: <urn:doc:"),
        F.col("doc_id").cast("string"), F.lit(">" + _CRLF),
        F.lit("Content-Length: "),
        F.length(F.col("html")).cast("string"), F.lit(_CRLF),
        F.lit(_CRLF),
        payload,
    )
    return pages.select("doc_id", rec.alias("record"))


def parse_warc_records(records: DataFrame,
                       col: str = "record") -> DataFrame:
    """(.., record) -> typed header + payload columns.

    The header block ends at the first blank line (CRLFCRLF); header
    values parse with anchored regexes over that block only, so a
    payload containing header-looking lines can never spoof a field.
    Output: (doc_id, warc_type, url, warc_ts, record_id,
    content_length, payload, payload_ok) where payload_ok asserts the
    ISO-28500 length contract against the actual payload bytes."""
    c = F.col(col)
    header = F.substring_index(c, _CRLF + _CRLF, 1)
    payload = F.expr(
        f"substring({col}, length(substring_index({col}, "
        f"'{_CRLF}{_CRLF}', 1)) + 5)")

    def h(name: str):
        return F.regexp_extract(header,
                                f"(?m)^{name}: ([^\\r\\n]*)$", 1)

    ts = F.to_timestamp(h("WARC-Date"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    clen = h("Content-Length").cast("long")
    return records.select(
        *[fc for fc in records.columns if fc != col],
        h("WARC-Type").alias("warc_type"),
        h("WARC-Target-URI").alias("url"),
        ts.alias("warc_ts"),
        F.regexp_extract(header, r"(?m)^WARC-Record-ID: <([^>]*)>$",
                         1).alias("record_id"),
        clen.alias("content_length"),
        payload.alias("payload"),
        (F.length(F.encode(payload, "utf-8")) == clen)
        .alias("payload_ok"),
    )
