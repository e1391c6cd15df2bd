"""WARC/1.0 source: cross-engine round-trip parity + parser
robustness against header-looking payloads and embedded blank
lines."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


def test_oracle_parity(spark):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    con = duck_con(SF)
    try:
        ok, msg = compare(QUERIES["warc_roundtrip"](spark, SF),
                          con.sql(ORACLE["warc_roundtrip"]).df())
    finally:
        con.close()
    assert ok, msg


def test_roundtrip_flags_all_green(spark):
    """Every record parses with the byte-length contract satisfied
    and the payload byte-identical to the page html."""
    from ehr_relation_extraction_spark.driver_queries import QUERIES

    rows = QUERIES["warc_roundtrip"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.warc_type == "response"
        assert r.payload_ok == 1 and r.text_match == 1
        assert r.record_id == f"urn:doc:{r.doc_id}"
        assert r.ts_epoch == 1704067200 + r.doc_id


def test_parser_hostile_payloads(spark):
    """A payload containing header-looking lines or its own blank
    lines must not spoof header fields or truncate: the header block
    ends at the FIRST CRLFCRLF and everything after it is payload."""
    from ehr_relation_extraction_spark.sources.warc import (
        parse_warc_records)

    evil = ("evil\r\nWARC-Type: fake\r\n\r\n"
            "WARC-Target-URI: http://spoof/\r\nrest")
    rec = ("WARC/1.0\r\n"
           "WARC-Type: response\r\n"
           "WARC-Target-URI: https://real.example.com/1\r\n"
           "WARC-Date: 2024-01-01T00:00:00Z\r\n"
           "WARC-Record-ID: <urn:doc:1>\r\n"
           f"Content-Length: {len(evil.encode())}\r\n"
           "\r\n" + evil)
    df = spark.createDataFrame([(1, rec)], "doc_id long, record string")
    row = parse_warc_records(df).collect()[0]
    assert row.warc_type == "response"
    assert row.url == "https://real.example.com/1"
    assert row.payload == evil
    assert bool(row.payload_ok) is True


def test_parser_multibyte_content_length(spark):
    """Content-Length counts UTF-8 BYTES, not characters; payload_ok
    distinguishes the two on multibyte payloads."""
    from ehr_relation_extraction_spark.sources.warc import (
        parse_warc_records)

    payload = "héllo☃"  # 6 chars, 9 utf-8 bytes
    nbytes = len(payload.encode("utf-8"))
    assert nbytes != len(payload)

    def rec(clen):
        return ("WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                "WARC-Target-URI: u\r\n"
                "WARC-Date: 2024-01-01T00:00:00Z\r\n"
                "WARC-Record-ID: <urn:doc:2>\r\n"
                f"Content-Length: {clen}\r\n"
                "\r\n" + payload)

    df = spark.createDataFrame(
        [(1, rec(nbytes)), (2, rec(len(payload)))],
        "doc_id long, record string")
    rows = {r.doc_id: r for r in parse_warc_records(df).collect()}
    assert bool(rows[1].payload_ok) is True
    assert bool(rows[2].payload_ok) is False
    assert rows[1].payload == payload
