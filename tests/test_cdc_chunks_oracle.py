"""Cross-engine parity + serial ground truth for continuation
batch 178 (operators/dedup.cdc_chunks)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"

W, B, M, D = 8, 31, 1 << 20, 64


def _chunks(text: str) -> list[str]:
    """Serial reference: chunk boundaries wherever the rolling
    polynomial hash of the trailing W chars is 0 mod D."""
    bnd = []
    for i in range(W, len(text) + 1):          # 1-based end position
        h = sum(ord(text[i - 1 - k]) * B ** k for k in range(W))
        if (h % M) % D == 0:
            bnd.append(i)
    starts = [1] + [b + 1 for b in bnd]
    ends = bnd + [len(text)]
    return [text[s - 1:e] for s, e in zip(starts, ends) if e >= s]


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["cdc_chunks"](spark, SF),
                      con.sql(ORACLE["cdc_chunks"]).df())
    assert ok, msg


def test_matches_serial_chunker(spark):
    """The Spark histogram equals the one computed by a plain-Python
    chunker over the same texts (chunk boundaries AND multiplicity
    census), on real corpus rows."""
    import duckdb
    from collections import Counter

    from ehr_relation_extraction_spark.operators.dedup import cdc_chunks

    texts = [r[0] for r in duckdb.sql(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id LIMIT 60").fetchall()]
    per_chunk = Counter()
    for t in texts:
        for c in _chunks(t):
            per_chunk[c] += 1
    hist = Counter()
    nbytes = Counter()
    for chunk, mult in per_chunk.items():
        hist[mult] += 1
        nbytes[mult] += len(chunk)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.multiplicity: (r.n_chunks, r.n_bytes)
           for r in cdc_chunks(docs).collect()}
    assert got == {m: (hist[m], nbytes[m]) for m in hist}


def test_insertion_shifts_one_chunk(spark):
    """The CDC property: inserting text near the front of a doc only
    changes chunks up to the first boundary at/after the edit — the
    chunks after it are byte-identical (fixed-size blocking would
    shift every block)."""
    from ehr_relation_extraction_spark.operators.dedup import cdc_chunks

    import duckdb
    base = duckdb.sql(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id LIMIT 1").fetchone()[0]
    edited = "zz " + base
    c1, c2 = _chunks(base), _chunks(edited)
    if len(c1) > 1:
        # all chunks after the first boundary survive the edit
        assert c1[1:] == c2[len(c2) - len(c1) + 1:]
    # and the Spark operator agrees with the serial chunker's census
    docs = spark.createDataFrame([(0, base), (1, edited)],
                                 "doc_id long, text string")
    from collections import Counter
    per_chunk = Counter(c1) + Counter(c2)
    hist, nbytes = Counter(), Counter()
    for chunk, mult in per_chunk.items():
        hist[mult] += 1
        nbytes[mult] += len(chunk)
    got = {r.multiplicity: (r.n_chunks, r.n_bytes)
           for r in cdc_chunks(docs).collect()}
    assert got == {m: (hist[m], nbytes[m]) for m in hist}
