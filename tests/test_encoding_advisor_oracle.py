"""Cross-engine parity + serial ground truth for continuation
batch 134 (functions/textstats.encoding_advisor)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["encoding_advisor"](spark, SF),
                      con.sql(ORACLE["encoding_advisor"]).df())
    assert ok, msg


def test_matches_serial_byte_accounting(spark):
    """Multibyte text (UTF-8 bytes != chars), a 2-value categorical,
    and a unique-per-row column: byte sums, dictionary sizes and the
    sign of the savings must match a serial replay."""
    from ehr_relation_extraction_spark.functions.textstats import (
        encoding_advisor)

    # lang-column values deliberately LONG: dictionary encoding only
    # wins when value bytes exceed the 4-byte code (the driver corpus
    # shows the honest negative for 2-byte lang codes)
    rows = [(i, "héllo wörld 中文" if i % 2 == 0 else "plain",
             "english-language" if i % 2 == 0 else "chinese-language",
             f"host{i}")
            for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang",
                                      "source"])
    got = {r.col_name: (r.n_rows, r.n_distinct, r.raw_bytes,
                        r.dict_bytes, r.savings_micro6)
           for r in encoding_advisor(df).collect()}

    for col, idx in (("text", 1), ("lang", 2), ("source", 3)):
        vals = [r[idx] for r in rows]
        raw = sum(len(v.encode("utf-8")) for v in vals)
        dvals = sum(len(v.encode("utf-8")) for v in set(vals))
        dict_b = dvals + 4 * len(vals)
        sav = (1000000 * (raw - dict_b)) // raw if raw - dict_b >= 0 \
            else -((1000000 * (dict_b - raw)) // raw)
        assert got[col] == (len(vals), len(set(vals)), raw, dict_b,
                            sav)
    # 2-value columns compress, unique-per-row columns do not
    assert got["lang"][4] > 0 > got["source"][4]
