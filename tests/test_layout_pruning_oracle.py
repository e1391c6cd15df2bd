"""Cross-engine parity + serial ground truth for continuation
batch 91 (plans/layout.layout_pruning_audit)."""

from __future__ import annotations

import hashlib

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

    ok, msg = compare(QUERIES["layout_pruning"](spark, SF),
                      con.sql(ORACLE["layout_pruning"]).df())
    assert ok, msg


def _serial(rows, n_files=16, q_d=17, q_b=42):
    files = {}
    for d, b in rows:
        z = 0
        for i in range(8):
            z += ((d >> i) & 1) << (2 * i)
            z += ((b >> i) & 1) << (2 * i + 1)
        for layout, fid in (("zorder", z * n_files // 65536),
                            ("linear", (d * 256 + b) * n_files
                             // 65536)):
            st = files.setdefault((layout, fid),
                                  [0, 256, -1, 256, -1])
            st[0] += 1
            st[1] = min(st[1], d)
            st[2] = max(st[2], d)
            st[3] = min(st[3], b)
            st[4] = max(st[4], b)
    out = {}
    for (layout, _), (n, mnd, mxd, mnb, mxb) in files.items():
        s = out.setdefault(layout, [0, 0, 0, 0, 0, 0])
        s[0] += 1
        s[1] += n
        if mnd <= q_d <= mxd:
            s[2] += 1
            s[3] += n
        if mnb <= q_b <= mxb:
            s[4] += 1
            s[5] += n
    return out


def test_audit_matches_serial_and_zorder_prunes_both_dims(spark):
    """Full-coverage fixture (every d, spread b): the audit equals a
    serial replica, linear prunes d perfectly and b not at all, and
    Z-order prunes BOTH dimensions to <= n_files/2 — the write-layout
    decision the operator exists to print."""
    from ehr_relation_extraction_spark.plans.layout import (
        layout_pruning_audit)

    rows = []
    for i in range(1024):
        d = i % 256
        host = "h%d.example.com" % (i % 37)
        b = int(hashlib.md5(host.encode()).hexdigest()[:2], 16)
        rows.append((d, b, i, "https://%s/%d" % (host, i)))
    df = spark.createDataFrame(
        [(doc, url) for _, _, doc, url in rows], ["doc_id", "url"])
    want = _serial([(d, b) for d, b, _, _ in rows])
    got = {r.layout: [r.n_files, r.n_rows, r.hit_files_d,
                      r.hit_rows_d, r.hit_files_b, r.hit_rows_b]
           for r in layout_pruning_audit(df).collect()}
    assert got == want

    lin, zo = got["linear"], got["zorder"]
    assert lin[2] == 1                      # d-query: 1 linear file
    assert lin[4] == lin[0]                 # b-query: ALL linear files
    assert zo[2] <= zo[0] // 2              # z prunes d
    assert zo[4] <= zo[0] // 2              # z prunes b too
