"""Cross-engine parity + serial ground truth for continuation
batch 210 (functions/textstats.eb_shrinkage)."""

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

    ok, msg = compare(QUERIES["eb_shrinkage"](spark, SF),
                      con.sql(ORACLE["eb_shrinkage"]).df())
    assert ok, msg


def _docs(spark, host_specs):
    """host_specs: dict host -> (n_pass, n_fail)."""
    rows, did = [], 0
    for h, (np_, nf) in host_specs.items():
        for _ in range(np_):
            rows.append((did, "x" * 250, "en", h, 250)); did += 1
        for _ in range(nf):
            rows.append((did, "y" * 50, "en", h, 50)); did += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")


def test_small_host_shrinks_more(spark):
    """Hosts with MODEST spread (so tau > 0): a 2-doc 100% host
    must shrink toward the prior strictly more than a 40-doc 100%
    host — the whole point of the correction."""
    from ehr_relation_extraction_spark.functions.textstats import (
        eb_shrinkage)

    out = {r.source: r for r in eb_shrinkage(_docs(spark, {
        "tiny": (2, 0), "big": (40, 0),
        "mid": (8, 2), "low": (15, 5)})).collect()}
    assert out["tiny"].rate_micro6 == out["big"].rate_micro6 \
        == 1000000
    assert out["tiny"].tau > 0
    assert out["tiny"].shrunk_micro6 < out["big"].shrunk_micro6
    assert out["big"].shrunk_micro6 < 1000000


def test_wide_spread_means_no_shrinkage(spark):
    """Hosts that genuinely disagree (huge between-host variance):
    tau floors to 0 and every rate passes through unshrunk."""
    from ehr_relation_extraction_spark.functions.textstats import (
        eb_shrinkage)

    out = eb_shrinkage(_docs(spark, {
        "a": (2, 0), "b": (40, 0), "c": (10, 10),
        "d": (2, 18)})).collect()
    assert all(r.tau == 0 for r in out)
    assert all(r.shrunk_micro6 == r.rate_micro6 for r in out)


def test_formula_replica_from_reported_fields(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        eb_shrinkage)

    for r in eb_shrinkage(_docs(spark, {
            "a": (5, 3), "b": (9, 1), "c": (1, 7),
            "d": (12, 12)})).collect():
        pp = (r.tau * r.m_u) // 1000000
        assert r.shrunk_micro6 == (1000000 * (r.n_keep + pp)
                                   // (r.n_docs + r.tau))


def test_identical_hosts_take_cap(spark):
    """All hosts at the same rate: v_u = 0 -> tau capped at 1e5 and
    every shrunk rate lands on the shared prior."""
    from ehr_relation_extraction_spark.functions.textstats import (
        eb_shrinkage)

    out = eb_shrinkage(_docs(spark, {
        "a": (3, 1), "b": (6, 2), "c": (9, 3)})).collect()
    assert all(r.tau == 100000 for r in out)
    vals = {r.shrunk_micro6 for r in out}
    assert max(vals) - min(vals) <= 2


def test_partition_invariance(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        eb_shrinkage)

    d = _docs(spark, {"a": (5, 2), "b": (1, 8), "c": (7, 7)})
    one = eb_shrinkage(d.coalesce(1)).collect()
    many = eb_shrinkage(d.repartition(7)).collect()
    assert sorted(one) == sorted(many)
