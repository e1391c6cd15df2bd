"""Replicates the driver's Spark-vs-DuckDB check (SURVEY §5.2 item 3)."""

from __future__ import annotations

import pytest

from compare_util import compare, duck_con

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


def query_names():
    from ehr_relation_extraction_spark import driver_queries as dq

    return sorted(dq.QUERIES)


@pytest.mark.parametrize("name", query_names())
def test_oracle_parity(spark, con, name):
    from ehr_relation_extraction_spark import driver_queries as dq

    sdf = dq.QUERIES[name](spark, SF_DIR)
    oracle = dq.oracle_sql().get(name)
    if oracle is None:
        # sanctioned rows-only category (iterative algorithms)
        assert sdf.count() >= 0
        return
    ok, msg = compare(sdf, con.sql(oracle).df())
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.queries()) == set(mod.oracle_sql()) | (
        set(mod.queries()) - set(mod.oracle_sql()))
