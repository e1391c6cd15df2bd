"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end KG query (pages ->
extract_text -> shards/mentions -> pair join -> rule RE -> triples) on
sf0.001.  ``queries()``/``oracle_sql()`` expose each operator from
SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ehr_relation_extraction_spark.driver_queries import QUERIES
from ehr_relation_extraction_spark.driver_queries import oracle_sql as _oracle_sql


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the deduplicated (subj, pred, obj) triple table."""
    return QUERIES["triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()
