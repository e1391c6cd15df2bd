from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from ehr_relation_extraction_spark.session import get_spark

    wh = str(tmp_path_factory.mktemp("spark-warehouse"))
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4,
                  extra_conf={"spark.sql.warehouse.dir": wh})
    yield s
    s.stop()
