from __future__ import annotations

import pytest

from airflow_kafka_spark_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="aks-tests", shuffle_partitions=8)
    yield s
    s.stop()
