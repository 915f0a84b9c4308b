from __future__ import annotations

import pytest

from biodiversity_data_ingestion_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
SMOKE_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bdi-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_prop():
    # few-partition session for hypothesis property tests (many tiny jobs)
    s = get_spark(app_name="bdi-props", shuffle_partitions=2)
    yield s

