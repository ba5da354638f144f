from __future__ import annotations

import pytest

from pipelines_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pipelines_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_small():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_medium():
    return "/root/testdata/sf0.01"
