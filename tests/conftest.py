from __future__ import annotations

import os

import pytest

from asr_training_data_pipeline_spark.session import get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="asr_pipeline_tests",
        cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")),
        driver_memory=os.environ.get("SPARK_GRAFT_TEST_MEM", "8g"),
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
