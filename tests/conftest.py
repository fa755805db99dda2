from __future__ import annotations

import os

import pytest

from air_quality_etl_pipeline_spark.session import get_spark

#: override to re-run the whole suite against another scale factor
#: (e.g. SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest)
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        shuffle_partitions=8,
        extra_conf={
            # keep the metastore + managed tables out of the repo tree
            "spark.sql.warehouse.dir": "/tmp/spark_graft_warehouse",
            "spark.driver.extraJavaOptions": "-Dderby.system.home=/tmp/spark_graft_derby",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
