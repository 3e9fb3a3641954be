from __future__ import annotations

import pytest

from lawlm_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lawlm-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs(spark):
    from lawlm_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="session")
def events(spark):
    from lawlm_spark.sources.testdata import load_table

    return load_table(spark, SF_DIR, "events")
