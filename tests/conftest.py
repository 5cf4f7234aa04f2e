from __future__ import annotations

import pytest

from mbta_etl_spark.session import get_spark

SF_DIR_SMALL = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("mbta_etl_spark-tests")
    yield spark
    spark.stop()
