from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from roar_spark.session import get_spark

    spark = get_spark(
        app_name="roar_spark_tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/roar_spark_test_warehouse"},
    )
    yield spark
