from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("consensource-sds-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


def rows_set(df):
    """Order-insensitive row multiset for equality asserts."""
    return sorted(tuple(r) for r in df.collect())


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-horizon soak tests (minutes); deselect with -m 'not slow'",
    )
