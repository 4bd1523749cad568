"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os

import pytest

from dataextractor_spark.session import get_session

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="dataextractor-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
    )
    yield s
