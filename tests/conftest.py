"""Shared pytest fixtures: one session-scoped SparkSession (local mode)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrapy_cluster_test_spark.session import get_spark

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sct-spark-tests", cores=int(os.environ.get("SPARK_TEST_CPUS", "8")))
    yield s
