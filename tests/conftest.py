"""Shared pytest fixtures: one small local SparkSession for the whole
run (local[4] — worker-startup cost dominates tiny unit tests, not
compute), plus the driver-generated parquet fixture dirs."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from etl_tiki_webscraping_spark.session import get_spark

    s = get_spark("unit-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


@pytest.fixture()
def tmp_parquet_dir(tmp_path):
    return str(tmp_path / "table")
