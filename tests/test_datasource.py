"""Custom PySpark DataSource (paginated_http): key-partitioned scans
with pagination-until-empty inside each partition read."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    from etl_tiki_webscraping_spark.sources.datasource import PaginatedHttpDataSource

    spark.dataSource.register(PaginatedHttpDataSource)


def _read(spark, keys):
    return (
        spark.read.format("paginated_http")
        .schema("item_id bigint, k bigint")
        .option("keys", json.dumps(keys))
        .option(
            "fetcher",
            "etl_tiki_webscraping_spark.sources.datasource:synthetic_fetch_page",
        )
        .load()
    )


def test_reads_all_pages_for_every_key(spark):
    keys = [{"k": i} for i in range(7)]
    rows = _read(spark, keys).collect()
    # key i yields 3i+5 items
    assert len(rows) == sum(3 * i + 5 for i in range(7))
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], set()).add(r["item_id"])
    for i in range(7):  # every key fully covered — no tail loss by construction
        assert by_key[i] == set(range(3 * i + 5))


def test_one_partition_per_key(spark):
    df = _read(spark, [{"k": 1}, {"k": 2}, {"k": 3}])
    assert df.rdd.getNumPartitions() == 3


def test_empty_keys(spark):
    assert _read(spark, []).count() == 0
