"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``etl_tiki_webscraping_spark``; this module
only adapts the engine's query catalog to the driver interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_tiki_webscraping_spark.plans.catalog import QUERIES

    return QUERIES["flagship"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 and the
    extension surface (dedup / similarity / text / streaming twins)."""
    from etl_tiki_webscraping_spark.plans.catalog import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query; keys without an
    oracle (hash-based / approximate ops) get rows-only checks."""
    from etl_tiki_webscraping_spark.plans.catalog import get_oracles

    return get_oracles()
