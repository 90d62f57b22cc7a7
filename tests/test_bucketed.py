"""Bucketed-table joins must be exchange-free: the write-time shuffle
replaces the query-time shuffle."""

from __future__ import annotations

import pytest

from etl_tiki_webscraping_spark.sinks.bucketed import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    facts = spark.range(10_000).selectExpr("id % 500 as k", "id as fact_val")
    dims = spark.range(500).selectExpr("id as k", "id * 10 as dim_val")
    write_bucketed(facts, "bkt_facts", 8, ["k"], sort_cols=["k"])
    write_bucketed(dims, "bkt_dims", 8, ["k"], sort_cols=["k"])
    try:
        joined = spark.table("bkt_facts").join(spark.table("bkt_dims"), on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: no query-time shuffle
        assert joined.count() == 10_000
        # same join on the UNbucketed frames shuffles both sides
        plain = facts.join(dims, on="k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_facts")
        spark.sql("DROP TABLE IF EXISTS bkt_dims")
