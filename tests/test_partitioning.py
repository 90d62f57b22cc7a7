"""Partitioned table writes must enable partition pruning at read time
(the 100 TB requirement: a filtered query touches only its partitions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.sinks.upsert import read_parquet_table, upsert_parquet


def test_partitioned_upsert_prunes_at_read(spark, tmp_path):
    target = str(tmp_path / "events_by_type")
    df = spark.createDataFrame(
        [(i, ["click", "view", "error"][i % 3], float(i)) for i in range(300)],
        "event_id long, event_type string, value double",
    )
    upsert_parquet(spark, df, target, keys=["event_id"], partition_by=["event_type"])

    read = read_parquet_table(spark, target).filter(F.col("event_type") == "click")
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must be IN PartitionFilters (pruned), not a data filter
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "event_type" in pf
    assert read.count() == 100

    # upsert into one partition leaves the layout partition-pruned
    updates = spark.createDataFrame([(0, "click", 999.0)], "event_id long, event_type string, value double")
    upsert_parquet(spark, updates, target, keys=["event_id"], partition_by=["event_type"])
    out = read_parquet_table(spark, target)
    assert out.count() == 300
    assert out.filter("event_id = 0").collect()[0]["value"] == 999.0
