"""Incremental rollup maintenance: merge(rollup(A), rollup(B)) must
equal rollup(A ∪ B) for additive metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.operators.rollup import (
    hourly_event_rollup,
    merge_additive,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value"
    )


def test_merge_additive_equals_one_shot(spark):
    a = _events(spark, [
        (1, "2024-01-01 10:05:00", "click", 1.5),
        (2, "2024-01-01 10:40:00", "click", 2.5),
        (3, "2024-01-01 11:05:00", "view", 1.0),
    ])
    b = _events(spark, [
        (4, "2024-01-01 10:59:00", "click", 4.0),
        (5, "2024-01-01 12:00:00", "error", 0.5),
    ])
    merged = merge_additive(
        hourly_event_rollup(a), hourly_event_rollup(b),
        keys=["bucket_ts", "event_type"], add_cols=["n_events", "sum_value"],
    )
    oneshot = hourly_event_rollup(a.unionByName(b))
    m = {(str(r["bucket_ts"]), r["event_type"]): (r["n_events"], float(r["sum_value"]))
         for r in merged.collect()}
    o = {(str(r["bucket_ts"]), r["event_type"]): (r["n_events"], float(r["sum_value"]))
         for r in oneshot.collect()}
    assert m == o
    assert m[("2024-01-01 10:00:00", "click")] == (3, 8.0)  # both batches contribute
    assert m[("2024-01-01 12:00:00", "error")] == (1, 0.5)  # update-only key inserted


def test_merge_additive_min_max_combiners(spark):
    target = spark.createDataFrame(
        [("k1", 5, 2, 9), ("k2", 1, 0, 3)],
        "k string, n long, lo long, hi long",
    )
    updates = spark.createDataFrame(
        [("k1", 2, 1, 12), ("k3", 7, 4, 4)],
        "k string, n long, lo long, hi long",
    )
    out = {
        r["k"]: (r["n"], r["lo"], r["hi"])
        for r in merge_additive(
            target, updates, keys=["k"], add_cols=["n"], min_cols=["lo"], max_cols=["hi"]
        ).collect()
    }
    assert out == {
        "k1": (7, 1, 12),  # sum / min / max combined
        "k2": (1, 0, 3),   # target-only passthrough
        "k3": (7, 4, 4),   # update-only insert
    }
