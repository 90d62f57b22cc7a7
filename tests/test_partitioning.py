"""Partitioned table writes must enable partition pruning at read time
(the 100 TB requirement: a filtered query touches only its partitions)
AND partition-pruned upserts at write time (a 1 GB batch against a
100 TB table must not rewrite 100 TB)."""

from __future__ import annotations

import json
import os

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


def _pool_files(snap_dir: str, rel: str) -> dict[str, tuple[int, float]]:
    """{parquet path: (size, mtime)} of the pool dir a snapshot's
    partition entry resolves to."""
    real = os.path.realpath(os.path.join(snap_dir, rel))
    return {
        os.path.join(r, f): (os.path.getsize(os.path.join(r, f)), os.path.getmtime(os.path.join(r, f)))
        for r, _, fs in os.walk(real)
        for f in fs
        if f.endswith(".parquet")
    }


def test_partitioned_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """The 100 TB write-amplification guarantee: an upsert batch that
    touches one partition leaves every other partition's data files
    untouched — carried into the new snapshot by reference."""
    target = str(tmp_path / "events")
    df = spark.createDataFrame(
        [(i, ["click", "view", "error"][i % 3], float(i)) for i in range(300)],
        "event_id long, event_type string, value double",
    )
    upsert_parquet(spark, df, target, keys=["event_id"], partition_by=["event_type"])
    v1 = os.path.join(target, "v00000001")
    untouched_before = {
        p: _pool_files(v1, p) for p in ("event_type=view", "event_type=error")
    }

    updates = spark.createDataFrame(
        [(0, "click", 999.0), (301, "click", 1.0)],
        "event_id long, event_type string, value double",
    )
    upsert_parquet(spark, updates, target, keys=["event_id"], partition_by=["event_type"])
    v2 = os.path.join(target, "v00000002")

    # untouched partitions: same resolved pool dirs, byte-identical files
    for p, before in untouched_before.items():
        assert os.path.realpath(os.path.join(v2, p)) == os.path.realpath(
            os.path.join(v1, p)
        )
        assert _pool_files(v2, p) == before
    # the new pool version holds ONLY the touched partition
    pool2 = [
        e
        for e in os.listdir(os.path.join(target, "data", "00000002"))
        if not e.startswith((".", "_"))
    ]
    assert pool2 == ["event_type=click"]

    # the manifest is the object-store-authoritative commit metadata
    with open(os.path.join(target, "v00000002.json")) as fh:
        manifest = json.load(fh)
    assert manifest["partitions"]["event_type=view"].startswith("data/00000001")
    assert manifest["partitions"]["event_type=click"].startswith("data/00000002")

    out = read_parquet_table(spark, target)
    assert out.count() == 301
    assert out.filter("event_id = 0").collect()[0]["value"] == 999.0
    assert out.filter("event_id = 100").collect()[0]["value"] == 100.0  # untouched partition intact

    # time travel across referenced snapshots
    old = read_parquet_table(spark, target, version=1)
    assert old.count() == 300
    assert old.filter("event_id = 0").collect()[0]["value"] == 0.0


def test_partitioned_upsert_new_partition_and_multilevel(spark, tmp_path):
    target = str(tmp_path / "by_type_day")
    df = spark.createDataFrame(
        [(1, "click", 1, 1.0), (2, "view", 1, 2.0)],
        "event_id long, event_type string, day int, value double",
    )
    upsert_parquet(spark, df, target, keys=["event_id"], partition_by=["event_type", "day"])
    updates = spark.createDataFrame(
        [(3, "scroll", 2, 3.0), (1, "click", 1, 9.0)],
        "event_id long, event_type string, day int, value double",
    )
    upsert_parquet(spark, updates, target, keys=["event_id"], partition_by=["event_type", "day"])
    out = read_parquet_table(spark, target)
    rows = {r["event_id"]: (r["event_type"], r["day"], r["value"]) for r in out.collect()}
    assert rows == {1: ("click", 1, 9.0), 2: ("view", 1, 2.0), 3: ("scroll", 2, 3.0)}
    # untouched (view, 1) leaf carried forward by reference
    assert os.path.realpath(
        os.path.join(target, "v00000002", "event_type=view", "day=1")
    ) == os.path.realpath(os.path.join(target, "v00000001", "event_type=view", "day=1"))


def test_partitioned_upsert_prunes_pool_dirs_past_retention(spark, tmp_path):
    """Pool dirs are reclaimed only when no retained snapshot references
    them; referenced ones survive arbitrary numbers of commits."""
    target = str(tmp_path / "retained")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, part string, v double"
    )
    upsert_parquet(spark, base, target, keys=["id"], partition_by=["part"], keep_snapshots=2)
    for i in range(3, 7):
        batch = spark.createDataFrame([(i, "a", float(i))], "id long, part string, v double")
        upsert_parquet(spark, batch, target, keys=["id"], partition_by=["part"], keep_snapshots=2)
    # partition b was never touched again: its v1 pool dir must survive
    assert os.path.isdir(os.path.join(target, "data", "00000001", "part=b"))
    out = read_parquet_table(spark, target)
    assert out.filter("part = 'b'").count() == 1
    assert out.count() == 6
    # snapshots outside the retention window are gone
    assert not os.path.exists(os.path.join(target, "v00000001"))
    assert not os.path.exists(os.path.join(target, "v00000001.json"))
