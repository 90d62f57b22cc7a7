"""SparkSession factory with scale-oriented defaults.

Tests and the driver run on ``local[*]`` (single JVM), but every config
here is chosen to also be the right default on a 1000-executor cluster:

- AQE on (runtime re-plan: coalesce small shuffle partitions, convert
  sort-merge joins to broadcast when the build side turns out small,
  split skewed partitions).
- Arrow on (vectorized Python <-> JVM transfer for the few places we
  drop to pandas UDFs).
- shuffle partitions sized for the test machine; on a real cluster AQE
  coalescing makes the static number mostly irrelevant as long as it is
  not too small.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "etl-tiki-webscraping-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = int(DEFAULT_CPUS)
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # generous broadcast threshold: our dimension tables (region,
        # nation, customer, supplier, part) are tiny relative to facts
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # local mode runs executors inside the driver JVM, so eager
        # localCheckpoint materializations (graph edge lists at the
        # sf10 probe scale) are accounted as "serialized task results"
        # and trip the 1g default; on a real cluster those blocks live
        # on executors and this limit is irrelevant to them
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        # stage-progress bars flood stderr; the driver records only a
        # fixed-size output tail, and bars crowd out the bench JSON line
        .config("spark.ui.showConsoleProgress", "false")
        # managed-table location for bucketed tables (local mode: keep
        # out of the repo; on a cluster this is the real warehouse path)
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # testdata events.parquet carries TIMESTAMP(NANOS); read as long
        # (converted to timestamps in io.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
