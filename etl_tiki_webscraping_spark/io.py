"""Parquet loaders for the driver-generated test tables (TESTDATA.md).

Thin by design: ``spark.read.parquet`` already gives vectorized scans,
column pruning and predicate pushdown; wrapping it any further would
only hide the plan from Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from etl_tiki_webscraping_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown test table {name!r}; expected one of {TESTDATA_TABLES}")
    if name == "events":
        # events.ts encoding has varied across testdata generations:
        # TIMESTAMP(NANOS) (Spark rejects by default -> read nanos as
        # long, floor-convert to micros, matching DuckDB's ns->us
        # truncation) and TIMESTAMP(MICROS) without UTC adjustment
        # (Spark reads as TIMESTAMP_NTZ, which rejects bigint casts and
        # some time arithmetic downstream).  Normalize both to
        # TimestampType; session tz is pinned UTC so NTZ->LTZ is the
        # identity on the underlying micros value.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables (all by default) as temp views so
    ``spark.sql`` is a first-class query surface — the engine ships no
    parser of its own because Spark SQL IS its SQL surface (SURVEY.md
    §7 non-goals)."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
