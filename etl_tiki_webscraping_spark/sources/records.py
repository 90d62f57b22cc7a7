"""Record-materialization sources (SURVEY.md §2.1 S5-S6, §2.6 F4-F6).

The reference turns scraped JSON into tables with
``pd.DataFrame.from_dict`` (/root/reference/dags/etl.py:60,97,142) and
flattens the category sitemap's nested ``result.data[].child[]`` into a
dict of category -> [sub_categories] (:31-39).

Spark restatement: explicit-schema ``createDataFrame`` (no dtype
inference — deterministic, SURVEY §1.3) and an ``explode`` +
struct-field-access flatten that keeps the relational 2-column form
instead of a driver-side dict.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_tiki_webscraping_spark.schemas import SITEMAP_CATEGORY


def records_to_df(spark: SparkSession, records: Sequence[dict], schema: T.StructType | str) -> DataFrame:
    """list-of-dicts -> typed DataFrame (S6) with a declared schema."""
    return spark.createDataFrame(records, schema=schema)


def json_records_to_df(df: DataFrame, json_col: str, schema: T.StructType | str) -> DataFrame:
    """Parse a string column of JSON docs into typed struct fields (F4),
    replacing the payload column with its parsed fields.
    """
    parsed = df.withColumn("__parsed", F.from_json(F.col(json_col), schema))
    return parsed.select(*[c for c in df.columns if c != json_col], "__parsed.*")


def sitemap_to_pairs(spark: SparkSession, sitemap_records: Sequence[dict]) -> DataFrame:
    """Flatten the category sitemap (S1 payload shape) to
    (category, sub_category) pairs — the relational form of the
    reference's ``sub_category_dict`` (dags/etl.py:32-39, F5/F6).

    Categories with no children are dropped, matching the reference
    (its inner loop body never runs for an empty ``child`` list).
    """
    cats = spark.createDataFrame(sitemap_records, schema=T.ArrayType(SITEMAP_CATEGORY).elementType)
    return (
        cats.select(
            F.col("url_key").alias("category"),
            F.explode("child").alias("c"),
        )
        .select("category", F.col("c.url_key").alias("sub_category"))
    )


def jdbc_read(spark: SparkSession, url: str, query: str, properties: dict[str, str] | None = None) -> DataFrame:
    """Warehouse read-back (S5): the reference's
    ``pd.read_sql("SELECT shop_id FROM shop_info", conn)``
    (dags/etl.py:247-249).  Uses the query pushdown form so the
    database, not Spark, evaluates the projection.
    """
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
