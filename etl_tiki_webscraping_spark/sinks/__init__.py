from etl_tiki_webscraping_spark.sinks.upsert import (
    upsert_dataframes,
    upsert_parquet,
    merge_sql,
)
from etl_tiki_webscraping_spark.sinks.staging import (
    write_staging,
    jdbc_staged_upsert,
)

__all__ = [
    "upsert_dataframes",
    "upsert_parquet",
    "merge_sql",
    "write_staging",
    "jdbc_staged_upsert",
]
