from etl_tiki_webscraping_spark.sinks.upsert import (
    read_parquet_table,
    scd2_apply,
    upsert_dataframes,
    upsert_parquet,
    merge_sql,
)
from etl_tiki_webscraping_spark.sinks.staging import (
    write_staging,
    jdbc_staged_upsert,
    upsert_on_conflict_sql,
    upsert_on_duplicate_key_sql,
)

__all__ = [
    "read_parquet_table",
    "scd2_apply",
    "upsert_dataframes",
    "upsert_parquet",
    "merge_sql",
    "write_staging",
    "jdbc_staged_upsert",
    "upsert_on_conflict_sql",
    "upsert_on_duplicate_key_sql",
]
