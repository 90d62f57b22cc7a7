from etl_tiki_webscraping_spark.sinks.upsert import (
    apply_changes,
    apply_changes_parquet,
    build_bloom_index,
    compact_table,
    delete_where,
    merge_sql,
    read_change_feed,
    read_parquet_table,
    scd2_apply,
    table_history,
    upsert_dataframes,
    upsert_parquet,
)
from etl_tiki_webscraping_spark.sinks.staging import (
    write_staging,
    jdbc_staged_upsert,
    upsert_on_conflict_sql,
    upsert_on_duplicate_key_sql,
)

__all__ = [
    "apply_changes",
    "apply_changes_parquet",
    "build_bloom_index",
    "compact_table",
    "delete_where",
    "merge_sql",
    "read_change_feed",
    "read_parquet_table",
    "scd2_apply",
    "table_history",
    "upsert_dataframes",
    "upsert_parquet",
    "write_staging",
    "jdbc_staged_upsert",
    "upsert_on_conflict_sql",
    "upsert_on_duplicate_key_sql",
]
