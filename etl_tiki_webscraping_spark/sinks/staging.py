"""Staging-table write path (SURVEY.md §2.9 W1/W3 + JDBC variant of W2a).

The reference stages every load into ``temp_*`` tables with chunked
multi-row INSERTs (``to_sql(..., if_exists="replace", chunksize=1000,
method="multi")`` — /root/reference/dags/etl.py:173-180,210-217,252-259),
merges via SQL, then drops the staging table (:202,245,280).

Spark-side: ``df.write.jdbc(mode="overwrite", batchsize=...)`` is the
1:1 mapping; the merge SQL is issued from the driver over one JDBC
connection.  No JDBC database exists in this test environment, so the
network write is parameterized by an injected executor for unit tests;
the code path is the production shape.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

from etl_tiki_webscraping_spark.sinks.upsert import merge_sql

DEFAULT_BATCH_SIZE = 1000  # reference's chunksize=1000 (dags/etl.py:178)


def write_staging(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> None:
    """Overwrite-write a DataFrame to a JDBC staging table (W1).

    Executors write partitions in parallel with multi-row batches —
    the distributed form of the reference's single-process chunked
    ``to_sql``.
    """
    props = dict(properties or {})
    props.setdefault("batchsize", str(batch_size))
    df.write.jdbc(url=url, table=table, mode="overwrite", properties=props)


def upsert_on_duplicate_key_sql(target: str, staging: str, keys: Sequence[str], columns: Sequence[str]) -> str:
    """MySQL-dialect merge exactly as the reference generates it
    (dags/etl.py:181-199): INSERT..SELECT..ON DUPLICATE KEY UPDATE with
    every non-key column updated via VALUES().
    """
    keys = list(keys)
    non_keys = [c for c in columns if c not in keys]
    col_list = ", ".join(columns)
    update_clause = ", ".join(f"{c}=VALUES({c})" for c in non_keys)
    return (
        f"INSERT INTO {target} ({col_list}) "
        f"SELECT {col_list} FROM {staging} "
        f"ON DUPLICATE KEY UPDATE {update_clause}"
    )


def upsert_on_conflict_sql(target: str, staging: str, keys: Sequence[str], columns: Sequence[str]) -> str:
    """Standard (SQLite/PostgreSQL/DuckDB) upsert:
    ``INSERT .. SELECT .. ON CONFLICT (keys) DO UPDATE SET c=excluded.c``
    — same semantics as the reference's MySQL statement, in the
    SQL-standard conflict-clause dialect.  (``WHERE true`` disambiguates
    the SELECT from the conflict clause for SQLite's parser.)
    """
    keys = list(keys)
    non_keys = [c for c in columns if c not in keys]
    col_list = ", ".join(columns)
    key_list = ", ".join(keys)
    update_clause = ", ".join(f"{c}=excluded.{c}" for c in non_keys)
    return (
        f"INSERT INTO {target} ({col_list}) "
        f"SELECT {col_list} FROM {staging} WHERE true "
        f"ON CONFLICT ({key_list}) DO UPDATE SET {update_clause}"
    )


def jdbc_staged_upsert(
    df: DataFrame,
    target: str,
    keys: Sequence[str],
    url: str,
    sql_executor: Callable[[str], None],
    properties: dict[str, str] | None = None,
    dialect: str = "mysql",
    staging_table: str | None = None,
) -> None:
    """Full W1+W2a+W3 sequence: stage -> merge -> drop staging.

    ``sql_executor`` runs driver-side SQL over the warehouse connection
    (injected so tests can use an in-memory database and production can
    pass a real DB-API cursor).  ``dialect`` picks the merge statement:
    'mysql' reproduces the reference byte-for-byte in structure;
    'standard' emits INSERT..ON CONFLICT DO UPDATE
    (SQLite/PostgreSQL/DuckDB); 'ansi' emits MERGE INTO for warehouses
    that support it.
    """
    staging = staging_table or f"temp_{target}"
    write_staging(df, url, staging, properties)
    if dialect == "mysql":
        stmt = upsert_on_duplicate_key_sql(target, staging, keys, df.columns)
    elif dialect == "standard":
        stmt = upsert_on_conflict_sql(target, staging, keys, df.columns)
    else:
        stmt = merge_sql(target, staging, keys, df.columns)
    sql_executor(stmt)
    sql_executor(f"DROP TABLE IF EXISTS {staging}")
