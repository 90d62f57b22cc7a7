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


def scd2_apply(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    effective_ts_col: str = "effective_ts",
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge (CDC history tracking) as
    pure DataFrame ops — the Delta-less emulation of
    ``MERGE INTO ... WHEN MATCHED AND <changed> THEN close+insert``.

    ``target`` carries (keys, attrs, valid_from, valid_to, is_current);
    ``updates`` carries (keys, attrs, effective_ts).  For each update
    whose attributes differ (null-safe) from the key's current row —
    or whose key is new — the current row is closed
    (valid_to = effective_ts, is_current = false) and a new current
    version is inserted.  Unchanged updates are no-ops, so replaying
    the same feed is idempotent.

    Plan shape: one join of current-rows vs updates on the key plus
    two anti/semi legs Catalyst derives from it — the same single
    shuffle a Delta MERGE performs; history rows pass through
    untouched (no rewrite amplification).
    """
    keys = list(keys)
    attrs = list(compare_cols) if compare_cols is not None else [
        c for c in updates.columns if c not in keys and c != effective_ts_col
    ]
    meta = ["valid_from", "valid_to", "is_current"]
    out_cols = keys + attrs + meta

    hist = target.filter(~F.col("is_current")).select(*out_cols)
    cur = target.filter(F.col("is_current")).select(*out_cols)

    u = updates.select(*keys, *attrs, F.col(effective_ts_col).alias("__eff"))
    t = cur.select(*keys, *[F.col(c).alias(f"__t_{c}") for c in attrs], "valid_from")
    j = u.join(t, on=keys, how="left")
    same = F.lit(True)
    for c in attrs:
        same = same & F.col(c).eqNullSafe(F.col(f"__t_{c}"))
    changed = j.filter(F.col("valid_from").isNull() | ~same)  # new key or attr change

    changed_keys = changed.select(*keys).distinct()
    closing = (
        cur.join(F.broadcast(changed.select(*keys, "__eff")), on=keys, how="inner")
        .select(
            *keys,
            *attrs,
            "valid_from",
            F.col("__eff").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    untouched = cur.join(changed_keys, on=keys, how="left_anti").select(*out_cols)
    fresh = changed.select(
        *keys,
        *attrs,
        F.col("__eff").alias("valid_from"),
        F.lit(None).cast(cur.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return hist.unionByName(untouched).unionByName(closing).unionByName(fresh)


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
