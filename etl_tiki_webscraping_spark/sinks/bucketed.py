"""Bucketed managed tables — co-located, shuffle-free joins.

The 100 TB join strategy the prompt-level operators can't express
alone: pre-shuffle both sides of a recurring join ONCE at write time
(``bucketBy`` on the join key), so every subsequent join between the
tables is exchange-free — each task zips bucket i with bucket i.
``sortBy`` on the same key also removes the per-task sort from
sort-merge joins.

The reference has no analog (MySQL heap tables, one-process pandas);
this is the Spark-native answer to its staging-table layout for any
fact-to-fact join that repeats across runs (e.g. ratings ⋈ shops daily).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sorted) managed parquet table.

    ``buckets`` should be sized so one bucket of the LARGER table fits
    an executor's memory at target scale; both sides of a recurring
    join must use the same bucket count and key order for the
    exchange-free plan to apply.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
