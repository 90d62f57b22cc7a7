"""Engine-level integrity constraints (SURVEY §1.4).

The reference delegates integrity to MySQL DDL — PRIMARY KEY on
shop_id/product_id/rating_id (sql/dwh.sql:2,18,32) and FOREIGN KEYs to
shop_info (sql/dwh.sql:28,44) — and pre-enforces the product FK in
application code (dags/etl.py:247-251).  Parquet/Delta storage enforces
nothing, so the engine supplies the checks: as DataFrames (audit
reports), as counts (monitoring), and as write-audit-publish gates that
REJECT a commit carrying violations (the Delta CHECK-constraint /
expectations pattern).

Scale shape: a PK check is one partial-aggregated groupBy on the key;
an FK check is one left-anti join of distinct child keys against the
parent key set — bare keys only, no payload columns in either exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pk_violations(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key tuples held by MORE than one row: (keys..., n_rows).

    NULL keys (a SQL PRIMARY KEY forbids them outright) are reported
    under their null tuple whenever duplicated; pair with an
    ``isNotNull`` filter check if single null keys must also fail.
    """
    keys = list(keys)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    on: Sequence[str],
    parent_on: Sequence[str] | None = None,
) -> DataFrame:
    """Child rows whose (non-null) FK tuple has no matching parent row.

    SQL FK semantics: a NULL in any FK column exempts the row (MATCH
    SIMPLE), so fully/partially-null tuples never count as violations.
    Plan: distinct child keys anti-join the parent key set — both sides
    bare keys — then a semi join back marks the violating child rows.
    """
    on = list(on)
    parent_on = list(parent_on) if parent_on is not None else on
    non_null = child
    for c in on:
        non_null = non_null.filter(F.col(c).isNotNull())
    parent_keys = parent.select(
        *[F.col(pc).alias(c) for c, pc in zip(on, parent_on)]
    ).distinct()
    orphan_keys = non_null.select(*on).distinct().join(
        parent_keys, on=on, how="left_anti"
    )
    return non_null.join(orphan_keys, on=on, how="left_semi")


def require_constraints(
    pk: "Sequence[str] | None" = None,
    fks: "Sequence[tuple[DataFrame, Sequence[str]]] | None" = None,
):
    """Write-audit-publish gate: a callable for ``upsert_parquet(audit=…)``
    that raises ``ValueError`` when the candidate table violates the
    declared PRIMARY KEY or any FOREIGN KEY (child side = the candidate,
    parent side = the given DataFrame), aborting the commit BEFORE the
    pointer swap — readers never see the bad version.
    """

    def audit(candidate: DataFrame) -> None:
        if pk:
            n = pk_violations(candidate, pk).count()
            if n:
                raise ValueError(f"PRIMARY KEY ({', '.join(pk)}) violated by {n} key group(s)")
        for parent, on in fks or []:
            n = fk_violations(candidate, parent, on).count()
            if n:
                raise ValueError(f"FOREIGN KEY ({', '.join(on)}) violated by {n} row(s)")

    return audit
