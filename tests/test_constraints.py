"""Engine-level PK/FK integrity checks (SURVEY §1.4) and their
write-audit-publish integration — the MySQL-DDL constraints
(/root/reference/sql/dwh.sql:2,28,44) as engine logic."""

from __future__ import annotations

import pytest

from etl_tiki_webscraping_spark.quality.constraints import (
    fk_violations,
    pk_violations,
    require_constraints,
)


def test_pk_violations_reports_duplicated_key_groups(spark):
    df = spark.createDataFrame(
        [("s1", "a"), ("s1", "b"), ("s2", "c"), (None, "d"), (None, "e")],
        "shop_id string, name string",
    )
    got = {r["shop_id"]: r["n_rows"] for r in pk_violations(df, ["shop_id"]).collect()}
    assert got == {"s1": 2, None: 2}  # duplicated NULL key reported too


def test_fk_violations_nulls_exempt_and_orphans_flagged(spark):
    parent = spark.createDataFrame([("s1",), ("s2",)], "shop_id string")
    child = spark.createDataFrame(
        [("p1", "s1"), ("p2", "s9"), ("p3", None)],
        "product_id string, shop_id string",
    )
    bad = [r["product_id"] for r in fk_violations(child, parent, ["shop_id"]).collect()]
    assert bad == ["p2"]  # NULL FK passes (SQL MATCH SIMPLE), s9 orphans


def test_fk_violations_renamed_parent_key(spark):
    parent = spark.createDataFrame([(1,), (2,)], "c_custkey bigint")
    child = spark.createDataFrame([(10, 1), (11, 7)], "o_orderkey bigint, o_custkey bigint")
    bad = [
        r["o_orderkey"]
        for r in fk_violations(child, parent, ["o_custkey"], ["c_custkey"]).collect()
    ]
    assert bad == [11]


def test_require_constraints_gates_the_commit(spark, tmp_parquet_dir):
    """A batch with an FK orphan must abort BEFORE the pointer swap;
    readers keep the previous version.  A clean batch publishes."""
    from etl_tiki_webscraping_spark.sinks.upsert import read_parquet_table, upsert_parquet

    shops = spark.createDataFrame([("s1",), ("s2",)], "shop_id string")
    audit = require_constraints(pk=["product_id"], fks=[(shops, ["shop_id"])])

    ok = spark.createDataFrame([("p1", "s1")], "product_id string, shop_id string")
    upsert_parquet(spark, ok, tmp_parquet_dir, ["product_id"], audit=audit)

    orphan = spark.createDataFrame([("p2", "s9")], "product_id string, shop_id string")
    with pytest.raises(ValueError, match="FOREIGN KEY"):
        upsert_parquet(spark, orphan, tmp_parquet_dir, ["product_id"], audit=audit)

    rows = {r["product_id"] for r in read_parquet_table(spark, tmp_parquet_dir).collect()}
    assert rows == {"p1"}  # the rejected batch never became visible
