"""Driver-contract invariants: entry() smoke, queries()/oracle_sql()
key consistency, and catalog column-name discipline (the driver hashes
values under sorted column names — Spark and oracle names must match)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as contract


def test_queries_and_oracles_consistent():
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert len(qs) >= 40
    # every oracle key must have a query; not every query needs an oracle
    assert set(oracles) <= set(qs)
    # the reference-core operators must all be oracle-checked
    for name in (
        "flagship",
        "fk_semi_join",
        "dedup_keys",
        "dedup_deterministic",
        "key_space_union",
        "groupby_agg_metrics",
        "upsert_merge",
        "date_dayfirst_roundtrip",
        "union_all_slices",
    ):
        assert name in oracles, f"{name} missing an oracle"


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["nation", "n_orders", "total_revenue", "avg_order_value"]
