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


def test_bench_final_line_fits_driver_tail_window():
    """The driver keeps only the last 2000 chars of bench stdout; the
    final JSON line must fit entirely inside that window even with an
    absurd number of long-named queries (r03/r05 regression)."""
    import bench

    p = {f"very_long_benchmark_query_name_{i:03d}": 123.456 for i in range(200)}
    line = bench._final_line(p, p, {k: {"prior": 1, "now": 2} for k in p}, "0.1")
    assert len(line) < 1500
    import json

    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["n_queries"] == 200
    assert len(parsed["queries"]) == 5


def test_docs_query_count_matches_catalog():
    """README's catalog count must track the registry (ADVICE r6: the
    docs said 96 while the registry held 101)."""
    import os
    import re

    from etl_tiki_webscraping_spark.plans.catalog import QUERIES

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "README.md")) as fh:
        readme = fh.read()
    m = re.search(r"the (\d+)-query catalog", readme)
    assert m, "README no longer names the catalog size"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} queries, registry has {len(QUERIES)}"
    )


def test_every_query_driver_covered_or_in_next_window():
    """VERDICT r7 ask #3: the driver records only the FIRST 50
    queries() entries per round, and the rotation is now COMPUTED from
    the committed CORRECTNESS_r*.json files — so a late-round query
    can never silently miss its window again.  Invariant: every
    catalog query either has a passing driver row already, or sits in
    the next window's first 50 slots."""
    from etl_tiki_webscraping_spark.plans.catalog import (
        QUERIES,
        _driver_covered,
        _export_order,
    )

    covered = _driver_covered()
    window = set(_export_order()[:50])
    stranded = [
        n for n in QUERIES if n not in covered and n not in window
    ]
    assert not stranded, (
        f"{len(stranded)} queries have no driver evidence AND miss the "
        f"next 50-slot window: {stranded}"
    )
    # uncovered queries must LEAD the window (slots are scarce)
    order = _export_order()
    n_uncov = sum(1 for n in QUERIES if n not in covered)
    assert all(n not in covered for n in order[:n_uncov])


def test_settled_queries_rotate_stalest_first():
    """VERDICT r8 ask #1: after the never-covered and changed-path
    sets, the window fills with the queries whose most recent passing
    driver row is OLDEST — computed from the committed CORRECTNESS
    files, not a hand-maintained list."""
    from etl_tiki_webscraping_spark.plans.catalog import (
        QUERIES,
        _DRIVER_FRESH,
        _driver_latest_round,
        _export_order,
    )

    latest = _driver_latest_round()
    order = _export_order()
    settled = [n for n in order if n in latest and n not in _DRIVER_FRESH]
    rounds = [latest[n] for n in settled]
    assert rounds == sorted(rounds), (
        "settled queries are not ordered stalest-first"
    )


def test_driver_evidence_age_is_bounded_under_rotation():
    """Simulate the rotation forward: each round the driver records
    the first 50 exported names as passing at that round.  With the
    stalest-first fill, EVERY query must be re-verified within
    ceil(catalog/50)+1 rounds of any starting state — the hand-
    maintained-list failure mode (unbounded staleness) is dead."""
    import math

    from etl_tiki_webscraping_spark.plans.catalog import (
        QUERIES,
        _driver_latest_round,
    )

    latest = dict(_driver_latest_round())
    for n in QUERIES:
        latest.setdefault(n, 0)  # never covered sorts oldest
    reg_order = {n: i for i, n in enumerate(QUERIES)}
    cycle = math.ceil(len(QUERIES) / 50)
    start = max(latest.values())
    for rnd in range(start + 1, start + 1 + 2 * cycle):
        window = sorted(latest, key=lambda n: (latest[n], reg_order[n]))[:50]
        for n in window:
            latest[n] = rnd
    # after the warm-up cycle, no query's evidence is older than
    # cycle+1 rounds behind the current round
    final = start + 2 * cycle
    worst = final - min(latest.values())
    assert worst <= cycle + 1, (
        f"rotation lets evidence age {worst} rounds (> {cycle + 1})"
    )


def test_gates_report_covers_every_rows_only_query():
    """VERDICT r8 ask #7: every catalog query WITHOUT a DuckDB oracle
    must carry a quantitative accuracy gate in tools/gates_report.py.
    The report declares its gated set as a module constant so this
    check is static (no Spark run): adding a rows-only query without
    also adding its gate fails here immediately."""
    import importlib.util
    import os

    from etl_tiki_webscraping_spark.plans.catalog import QUERIES

    spec = importlib.util.spec_from_file_location(
        "gates_report",
        os.path.join(os.path.dirname(__file__), "..", "tools", "gates_report.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    no_oracle = {n for n, q in QUERIES.items() if q.oracle is None}
    assert no_oracle == set(mod.GATED_QUERIES), (
        f"ungated rows-only queries: {sorted(no_oracle - mod.GATED_QUERIES)}; "
        f"stale gate entries: {sorted(set(mod.GATED_QUERIES) - no_oracle)}"
    )
